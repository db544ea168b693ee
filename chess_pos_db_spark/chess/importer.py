"""Import pipeline: PGN files → games dimension + entries fact →
sorted/compacted agg_entries (the reference's `create`/`append`
commands, SURVEY.md §3.2).

Reference flow †: LazyPgnFileReader streams games; each game is
validated (unknown result → skipped & counted), assigned a level from
its input list, header-appended for a game_id, then replayed move by
move emitting one entry per position; entries are buffer-sorted,
pre-aggregated and spilled as sorted runs (AsyncStorePipeline +
External.h), finally merged.

Spark mapping: the per-game replay is an Arrow-batched mapInPandas
UDTF (one game row → N position rows); pre-aggregation is the
automatic map-side partial agg under groupBy; the sorted-run write and
aggregate-combining merge are plans/layout.py. Game ids are
deterministic (file_ordinal << 32 | game_ordinal-in-file), never
monotonically_increasing_id, so re-imports produce identical ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import layout
from . import pgn
from .board import (
    NO_REVERSE_MOVE,
    Position,
    START_FEN,
    captured_piece,
    pack_move,
)

GAME_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("result", T.StringType(), True),  # W/B/D, None=skipped
        T.StructField("event", T.StringType(), True),
        T.StructField("site", T.StringType(), True),
        T.StructField("date_raw", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
        T.StructField("round", T.StringType(), True),
        T.StructField("white", T.StringType(), True),
        T.StructField("black", T.StringType(), True),
        T.StructField("white_elo", T.IntegerType(), True),
        T.StructField("black_elo", T.IntegerType(), True),
        T.StructField("eco", T.StringType(), True),
        T.StructField("ply_count", T.IntegerType(), True),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("sans", T.ArrayType(T.StringType()), True),
    ]
)

ENTRY_FIELDS = [
    T.StructField("pos_key", T.LongType(), False),
    T.StructField("reverse_move", T.IntegerType(), False),
    T.StructField("level", T.StringType(), False),
    T.StructField("result", T.StringType(), False),
    T.StructField("game_id", T.LongType(), False),
    T.StructField("ply", T.IntegerType(), False),
    T.StructField("elo_diff", T.IntegerType(), True),
]
ENTRY_SCHEMA = T.StructType(ENTRY_FIELDS)
ENTRY_SCHEMA_WITH_POS = T.StructType(
    ENTRY_FIELDS + [T.StructField("pos_cmp", T.BinaryType(), True)]
)

AGG_KEY = ["pos_key", "reverse_move", "level", "result"]


def norm_binaryfile_path(p: str) -> str:
    """binaryFile URI / local path → canonical absolute path.

    ONE normalization shared by every binaryFile consumer (this module
    and chess/bcgn.read_sbgn): game_id parity depends on both sides
    decoding percent-encoded file: URIs and relative inputs
    identically — a divergent copy would mis-assign file ordinals."""
    import os
    from urllib.parse import unquote, urlparse

    return os.path.abspath(unquote(urlparse(p).path) or p)


def read_pgn_files(
    spark: SparkSession, files: list[tuple[str, str]]
) -> DataFrame:
    """(path, level) list → raw file DataFrame, read EXECUTOR-side via
    the binaryFile source (one file per task, matching the reference's
    one-parser-thread-per-file). Only the tiny path→(ordinal, level)
    map travels from the driver; file contents never do. At scale, a
    chunked DataSource splitting big PGNs on game boundaries would
    replace the per-file granularity."""
    import os
    from urllib.parse import unquote, urlparse

    from ..tables import _ship_package

    _ship_package(spark)  # parse UDFs unpickle package modules on workers

    meta = {
        os.path.abspath(path): (idx, path, level)
        for idx, (path, level) in enumerate(files)
    }
    if len(meta) != len(files):
        # Duplicate paths would silently collapse to one (idx, level)
        # entry — and duplicate game_ids downstream. Fail loud instead.
        dupes = sorted(
            p for p in {os.path.abspath(p) for p, _ in files}
            if sum(1 for q, _ in files if os.path.abspath(q) == p) > 1
        )
        raise ValueError(f"duplicate input paths in import list: {dupes}")

    schema = T.StructType(
        [
            T.StructField("file_idx", T.IntegerType(), False),
            T.StructField("source_file", T.StringType(), False),
            T.StructField("level", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            idxs, srcs, lvls, texts = [], [], [], []
            for uri, content in zip(pdf["path"], pdf["content"]):
                key = norm_binaryfile_path(uri)
                if key not in meta:
                    raise ValueError(
                        f"binaryFile row {uri!r} (decoded {key!r}) does not "
                        f"match any input path — URI/abspath round-trip "
                        f"mismatch; input paths: {sorted(meta)[:5]}..."
                    )
                idx, src, lvl = meta[key]
                idxs.append(idx)
                srcs.append(src)
                lvls.append(lvl)
                texts.append(bytes(content).decode("utf-8", "replace"))
            yield pd.DataFrame(
                {
                    "file_idx": idxs,
                    "source_file": srcs,
                    "level": lvls,
                    "text": texts,
                }
            )

    raw = (
        spark.read.format("binaryFile")
        .load([os.path.abspath(p) for p, _ in files])
        .select("path", "content")
    )
    return raw.mapInPandas(decode, schema)


DEFAULT_CHUNK_BYTES = 16 << 20
MIN_CHUNK_BYTES = 64 << 10  # below this, the 8 KB boundary lookback and
# per-task overhead dominate the parse itself

_SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("file_idx", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("base", T.LongType(), False),  # first game ordinal
    ]
)


def stat_pgn_sizes(files: list[tuple[str, str]]) -> list[int]:
    """File sizes for the import list, stat'd CONCURRENTLY.

    Listing is driver-side, single-process work (guide §5): a serial
    getsize loop is one blocking round-trip per file — fine to ~10^5
    files, a multi-minute stall at 100 TB file counts. A thread pool
    overlaps the I/O waits (stat releases the GIL), bounding wall time
    at ~n_files/32 round-trips; each file is stat'd exactly ONCE per
    import (pinned in test_chunked_pgn) — callers pass the result into
    plan_pgn_splits instead of re-statting."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    paths = [os.path.abspath(p) for p, _ in files]
    if len(paths) <= 2:
        return [os.path.getsize(p) for p in paths]
    with ThreadPoolExecutor(max_workers=min(32, len(paths))) as ex:
        return list(ex.map(os.path.getsize, paths))


def plan_pgn_splits(
    files: list[tuple[str, str]],
    chunk_bytes: int,
    file_idx_base: int = 0,
    sizes: list[int] | None = None,
) -> list[tuple]:
    """Driver-side split planning (the Hadoop FileInputFormat analogue):
    byte-range chunks per file, metadata only — no file contents touch
    the driver. `base` (the chunk's first game ordinal) is filled by the
    count pass. Pass `sizes` (from stat_pgn_sizes) to avoid a second
    stat round over the import list."""
    import os

    if sizes is None:
        sizes = stat_pgn_sizes(files)
    seen = set()
    rows = []
    for (idx, (path, level)), size in zip(
        enumerate(files, start=file_idx_base), sizes
    ):
        ap = os.path.abspath(path)
        if ap in seen:
            raise ValueError(f"duplicate input path in import list: {path}")
        seen.add(ap)
        n_chunks = max(1, -(-size // chunk_bytes))
        for ci in range(n_chunks):
            rows.append(
                (
                    idx,
                    ap,
                    path,
                    level,
                    ci,
                    ci * chunk_bytes,
                    min((ci + 1) * chunk_bytes, size),
                    0,
                )
            )
    return rows


def _splits_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    # One split per task: each split is a large independent unit of work
    # (16 MB of parse by default), so 1:1 task granularity is right.
    return spark.createDataFrame(rows, _SPLIT_SCHEMA).repartition(len(rows))


def parse_games_chunked(
    spark: SparkSession,
    files: list[tuple[str, str]],
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    file_idx_base: int = 0,
) -> DataFrame:
    """Chunk-splitting PGN source: ONE large file imports in parallel.

    The reference's LazyPgnFileReader † streams a file on one thread;
    the Spark-native source instead byte-range-splits every file on
    game boundaries (pgn.GameStartScanner — the exact split_games state
    rule, so results are byte-identical to the sequential parse) and
    runs two distributed passes:

      1. COUNT: per chunk, how many kept games start inside it (cheap:
         boundary scan + tag-regex keep check, no move parsing). The
         per-chunk counts — one long per 16 MB, pure metadata — come
         back to the driver, which prefix-sums them into each chunk's
         first game ordinal. This is the zipWithIndex pattern; it is
         what makes game_id = (file_idx << 32) | ordinal IDENTICAL to
         the sequential reader's, so chunking is invisible in output.
      2. PARSE: per chunk, slice games and parse, assigning ordinals
         from the chunk's base.

    The count pass re-reads raw bytes (not re-parses); at 100 TB both
    passes are embarrassingly parallel with no shuffle at all.

    `chunk_bytes` is an UPPER bound: when the corpus is smaller than
    (2 × parallelism) chunks of that size, chunks shrink (down to
    MIN_CHUNK_BYTES) so a single modest file still fans out across the
    cluster — the same adaptive split sizing Spark's own file sources
    do via maxPartitionBytes.
    """
    from ..tables import _ship_package

    _ship_package(spark)  # chunk scan/parse UDFs unpickle pgn on workers
    # ONE concurrent stat round over the import list, shared by the
    # adaptive-chunk sizing and the split planning (previously two
    # serial getsize loops — a driver-side listing stall at large file
    # counts, guide §5).
    sizes = stat_pgn_sizes(files)
    total = sum(sizes)
    target_chunks = max(1, 2 * spark.sparkContext.defaultParallelism)
    eff_chunk = min(
        chunk_bytes, max(MIN_CHUNK_BYTES, -(-total // target_chunks))
    )
    rows = plan_pgn_splits(files, eff_chunk, file_idx_base, sizes=sizes)

    def count_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                slices = pgn.chunk_game_slices(
                    r["path"], int(r["start"]), int(r["end"])
                )
                n = sum(1 for _, text in slices if pgn.game_is_kept(text))
                out.append(
                    {
                        "file_idx": int(r["file_idx"]),
                        "chunk_idx": int(r["chunk_idx"]),
                        "n_games": n,
                    }
                )
            yield pd.DataFrame(
                out, columns=["file_idx", "chunk_idx", "n_games"]
            )

    counts = {
        (r["file_idx"], r["chunk_idx"]): r["n_games"]
        for r in _splits_df(spark, rows)
        .mapInPandas(
            count_batches, "file_idx int, chunk_idx int, n_games long"
        )
        .collect()
    }
    bases: dict[tuple[int, int], int] = {}
    acc_file = -1
    acc = 0
    for fi, ci in sorted(counts):
        if fi != acc_file:
            acc_file, acc = fi, 0
        bases[(fi, ci)] = acc
        acc += counts[(fi, ci)]

    rows2 = [r[:7] + (bases[(r[0], r[4])],) for r in rows]

    def parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:

            def rows():
                for path, start, end, base, file_idx, level, source_file in zip(
                    pdf["path"].tolist(),
                    pdf["start"].tolist(),
                    pdf["end"].tolist(),
                    pdf["base"].tolist(),
                    pdf["file_idx"].tolist(),
                    pdf["level"].tolist(),
                    pdf["source_file"].tolist(),
                ):
                    ordinal = int(base)
                    for _, text in pgn.chunk_game_slices(
                        path, int(start), int(end)
                    ):
                        g = pgn.parse_game(text)
                        if not (g["sans"] or g["tags"]):
                            continue  # parse_file's keep filter
                        yield (
                            (int(file_idx) << 32) | ordinal,
                            level,
                            g,
                            source_file,
                        )
                        ordinal += 1

            yield _games_pdf(rows())

    return _splits_df(spark, rows2).mapInPandas(
        parse_batches, schema=GAME_SCHEMA
    )


def _object_if_empty(v: list):
    """EMPTY list → object-dtype Series: pandas defaults empty columns
    to float64, which Arrow can't cast to list/binary/nullable-int
    schema fields. Non-empty lists keep inferred dtypes (faster Arrow
    conversion)."""
    return pd.Series(v, dtype=object) if not v else v


def _int_or_none(v):
    try:
        return int(v) if v not in (None, "", "?") else None
    except ValueError:
        return None



def _games_pdf(rows) -> pd.DataFrame:
    """(game_id, level, parsed-game, source_file) tuples → one columnar
    pandas batch in GAME_SCHEMA order (the records-of-dicts shape was a
    measured per-game bottleneck at corpus scale, like the explode
    stage's)."""
    cols: dict = {f.name: [] for f in GAME_SCHEMA.fields}
    ap = {k: v.append for k, v in cols.items()}
    for game_id, level, g, source_file in rows:
        tags = g["tags"]
        ap["game_id"](game_id)
        ap["level"](level)
        ap["result"](g["result"])
        ap["event"](tags.get("Event"))
        ap["site"](tags.get("Site"))
        ap["date_raw"](tags.get("Date"))
        ap["year"](g["year"])
        ap["month"](g["month"])
        ap["day"](g["day"])
        ap["round"](tags.get("Round"))
        ap["white"](tags.get("White"))
        ap["black"](tags.get("Black"))
        ap["white_elo"](_int_or_none(tags.get("WhiteElo")))
        ap["black_elo"](_int_or_none(tags.get("BlackElo")))
        ap["eco"](tags.get("ECO"))
        ap["ply_count"](len(g["sans"]))
        ap["source_file"](source_file)
        ap["sans"](g["sans"])
    return pd.DataFrame({k: _object_if_empty(v) for k, v in cols.items()})


def parse_games(files_df: DataFrame) -> DataFrame:
    """Raw file rows → one row per game (tags + SAN list), including
    unknown-result games (result NULL) so skip counts are queryable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:

            def rows():
                for file_idx, level, source_file, text in zip(
                    pdf["file_idx"].tolist(),
                    pdf["level"].tolist(),
                    pdf["source_file"].tolist(),
                    pdf["text"].tolist(),
                ):
                    for g_idx, g in enumerate(pgn.parse_file(text)):
                        yield (
                            (int(file_idx) << 32) | g_idx,
                            level,
                            g,
                            source_file,
                        )

            yield _games_pdf(rows())

    return files_df.mapInPandas(batches, schema=GAME_SCHEMA)


def explode_positions(
    games_df: DataFrame,
    include_positions: bool = False,
    include_eran: bool = False,
) -> DataFrame:
    """Game rows → entry rows: one per position reached (including the
    start position, reverse_move = NO_REVERSE_MOVE). Games with unknown
    result or an illegal move are skipped whole — the reference's
    validation-by-parsing.

    W1 note: the reverse move IS the lag of the move sequence — each
    emitted position carries the move that produced it.

    ``include_eran`` adds the full reversible descriptor (eran.Eran
    text: move + captured + PRIOR castling/ep/halfmove) of the move
    that produced each position — what exact retraction resolution
    needs, since a packed reverse move alone cannot recover the
    parent's castling/ep rights (reference `Eran.h` †).
    """
    fields = list(ENTRY_FIELDS)
    if include_positions:
        fields.append(T.StructField("pos_cmp", T.BinaryType(), True))
    if include_eran:
        fields.append(T.StructField("eran", T.StringType(), True))
    schema = T.StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import eran as eran_mod
        from .board import san_move_cached

        # (pos_key, san) → move memo, shared across every game this
        # worker replays: the opening tree repeats across games, so the
        # hot plies skip SAN candidate generation + the legality attack
        # scan entirely (make_move still runs — counters stay exact).
        san_cache: dict = {}

        for pdf in it:
            # Columnar accumulation: one python list per output column,
            # extended game-at-a-time. The previous dict-per-position +
            # DataFrame-from-records shape was the measured end-to-end
            # bottleneck at ~50 positions/game (13M dict builds per
            # bench run dwarfed the replay kernel itself).
            pos_keys: list = []
            rmoves: list = []
            plys: list = []
            levels: list = []
            results: list = []
            gids: list = []
            elos: list = []
            pos_cmps: list = []
            erans: list = []
            for result, we, be, level, gid, sans in zip(
                pdf["result"].tolist(),
                pdf["white_elo"].tolist(),
                pdf["black_elo"].tolist(),
                pdf["level"].tolist(),
                pdf["game_id"].tolist(),
                pdf["sans"].tolist(),
            ):
                if result is None or pd.isna(result):
                    continue  # unknown result → skip (reference behavior)
                elo_diff = (
                    int(we - be)
                    if we is not None
                    and be is not None
                    and not (pd.isna(we) or pd.isna(be))
                    else None
                )
                pos = Position.from_fen(START_FEN)
                g_keys = [pos.key()]
                g_rm = [NO_REVERSE_MOVE]
                g_cmp = [pos.compress()] if include_positions else None
                g_ern = [None] if include_eran else None
                ok = True
                for san in sans:
                    # (ValueError, KeyError): illegal/ambiguous SAN
                    # raises ValueError; a malformed-but-parsed move
                    # reaching pack_move/eran can KeyError — either way
                    # the validation-by-parsing contract is SKIP the
                    # game, never kill the whole import task

                    try:
                        m, child = san_move_cached(pos, san, san_cache)
                        packed = pack_move(m, captured_piece(pos, m))
                        # eran text must be computed INSIDE the try:
                        # describe() walks the same move/piece tables as
                        # pack_move and can raise on a malformed-but-
                        # parsed move — outside the block it would kill
                        # the whole import task instead of skipping the
                        # game
                        ern = (
                            eran_mod.describe(pos, m).text()
                            if include_eran
                            else None
                        )
                    except (ValueError, KeyError):
                        ok = False  # invalid move → skip whole game
                        break
                    g_rm.append(packed)
                    if include_eran:
                        g_ern.append(ern)
                    pos = child
                    g_keys.append(pos.key())
                    if include_positions:
                        g_cmp.append(pos.compress())
                if ok:
                    n = len(g_keys)
                    pos_keys.extend(g_keys)
                    rmoves.extend(g_rm)
                    plys.extend(range(n))
                    levels.extend([level] * n)
                    results.extend([result] * n)
                    gids.extend([int(gid)] * n)
                    elos.extend([elo_diff] * n)
                    if include_positions:
                        pos_cmps.extend(g_cmp)
                    if include_eran:
                        erans.extend(g_ern)
            data = {
                "pos_key": pos_keys,
                "reverse_move": rmoves,
                "level": levels,
                "result": results,
                "game_id": gids,
                "ply": plys,
                "elo_diff": elos,
            }
            if include_positions:
                data["pos_cmp"] = pos_cmps
            if include_eran:
                data["eran"] = erans
            # column order must match the declared schema
            yield pd.DataFrame(
                {f.name: _object_if_empty(data[f.name]) for f in schema.fields}
            )

    return games_df.mapInPandas(batches, schema=schema)


def build_agg_entries(entries_df: DataFrame) -> DataFrame:
    """Entries → pre-aggregated fact (the stored table). Map-side
    partial aggregation is the reference's in-buffer combine; the
    shuffle is its spill+merge."""
    return entries_df.groupBy(*AGG_KEY).agg(
        F.count("*").alias("cnt"),
        F.sum("elo_diff").alias("elo_diff_sum"),
        F.min("game_id").alias("first_game_id"),
        F.max("game_id").alias("last_game_id"),
    )


def import_pgn(
    spark: SparkSession,
    files: list[tuple[str, str]],
    db_dir: str,
    partitions: int | None = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    retractions: bool = False,
    store_moves: bool = False,
) -> dict:
    """Full `create` command: parse → explode → aggregate → write the
    database directory (games/ + entries/ sorted runs + manifests).
    Returns import stats (the reference's progress/skip report).

    Uses the chunk-splitting source, so ONE large dump parallelizes
    across byte-range tasks (game_ids identical to a sequential read).

    ``retractions=True`` additionally writes a `retractions/` sidecar —
    (pos_key, reverse_move, eran) → counts — carrying the full
    reversible descriptor so retraction queries resolve EXACT parent
    positions (castling/ep/halfmove included; reference `Query.h`
    retractions + `Eran.h` †). One replay pass feeds both tables.

    ``store_moves=True`` keeps the SAN movetext in the stored games
    dimension, enabling lossless PGN export (``export_pgn``) — full
    database migration, a capability the reference's header-only store
    never had. Default False matches the reference's posture (headers
    only; movetext exists only as exploded positions)."""
    games = parse_games_chunked(spark, files, chunk_bytes).cache()
    # Replay parallelism must not be bound by file count (one giant PGN
    # would otherwise replay on one core): spread games across cores
    # before the python-side replay, the import's hot path.
    replay_parallelism = spark.sparkContext.defaultParallelism
    entries = explode_positions(
        games.repartition(replay_parallelism), include_eran=retractions
    )
    if retractions:
        # Pre-aggregate WITH eran (finest grain), then roll up — the
        # python replay runs once; both tables derive from `pre`.
        pre = (
            entries.groupBy(*AGG_KEY, "eran")
            .agg(
                F.count("*").alias("cnt"),
                F.sum("elo_diff").alias("elo_diff_sum"),
                F.min("game_id").alias("first_game_id"),
                F.max("game_id").alias("last_game_id"),
            )
            .persist()
        )
        agg = pre.groupBy(*AGG_KEY).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("elo_diff_sum").alias("elo_diff_sum"),
            F.min("first_game_id").alias("first_game_id"),
            F.max("last_game_id").alias("last_game_id"),
        )
        retr = (
            pre.filter(F.col("eran").isNotNull())
            .groupBy("pos_key", "reverse_move", "eran")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.min("first_game_id").alias("first_game_id"),
            )
        )
        layout.write_sorted_run(
            retr,
            f"{db_dir}/retractions",
            key=["pos_key"],
            partitions=partitions,
        )
    else:
        # Persist the aggregate: repartitionByRange samples its input to
        # compute range bounds, which would otherwise run the (expensive)
        # python replay twice.
        pre = None
        agg = build_agg_entries(entries).persist()

    stored_games = games if store_moves else games.drop("sans")
    layout.write_sorted_run(
        stored_games, f"{db_dir}/games", key=["game_id"], partitions=partitions
    )
    layout.write_sorted_run(
        agg, f"{db_dir}/entries", key=["pos_key"], partitions=partitions
    )
    (pre if retractions else agg).unpersist()

    # one pass over the cached games for both report counts (was two
    # cache scans: .count() + .filter(...).count())
    gstats = games.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("result").isNull().cast("long")).alias("skipped"),
    ).first()
    n_games = gstats["n"]
    n_skipped = int(gstats["skipped"] or 0)
    stored_entries = spark.read.parquet(f"{db_dir}/entries")
    n_positions = stored_entries.agg(F.sum("cnt").alias("s")).first()["s"]
    # Games dropped for invalid/illegal moves must be VISIBLE in the
    # import report, not silently absent: every replayed game
    # contributes exactly one (start-position, NO_REVERSE_MOVE) entry
    # (a packed real move is never NO_REVERSE_MOVE, so a mid-game
    # transposition back to the start cannot inflate this), so the
    # imported-game count is that row group's cnt — no second replay
    # pass, just a pruned probe of the table already written.
    start_key = Position.from_fen(START_FEN).key()
    n_imported = (
        stored_entries.filter(
            (F.col("pos_key") == start_key)
            & (F.col("reverse_move") == NO_REVERSE_MOVE)
        )
        .agg(F.sum("cnt").alias("s"))
        .first()["s"]
    )
    games.unpersist()
    return {
        "games": n_games,
        "skipped": n_skipped,
        "dropped_invalid": int(
            (n_games - n_skipped) - int(n_imported or 0)
        ),
        "positions": int(n_positions or 0),
        "db_dir": db_dir,
    }


def _swap_dir(live: str, tmp: str) -> None:
    """Replace directory `live` with `tmp` rename-first: the live data
    is moved aside BEFORE the new table takes its name and is deleted
    only after the swap completes. A crash mid-swap therefore never
    destroys the only remaining copy — either the old dir still exists
    (under its own name or the .old staging name) or the new one is
    already in place; a rmtree-then-rename order had a window where the
    live table was gone and the replacement not yet named. Stale .old
    staging from a prior crash is cleared first so the rename cannot
    fail on a leftover."""
    import os
    import shutil

    old = live + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def _require_local(db_dir: str, op: str) -> None:
    """append/merge maintain sidecars and staging dirs with local-FS
    calls (os.path.isdir / shutil): on a remote URI those silently
    report "no sidecar" and never clean staging — which would silently
    undercount exact retraction queries. Until the maintenance path
    speaks the Hadoop FS API, reject remote URIs LOUDLY."""
    if "://" in db_dir:
        raise ValueError(
            f"{op}: db_dir {db_dir!r} is a remote URI — the append/"
            f"merge maintenance path requires a local filesystem path "
            f"(sidecar detection and staging cleanup are local-FS "
            f"operations); run maintenance against a local copy"
        )


def append_pgn(
    spark: SparkSession,
    files: list[tuple[str, str]],
    db_dir: str,
    partitions: int | None = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> dict:
    """`append` command: new files become new runs; a compaction merge
    (layout.compact_runs) re-establishes the single sorted table. The
    run staging dir is transient — leaving it around would double-count
    on the next append.

    Appended files continue the database's file-ordinal sequence (next
    free file_idx from the existing games table), so game_ids never
    collide with earlier imports — the reference's continuing game-id
    allocation on append.

    A retractions sidecar, when present, is appended to the same way —
    leaving it stale would silently undercount exact retraction queries
    for positions reached by appended games.

    Crash contract (round-12 audit note): games, entries and the
    retractions sidecar commit INDEPENDENTLY, in that order — there is
    no cross-table transaction (the same posture as llm/retraction.py
    and the maintenance scheduler). A crash after the games append but
    before the entries swap leaves the new games visible in the
    dimension while the aggregate lags; unlike those orchestrators the
    REPLAY here is NOT idempotent (games use mode=append), so recovery
    is: restore/trim the games table to the pre-append state (its
    pre-append max file ordinal is recorded in the return dict as
    `file_idx_base`) and rerun, or re-derive entries from games with a
    fresh import. The versioned store (plans/layout) is the engine's
    transactional path; this directory layout mirrors the reference's
    non-transactional create/append files †."""
    import os
    import shutil

    _require_local(db_dir, "append_pgn")
    runs_dir = f"{db_dir}/_append_runs_tmp"
    retr_dir = f"{db_dir}/retractions"
    retr_runs_dir = f"{db_dir}/_append_retr_tmp"
    has_retr = os.path.isdir(retr_dir)
    prev_max = (
        spark.read.parquet(f"{db_dir}/games")
        .agg(F.max(F.shiftright("game_id", 32)))
        .first()[0]
    )
    next_file_idx = int(prev_max) + 1 if prev_max is not None else 0
    # cache: games feeds BOTH the stored-games append and the entries
    # aggregate — without it the full chunked parse runs twice (same
    # reasoning as import_pgn's cache)
    games = parse_games_chunked(
        spark, files, chunk_bytes, file_idx_base=next_file_idx
    ).cache()
    # Replay parallelism must not be bound by the append's chunk count
    # (a small appended file plans few chunks): spread games across
    # cores before the python-side replay, exactly as import_pgn does —
    # round-12 audit fix; ids are already assigned at parse, so the
    # repartition cannot affect them.
    replay_games = games.repartition(spark.sparkContext.defaultParallelism)
    pre = None
    if has_retr:
        entries = explode_positions(replay_games, include_eran=True)
        pre = (
            entries.groupBy(*AGG_KEY, "eran")
            .agg(
                F.count("*").alias("cnt"),
                F.sum("elo_diff").alias("elo_diff_sum"),
                F.min("game_id").alias("first_game_id"),
                F.max("game_id").alias("last_game_id"),
            )
            .persist()
        )
        agg = pre.groupBy(*AGG_KEY).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("elo_diff_sum").alias("elo_diff_sum"),
            F.min("first_game_id").alias("first_game_id"),
            F.max("last_game_id").alias("last_game_id"),
        )
    else:
        agg = build_agg_entries(explode_positions(replay_games))
    # Match the database's fidelity mode: a store_moves database keeps
    # movetext for appended games too (otherwise export_pgn would
    # silently lose every appended game's moves); a header-only
    # database stays header-only.
    keeps_moves = "sans" in spark.read.parquet(f"{db_dir}/games").columns
    stored_games = games if keeps_moves else games.drop("sans")
    stored_games.write.mode("append").parquet(f"{db_dir}/games")
    agg.write.mode("overwrite").parquet(runs_dir)

    # compact [new-run, existing-entries] straight into a temp dir and
    # swap — the earlier flow physically COPIED the whole existing
    # entries table into the staging dir first and then rewrote
    # everything again, doubling the I/O of every append
    entries_tmp = f"{db_dir}/_entries_compact_tmp"
    layout.compact_runs(
        spark,
        [runs_dir, f"{db_dir}/entries"],
        entries_tmp,
        key=AGG_KEY,
        agg_spec={
            "cnt": "sum",
            "elo_diff_sum": "sum",
            "first_game_id": "min",
            "last_game_id": "max",
        },
        partitions=partitions,
    )
    _swap_dir(f"{db_dir}/entries", entries_tmp)
    shutil.rmtree(runs_dir, ignore_errors=True)

    if has_retr:
        new_retr = (
            pre.filter(F.col("eran").isNotNull())
            .groupBy("pos_key", "reverse_move", "eran")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.min("first_game_id").alias("first_game_id"),
            )
        )
        new_retr.write.mode("overwrite").parquet(retr_runs_dir)
        retr_tmp = f"{db_dir}/_retr_compact_tmp"
        layout.compact_runs(
            spark,
            [retr_runs_dir, retr_dir],
            retr_tmp,
            key=["pos_key", "reverse_move", "eran"],
            agg_spec={"cnt": "sum", "first_game_id": "min"},
            partitions=partitions,
        )
        _swap_dir(retr_dir, retr_tmp)
        shutil.rmtree(retr_runs_dir, ignore_errors=True)
        pre.unpersist()
    games.unpersist()
    return {"db_dir": db_dir, "file_idx_base": next_file_idx}


def merge_databases(
    spark: SparkSession,
    db_dirs: list[str],
    dest_dir: str,
    partitions: int | None = None,
) -> dict:
    """`merge` command (reference §3.3 maintenance path): consolidate N
    databases into one, combining equal entry keys and keeping every
    game exactly once.

    game_id is (file_idx << 32) | ordinal, so each source database's
    ids are shifted by the cumulative file-ordinal base of the
    databases before it — the same continuing-allocation rule append
    uses. Merging db(files A) with db(files B) therefore produces a
    database IDENTICAL (game_ids included) to importing A+B in one
    shot; first/last_game_id min/max-combine correctly because the
    shift preserves within-database order and earlier databases get
    smaller ids.

    Retraction sidecars merge the same way when EVERY source has one
    (a partial merge would silently under-count); otherwise the
    destination has none.
    """
    import os

    for d in [*db_dirs, dest_dir]:
        _require_local(d, "merge_databases")
    bases: list[int] = []
    next_base = 0
    n_games = 0
    games_parts = []
    for d in db_dirs:
        bases.append(next_base)
        g = spark.read.parquet(f"{d}/games")
        # per-source game count rides the base-computation agg that
        # already scans this dimension — the merged count is exactly
        # the sum (every game kept once, per the id-shift contract), so
        # the old post-write re-read of dest_dir/games is a second full
        # pass the report never needed
        row = g.agg(
            F.max(F.shiftright("game_id", 32)).alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        mx = row["mx"]
        n_games += int(row["n"])
        next_base += int(mx) + 1 if mx is not None else 0

    def _shift(col: str, base: int):
        return (F.col(col) + F.lit(base << 32)).alias(col)

    moves_flags = {
        d: "sans" in spark.read.parquet(f"{d}/games").columns for d in db_dirs
    }
    if len(set(moves_flags.values())) > 1:
        # Refuse loudly rather than silently null movetext for the
        # header-only sources (export would then emit moveless games).
        raise ValueError(
            "cannot merge store_moves and header-only databases: "
            f"{moves_flags}; re-import the header-only sources with "
            "store_moves=True (or export+drop the others) first"
        )
    for d, base in zip(db_dirs, bases):
        g = spark.read.parquet(f"{d}/games")
        games_parts.append(g.withColumn("game_id", _shift("game_id", base)))
    games = games_parts[0]
    for g in games_parts[1:]:
        games = games.unionByName(g)
    layout.write_sorted_run(
        games, f"{dest_dir}/games", key=["game_id"], partitions=partitions
    )

    entry_parts = []
    for d, base in zip(db_dirs, bases):
        e = spark.read.parquet(f"{d}/entries")
        entry_parts.append(
            e.withColumn("first_game_id", _shift("first_game_id", base))
            .withColumn("last_game_id", _shift("last_game_id", base))
        )
    union = entry_parts[0]
    for e in entry_parts[1:]:
        union = union.unionByName(e)
    merged = union.groupBy(*AGG_KEY).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("elo_diff_sum").alias("elo_diff_sum"),
        F.min("first_game_id").alias("first_game_id"),
        F.max("last_game_id").alias("last_game_id"),
    )
    layout.write_sorted_run(
        merged, f"{dest_dir}/entries", key=["pos_key"], partitions=partitions
    )

    if all(os.path.isdir(f"{d}/retractions") for d in db_dirs):
        retr_parts = []
        for d, base in zip(db_dirs, bases):
            r = spark.read.parquet(f"{d}/retractions")
            retr_parts.append(
                r.withColumn("first_game_id", _shift("first_game_id", base))
            )
        runion = retr_parts[0]
        for r in retr_parts[1:]:
            runion = runion.unionByName(r)
        rmerged = runion.groupBy("pos_key", "reverse_move", "eran").agg(
            F.sum("cnt").alias("cnt"),
            F.min("first_game_id").alias("first_game_id"),
        )
        layout.write_sorted_run(
            rmerged,
            f"{dest_dir}/retractions",
            key=["pos_key"],
            partitions=partitions,
        )

    return {"db_dir": dest_dir, "games": n_games, "sources": len(db_dirs)}


def export_pgn(
    spark: SparkSession, db_dir: str, dest_dir: str, shards: int = 8
) -> dict:
    """Lossless PGN export of a database imported with
    ``store_moves=True`` — the migration path OUT of the engine (the
    reference's header-only store cannot reproduce its inputs; here
    export → re-import round-trips to an identical entries store,
    pinned in tests/test_chess.py).

    Distributed shape: shard boundaries are game_id ranges
    (repartitionByRange + in-partition sort), formatting is an
    Arrow-batched mapInPandas of pure-python ``pgn.format_game`` — the
    text sink writes each shard independently, so export parallelism is
    the shard count regardless of corpus size.

    Output is PARTITIONED BY LEVEL (``dest_dir/level=<level>/part-*``):
    level is part of the entries key (the reference's human/engine/server
    partitioning), so a flat export of a multi-level database would
    silently merge classifications the importer can never recover.
    Re-import each subdirectory with its matching level for a lossless
    round trip. ``ply_count`` is derived from the movetext on re-import;
    ``source_file`` intentionally becomes the exported shard's own path
    (provenance of the new file, not a loss).
    """
    from ..tables import _ship_package

    _ship_package(spark)  # fmt closure unpickles pgn.format_game on workers
    games = spark.read.parquet(f"{db_dir}/games")
    if "sans" not in games.columns:
        raise ValueError(
            "database was imported without store_moves=True — the games "
            "dimension carries headers only; movetext is not recoverable"
        )

    tag_cols = [
        ("event", "Event"),
        ("site", "Site"),
        ("date_raw", "Date"),
        ("round", "Round"),
        ("white", "White"),
        ("black", "Black"),
        ("white_elo", "WhiteElo"),
        ("black_elo", "BlackElo"),
        ("eco", "ECO"),
    ]

    def fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for row in pdf.itertuples(index=False):
                tags = {}
                for col, tag in tag_cols:
                    v = getattr(row, col)
                    if v is not None and not (isinstance(v, float) and pd.isna(v)):
                        tags[tag] = str(int(v)) if col.endswith("_elo") else str(v)
                sans = [] if row.sans is None else list(row.sans)
                texts.append(pgn.format_game(tags, sans, row.result))
            yield pd.DataFrame(
                {
                    "game_id": pdf["game_id"],
                    "level": pdf["level"],
                    "text": texts,
                }
            )

    cols = ["game_id", "level", "result", "sans"] + [c for c, _ in tag_cols]
    shaped = (
        games.select(*cols)
        .repartitionByRange(shards, "game_id")
        .sortWithinPartitions("game_id")
        .mapInPandas(fmt, schema="game_id long, level string, text string")
    )
    # Game count observed on the export write itself (the old separate
    # games.count() was a SECOND full pass over the games dimension just
    # for the report). fmt emits one row per game, so counting the
    # mapInPandas output equals counting games — and the observe node
    # sits ABOVE the range exchange, so the boundary-sampling pass
    # (which re-runs only the exchange's child) cannot double-run it.
    obs = Observation()
    shaped.observe(obs, F.count(F.lit(1)).alias("games")).select(
        "level", "text"
    ).write.partitionBy("level").mode("overwrite").text(dest_dir)
    n = int(obs.get["games"])
    # Stats via the Hadoop FileSystem API, not os.walk: the write above
    # goes through Spark and accepts any supported URI (file:/, s3a://,
    # hdfs://), so the stats pass must resolve the same way or a remote
    # destination would raise FileNotFoundError after a successful
    # export. repartitionByRange can produce fewer non-empty shards
    # than requested on small corpora — report the files actually
    # written so the stat is load-bearing for consumers.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dest_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    files, level_set = 0, set()
    while it.hasNext():
        p = it.next().getPath()
        if p.getName().startswith("part-"):
            files += 1
            parent = p.getParent().getName()
            if parent.startswith("level="):
                level_set.add(parent.split("=", 1)[1])
    levels = sorted(level_set)
    return {
        "dest_dir": dest_dir,
        "games": n,
        "shards": shards,
        "files": files,
        "levels": levels,
    }
