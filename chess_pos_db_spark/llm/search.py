"""Full-text relevance search over the document corpus (SURVEY §2.11
N4+): BM25 ranked retrieval and exact phrase matching as pure
relational plans — the corpus-search primitives a training-data
pipeline uses for targeted subset extraction ("give me the docs about
X") and for building retrieval eval sets.

Scale shape: both queries are map-side per-document scoring against a
tiny broadcast query-term set — no inverted index is materialized, so
the plan is one corpus scan + one final TakeOrdered. At 100 TB the
same plan holds (scan-parallel scoring); a reusable inverted index
would be the `plans/layout.py` sorted-run treatment of the
(term, doc_id, tf) postings — the BM25 expression itself is unchanged.

Cross-engine discipline: tf/df/dl are exact integers; the only
transcendental is ln() in the IDF, and scores are ROUND()ed at 6 dp on
both sides before the ORDER BY (same posture as the cosine queries —
a last-ulp libm difference cannot flip the hash except exactly on a
rounding boundary, and ties are broken by doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import ORACLES, register
from ..tables import t

_QUERY_TERMS = ["window", "table", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_TOP_K = 10

_TERMS_SQL = ", ".join(f"('{q}')" for q in _QUERY_TERMS)


def _bm25_oracle(corpus_where: str = "") -> str:
    """The BM25 oracle, parameterized by an optional corpus predicate —
    the delete-lifecycle twin scores over `documents` minus the deleted
    slice with the SAME expression (deletes change the corpus, never
    the scoring)."""
    where = f"WHERE {corpus_where}" if corpus_where else ""
    return f"""
WITH d AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS s,
           len(STRING_SPLIT(text, ' ')) AS dl
    FROM documents {where}
),
corpus AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(dl) / COUNT(*) AS avgdl
    FROM d
),
q(term) AS (VALUES {_TERMS_SQL}),
tf AS (
    SELECT d.doc_id, d.dl, q.term,
           CAST(len(list_filter(d.s, x -> x = q.term)) AS BIGINT) AS tf
    FROM d, q
),
df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM tf WHERE tf > 0 GROUP BY term
),
scored AS (
    SELECT tf.doc_id,
           SUM(
             LN(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) *
             tf.tf * ({_BM25_K1} + 1) /
             (tf.tf + {_BM25_K1} *
              (1 - {_BM25_B} + {_BM25_B} * tf.dl / c.avgdl))
           ) AS score
    FROM tf JOIN df USING (term), corpus c
    WHERE tf.tf > 0
    GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT {_TOP_K}
"""


@register("search_bm25", oracle=_bm25_oracle())
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k: per-doc term frequencies via JVM array expressions
    (no explode of the token stream), corpus stats and per-term df as
    broadcast one-row/tiny aggregates (the tpch_q11 scalar-threshold
    pattern), final TakeOrderedAndProject."""
    scored = bm25_scores(spark, sf_dir)
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_TOP_K)
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for every matching doc — un-truncated BM25."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("s"),
        F.size(F.split("text", " ")).cast("long").alias("dl"),
    )
    corpus = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    terms = spark.createDataFrame(
        [(q,) for q in _QUERY_TERMS], "term string"
    )
    tf = d.join(F.broadcast(terms)).select(
        "doc_id",
        "dl",
        "term",
        F.size(
            F.filter(F.col("s"), lambda x: x == F.col("term"))
        ).cast("long").alias("tf"),
    )
    df = (
        tf.filter(F.col("tf") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.filter(F.col("tf") > 0)
        .join(F.broadcast(df), "term")
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    return scored


_PHRASE = "value table"


@register(
    "search_phrase",
    oracle=f"""
SELECT doc_id,
       CAST((len(text) - len(REPLACE(text, '{_PHRASE}', '')))
            / len('{_PHRASE}') AS BIGINT) AS n_hits
FROM documents
WHERE text LIKE '%{_PHRASE}%'
ORDER BY n_hits DESC, doc_id
LIMIT {_TOP_K}
""",
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase-occurrence count per doc (length-difference trick —
    exact integers, map-only scan + TakeOrdered; the LIKE predicate
    reaches the scan as a pushed StringContains filter)."""
    docs = t(spark, sf_dir, "documents")
    n_hits = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(_PHRASE))))
        / F.length(F.lit(_PHRASE))
    ).cast("long")
    return (
        docs.filter(F.col("text").contains(_PHRASE))
        .select("doc_id", n_hits.alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# N4-hybrid — hybrid retrieval via reciprocal-rank fusion (RRF,
# Cormack et al., SIGIR'09): fuse the LEXICAL ranking (BM25 over the
# query terms) with the SEMANTIC ranking (cosine to the query
# embedding) as sum of 1/(K + rank), taking each side's top
# _RRF_DEPTH. Docs missing from one side simply contribute nothing
# (full outer fusion) — at sf0.1 the embeddings table covers only part
# of the corpus, which is exactly the production shape (not everything
# is embedded). Both sides are already oracle-expressible, so the
# fusion is too. Scale: each side ends in TakeOrdered(depth); fusion
# joins two depth-sized tables — driver-independent, corpus scans once
# per side.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 50
# same query vector as the similarity operators this fusion composes
# with — one shared constant, so they can never drift apart
from .similarity import _QUERY_VEC_ID as _RRF_QUERY_VEC  # noqa: E402
from .pipeline import _shingle_sql as _pipeline_shingle_sql  # noqa: E402


def _rrf_oracle() -> str:
    dims = 64
    return f"""
WITH d AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS s,
           len(STRING_SPLIT(text, ' ')) AS dl
    FROM documents
),
corpus AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(dl) / COUNT(*) AS avgdl
    FROM d
),
q(term) AS (VALUES {_TERMS_SQL}),
tf AS (
    SELECT d.doc_id, d.dl, q.term,
           CAST(len(list_filter(d.s, x -> x = q.term)) AS BIGINT) AS tf
    FROM d, q
),
df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM tf WHERE tf > 0 GROUP BY term
),
lex AS (
    SELECT tf.doc_id,
           SUM(
             LN(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) *
             tf.tf * ({_BM25_K1} + 1) /
             (tf.tf + {_BM25_K1} *
              (1 - {_BM25_B} + {_BM25_B} * tf.dl / c.avgdl))
           ) AS score
    FROM tf JOIN df USING (term), corpus c
    WHERE tf.tf > 0
    GROUP BY tf.doc_id
),
lex_rank AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id)
               AS r_lex
    FROM lex
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT {_RRF_DEPTH}
),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}),
cos AS (
    SELECT e.vec_id AS doc_id,
           SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)) /
           (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
            SQRT(SUM(CAST(qv.v[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)))) AS c
    FROM embeddings e, qv, GENERATE_SERIES(1, {dims}) AS g(i)
    GROUP BY e.vec_id
),
sem_rank AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY ROUND(c, 6) DESC, doc_id) AS r_sem
    FROM cos
    ORDER BY ROUND(c, 6) DESC, doc_id
    LIMIT {_RRF_DEPTH}
),
fused AS (
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           COALESCE(1.0 / ({_RRF_K} + l.r_lex), 0) +
           COALESCE(1.0 / ({_RRF_K} + s.r_sem), 0) AS rrf,
           l.r_lex AS r_lex, s.r_sem AS r_sem
    FROM lex_rank l FULL OUTER JOIN sem_rank s USING (doc_id)
)
SELECT doc_id, ROUND(rrf, 6) AS rrf, r_lex, r_sem
FROM fused
ORDER BY ROUND(rrf, 6) DESC, doc_id
LIMIT {_TOP_K}
"""


@register("search_hybrid_rrf", oracle=_rrf_oracle())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import cosine

    # TakeOrdered(depth) FIRST (parallel per-partition top-k merge),
    # THEN rank the depth-bounded set — the global row_number window
    # only ever sees _RRF_DEPTH rows, never the full match set.
    lex_w = Window.orderBy(F.col("s6").desc(), F.col("doc_id"))
    lex = (
        bm25_scores(spark, sf_dir)
        .select("doc_id", F.round("score", 6).alias("s6"))
        .orderBy(F.col("s6").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn("r_lex", F.row_number().over(lex_w))
        .select("doc_id", "r_lex")
    )
    emb = t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("embedding").alias("v")
    )
    cos = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("v")), 6).alias("c"),
    )
    sem_w = Window.orderBy(F.col("c").desc(), F.col("doc_id"))
    sem = (
        cos.orderBy(F.col("c").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn("r_sem", F.row_number().over(sem_w))
        .select("doc_id", "r_sem")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_sem")), F.lit(0.0))
        ).alias("rrf"),
        "r_lex",
        "r_sem",
    )
    return (
        fused.select(
            "doc_id", F.round("rrf", 6).alias("rrf"), "r_lex", "r_sem"
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# N4ix — MATERIALIZED inverted index + index-backed BM25. The map-side
# scorer above re-scans the corpus per query — right for one-off subset
# extraction, wrong for a query workload. The index is the classic IR
# layout re-expressed as bucketed tables (plans/bucketing.py):
#
#   postings (token, doc_id, tf)  bucketed+sorted by token
#   doclen   (doc_id, dl)         bucketed by doc_id
#   df       (token, df)          bucketed by token
#   stats    (n_docs, avgdl)      one row
#
# A query then reads ONLY the buckets its terms hash into (Catalyst
# bucket pruning: SelectedBucketsCount q/16 in the scan — pinned in
# tests), joins the candidate postings to doclen on doc_id, and scores
# the identical BM25 expression. Build cost: one (token, doc_id)
# shuffle over the corpus — after which every query touches
# O(matching postings), not O(corpus). Equivalence with the scan-based
# scorer is pinned exactly (same top-k, same 6-dp scores).
# ---------------------------------------------------------------------------


def build_inverted_index(
    spark: SparkSession, docs: DataFrame, prefix: str, buckets: int = 16
) -> None:
    """Build the four index tables under catalog names `{prefix}_*`."""
    from ..plans.bucketing import write_bucketed

    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    # positions make the index POSITIONAL: phrase queries answer from
    # the same postings rows (phrase_indexed) with zero corpus access.
    # BM25 reads prune the column away (Catalyst column pruning), so
    # ranked retrieval pays nothing for it.
    postings = toks.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    write_bucketed(postings, f"{prefix}_postings", ["token"], buckets=buckets)
    doclen = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    write_bucketed(doclen, f"{prefix}_doclen", ["doc_id"], buckets=buckets)
    # derive df and stats from the tables just WRITTEN, not from the
    # in-memory lineage: postings/doclen are never cached, so reusing
    # the DataFrames would re-run the corpus scan + explode + shuffle
    # from scratch — doubling the most expensive stage of the build.
    # The written postings are bucketed by token, so the df rollup
    # needs no new exchange.
    dft = (
        spark.table(f"{prefix}_postings")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
    )
    write_bucketed(dft, f"{prefix}_df", ["token"], buckets=buckets)
    # corpus stats live IN the meta row (not a separate _stats table):
    # meta is the index's single commit point, and folding
    # n_docs/avgdl into it means no reader can ever observe stats
    # ahead of (or behind) the generation list — the two update
    # atomically or not at all.  sum_dl alongside avgdl keeps the
    # stats ADDITIVE (append updates them with one delta aggregate,
    # never a corpus rescan); fp_sum_ids is the corpus fingerprint
    # ensure_index uses to detect a stale index.
    st = (
        spark.table(f"{prefix}_doclen")
        .groupBy()
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            F.sum("doc_id").alias("fp"),
        )
        .first()
    )
    n_docs = int(st["n_docs"])
    sum_dl = float(st["sum_dl"] or 0)
    _write_meta(
        spark, prefix, 0, n_docs, sum_dl, int(st["fp"] or 0)
    )


def _write_meta(
    spark: SparkSession,
    prefix: str,
    n_deltas: int,
    n_docs: int,
    sum_dl: float,
    fp_sum_ids: int,
    n_tomb_gens: int = 0,
) -> None:
    """Write the index's ONE commit record: generation count, corpus
    stats AND the tombstone-generation count in the same single-row
    table, so there is no window where a reader sees stats (or a
    deletion set) from a different generation set."""
    from ..plans.bucketing import drop_orphaned_table

    drop_orphaned_table(spark, f"{prefix}_meta")
    spark.createDataFrame(
        [(
            n_deltas,
            n_docs,
            sum_dl / n_docs if n_docs else 0.0,
            sum_dl,
            fp_sum_ids,
            n_tomb_gens,
        )],
        "n_deltas int, n_docs bigint, avgdl double, sum_dl double, "
        "fp_sum_ids bigint, n_tomb_gens int",
    ).write.mode("overwrite").saveAsTable(f"{prefix}_meta")


def _read_meta(spark: SparkSession, prefix: str):
    """The index's commit record (generations + corpus stats)."""
    return spark.table(f"{prefix}_meta").first()


def _n_tomb_gens(meta) -> int:
    """Tombstone-generation count; 0 for meta rows written before the
    delete lifecycle existed (cross-session warehouse dirs)."""
    return meta.asDict().get("n_tomb_gens") or 0


def _tombstone_ids(spark: SparkSession, prefix: str, meta) -> DataFrame | None:
    """Union of every tombstone generation's doc_ids (None when no
    deletes are pending) — the deletion mask every read path applies
    until compaction makes the forgetting physical."""
    k = _n_tomb_gens(meta)
    if not k:
        return None
    out = None
    for i in range(1, k + 1):
        tg = spark.table(f"{prefix}_tomb_d{i}")
        out = tg if out is None else out.unionByName(tg)
    return out


def _generations(spark: SparkSession, prefix: str) -> list[str]:
    """Table-name suffixes of every live index generation: the base
    ('') plus one '_d{i}' per append since the last compaction."""
    n = _read_meta(spark, prefix)["n_deltas"]
    return [""] + [f"_d{i}" for i in range(1, n + 1)]


def _existing_doc_ids(spark: SparkSession, prefix: str) -> DataFrame:
    """Union of every live generation's doc_ids (doclen is the compact
    per-doc table — 16 B/doc)."""
    out = None
    for g in _generations(spark, prefix):
        dl = spark.table(f"{prefix}_doclen{g}").select("doc_id")
        out = dl if out is None else out.unionByName(dl)
    return out


def append_to_index(
    spark: SparkSession,
    new_docs: DataFrame,
    prefix: str,
    buckets: int = 16,
    check_disjoint: bool = True,
) -> int:
    """Append a batch of NEW documents to an existing postings index
    WITHOUT rebuilding it — the reference's append-a-sorted-run
    economics (`src/persistence/pos_db/` sorted runs †; the chess
    importer's U2 append) applied to the text index.

    Writes one new generation (`{prefix}_postings_d{N}` bucketed by
    token, `{prefix}_doclen_d{N}` bucketed by doc_id) from the delta
    docs only — cost is ONE (token, doc_id) shuffle over the BATCH,
    never the corpus. Corpus stats (n_docs, sum_dl → avgdl) are
    RECOMPUTED from the union of every generation's doclen (16 B/doc —
    four orders cheaper than a corpus rescan at any scale), not
    read-modify-written, and land in the SAME single-row meta write as
    the generation count: that write is the append's ONLY commit point
    — a crash anywhere before it leaves a replay that rewrites the
    identical delta tables; a replay after it is a full-duplicate
    batch the disjointness probe (or stream_index_maintenance's skip)
    catches.  Readers can never observe stats from a different
    generation set than the one they enumerate.
    df is NOT maintained as a table across generations: the
    incremental query path derives per-term df from the bucket-pruned
    postings themselves (exact, since generations are doc-disjoint).

    ``check_disjoint`` anti-probes the new doc_ids against every live
    doclen generation (bucketed side never shuffles) and fails loudly
    on a collision — an overlapping doc_id would silently double-count
    its tokens in df and scores. Returns the new generation number.
    """
    from ..plans.bucketing import write_bucketed

    gens = _generations(spark, prefix)
    n = len(gens)  # next delta number (base is generation 0)

    doclen = new_docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    # WITHIN-batch duplicate doc_ids would silently MERGE both copies'
    # token streams in the groupBy below (doubled tf, interleaved
    # positions) — corrupt scores with no error. Always checked, even
    # when the caller owns the cross-index disjointness check: this is
    # a property of the batch itself.
    dup_stats = doclen.groupBy().agg(
        F.count("*").alias("n"), F.count_distinct("doc_id").alias("nd")
    ).first()
    if int(dup_stats["n"]) != int(dup_stats["nd"]):
        raise ValueError(
            f"append_to_index: batch contains "
            f"{int(dup_stats['n']) - int(dup_stats['nd'])} duplicate "
            "doc_id row(s) — duplicate copies would silently merge into "
            "one posting with doubled tf; dedup the batch first"
        )
    if check_disjoint:
        n_dup = doclen.join(
            _existing_doc_ids(spark, prefix), "doc_id", "left_semi"
        ).count()
        if n_dup:
            raise ValueError(
                f"append_to_index: {n_dup} doc_id(s) in the batch already "
                f"exist in index {prefix!r} — appends must be doc-disjoint "
                "(an overlap double-counts df and scores); dedup or "
                "compact with replacement first"
            )

    toks = new_docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    postings = toks.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    write_bucketed(postings, f"{prefix}_postings_d{n}", ["token"], buckets=buckets)
    write_bucketed(doclen, f"{prefix}_doclen_d{n}", ["doc_id"], buckets=buckets)

    all_dl = spark.table(f"{prefix}_doclen_d{n}")
    for g in gens:
        all_dl = all_dl.unionByName(spark.table(f"{prefix}_doclen{g}"))
    meta = _read_meta(spark, prefix)
    tombs = _tombstone_ids(spark, prefix, meta)
    if tombs is not None:
        # pending deletes: stats must not resurrect tombstoned docs
        # (their doclen rows exist physically until compaction purges)
        all_dl = all_dl.join(tombs, "doc_id", "left_anti")
    tot = all_dl.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        F.sum("doc_id").alias("fp"),
    ).first()
    # generation count AND union stats land in ONE meta write — the
    # commit point; no reader window where stats reflect the new delta
    # while the generation list doesn't
    _write_meta(
        spark, prefix, n, int(tot["n"]), float(tot["s"] or 0),
        int(tot["fp"] or 0), n_tomb_gens=_n_tomb_gens(meta),
    )
    return n


def delete_from_index(
    spark: SparkSession,
    doc_ids: DataFrame,
    prefix: str,
    buckets: int = 16,
) -> int:
    """Delete documents from the postings index WITHOUT rewriting any
    postings — the tombstone half of the sorted-run lifecycle (the
    right-to-be-forgotten operation, mirroring the store's
    plans/layout.delete_rows). Writes the batch's doc_ids as a new
    TOMBSTONE GENERATION (`{prefix}_tomb_d{K}`, bucketed by doc_id);
    every read path masks tombstoned docs (postings anti-join) and
    derives df from the surviving rows, so queries answer EXACTLY as a
    fresh build over the live corpus (pinned in tests). Corpus stats
    (n_docs/avgdl) are recomputed live-only from the doclen union —
    16 B/doc, never a corpus rescan — and land in the SAME single-row
    meta write as the bumped tombstone-generation count: that write is
    the delete's ONLY commit point (a crash before it leaves an orphan
    tombstone table invisible to every reader; a replay rewrites the
    identical table).

    Physical forgetting happens at the next ``compact_index``, which
    purges tombstoned rows and resets the tombstone set — compliance
    deletes need both steps, exactly like the store's delete+vacuum.
    Until then a deleted doc_id cannot be re-appended (its physical
    rows would be masked too; the append disjointness probe fails
    loudly on it — compact first).

    Fails loudly if any id is not LIVE in the index (absent, or
    already tombstoned): a silent partial delete would mask bugs in
    the caller's id bookkeeping. Returns the new tombstone-generation
    number."""
    from ..plans.bucketing import write_bucketed

    ids = doc_ids.select("doc_id").distinct()
    meta = _read_meta(spark, prefix)
    tombs = _tombstone_ids(spark, prefix, meta)
    live = _existing_doc_ids(spark, prefix)
    if tombs is not None:
        live = live.join(tombs, "doc_id", "left_anti")
    stats = ids.join(live, "doc_id", "left_semi").groupBy().agg(
        F.count("*").alias("n"), F.sum("doc_id").alias("s")
    ).first()
    n_live_hits = int(stats["n"])
    n_ids = ids.count()
    if n_ids == 0:
        # an empty retraction feed is a legitimate no-op — writing an
        # empty tombstone generation would bump the counter (one extra
        # anti-join per query) for zero information
        return _n_tomb_gens(meta)
    if n_live_hits != n_ids:
        raise ValueError(
            f"delete_from_index: {n_ids - n_live_hits}/{n_ids} doc_id(s) "
            f"are not live in index {prefix!r} (absent or already "
            "deleted) — deletes must target live documents exactly"
        )
    k = _n_tomb_gens(meta) + 1
    write_bucketed(ids, f"{prefix}_tomb_d{k}", ["doc_id"], buckets=buckets)
    # live-only stats: doclen union minus (old ∪ new) tombstones
    all_dl = None
    for g in _generations(spark, prefix):
        dg = spark.table(f"{prefix}_doclen{g}")
        all_dl = dg if all_dl is None else all_dl.unionByName(dg)
    mask = spark.table(f"{prefix}_tomb_d{k}")
    if tombs is not None:
        mask = mask.unionByName(tombs)
    tot = all_dl.join(mask, "doc_id", "left_anti").groupBy().agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        F.sum("doc_id").alias("fp"),
    ).first()
    _write_meta(
        spark, prefix, meta["n_deltas"], int(tot["n"]),
        float(tot["s"] or 0), int(tot["fp"] or 0), n_tomb_gens=k,
    )
    return k


def search_indexed_incremental(
    spark: SparkSession,
    prefix: str,
    terms: list[str],
    k: int = _TOP_K,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """BM25 top-k over a MULTI-GENERATION index (base + appended
    deltas) — identical answer to a full rebuild (pinned in tests).
    Every generation's postings scan is bucket-pruned by the query
    terms; per-term df is the count of the pruned postings rows
    (exact across doc-disjoint generations, and cheaper at scale than
    maintaining df deltas: the rows are already in hand). Tombstoned
    docs are masked with one anti-join on the pruned postings BEFORE
    df derivation, so deletes are exact here too — the mask is
    term-candidate-sized, never corpus-sized."""
    gens = _generations(spark, prefix)
    p = None
    doclen = None
    for g in gens:
        pg = spark.table(f"{prefix}_postings{g}").filter(
            F.col("token").isin(terms)
        )
        p = pg if p is None else p.unionByName(pg)
        dg = spark.table(f"{prefix}_doclen{g}")
        doclen = dg if doclen is None else doclen.unionByName(dg)
    st = _read_meta(spark, prefix)
    tombs = _tombstone_ids(spark, prefix, st)
    if tombs is not None:
        p = p.join(tombs, "doc_id", "left_anti")
    dft = p.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    idf = F.log(
        1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_term = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        p.join(F.broadcast(dft), "token")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(score_term), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def compact_index(spark: SparkSession, prefix: str, buckets: int = 16) -> None:
    """Fold every delta generation back into the base tables — the
    k-way merge step of the sorted-run lifecycle (reference
    `merge`-all-runs †; chess importer compact_runs).  Generations are
    doc-disjoint, so compaction is a pure union rewritten bucketed —
    no aggregate re-combination needed.  The union is staged into a
    `_stage` table FIRST and swapped in with ALTER TABLE RENAME (the
    importer's swap-dir discipline): overwriting a table while lazily
    reading from it would corrupt it.

    NOT crash-atomic across the two table families: a crash between
    the postings swap and the doclen swap leaves the meta counter
    pointing at generation tables that no longer exist, so every
    subsequent read FAILS LOUDLY (missing table) rather than serving a
    half-compacted answer — recovery is a rebuild. A per-index
    manifest transaction (plans/layout.py snapshots) is the upgrade
    path if compaction ever needs to be online."""
    from ..plans.bucketing import drop_orphaned_table, write_bucketed

    meta = _read_meta(spark, prefix)  # stats survive the fold unchanged
    gens = _generations(spark, prefix)
    tombs = _tombstone_ids(spark, prefix, meta)
    if len(gens) == 1 and tombs is None:
        return  # nothing to fold, nothing to purge
    for kind, key in (("postings", "token"), ("doclen", "doc_id")):
        merged = None
        for g in gens:
            t_g = spark.table(f"{prefix}_{kind}{g}")
            merged = t_g if merged is None else merged.unionByName(t_g)
        if tombs is not None:
            # the PHYSICAL half of the delete lifecycle: tombstoned
            # rows are dropped from the rewrite, the masks retire
            merged = merged.join(tombs, "doc_id", "left_anti")
        write_bucketed(merged, f"{prefix}_{kind}_stage", [key], buckets=buckets)
        for g in gens:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{kind}{g}")
        drop_orphaned_table(spark, f"{prefix}_{kind}")
        spark.sql(
            f"ALTER TABLE {prefix}_{kind}_stage RENAME TO {prefix}_{kind}"
        )
    for i in range(1, _n_tomb_gens(meta) + 1):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_tomb_d{i}")
    # df is derived from the base postings exactly as the full build does
    dft = (
        spark.table(f"{prefix}_postings")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
    )
    write_bucketed(dft, f"{prefix}_df", ["token"], buckets=buckets)
    _write_meta(
        spark, prefix, 0, meta["n_docs"], meta["sum_dl"],
        meta["fp_sum_ids"],
    )


def maybe_compact_index(
    spark: SparkSession, prefix: str, max_generations: int = 8,
    buckets: int = 16,
) -> bool:
    """Compact when the delta-generation count exceeds the threshold —
    the cadence policy a maintenance loop calls after every append
    (query cost grows one bucket-pruned read per generation, so the
    threshold bounds it; same merge-after-N-runs discipline as the
    reference's sorted-run store). Returns True iff a compaction ran."""
    if _read_meta(spark, prefix)["n_deltas"] < max_generations:
        return False
    compact_index(spark, prefix, buckets=buckets)
    return True


def search_indexed(
    spark: SparkSession,
    prefix: str,
    terms: list[str],
    k: int = _TOP_K,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """Index-backed BM25 top-k for `terms` — bucket-pruned postings
    probe, candidate-only doclen join, identical scoring expression to
    bm25_scores (equivalence pinned in tests).

    Single-generation fast path ONLY: when the index has live delta
    generations (appends since the last compaction) OR pending
    tombstones (deletes since the last compaction) this DELEGATES to
    search_indexed_incremental — the base `_df`/`_doclen` tables here
    don't see appended docs, and the precomputed `_df` counts still
    include tombstoned ones, so querying them directly would answer
    from the wrong corpus (regression-pinned in tests)."""
    st = _read_meta(spark, prefix)
    if st["n_deltas"] > 0 or _n_tomb_gens(st) > 0:
        return search_indexed_incremental(
            spark, prefix, terms, k=k, k1=k1, b=b
        )
    p = spark.table(f"{prefix}_postings").filter(F.col("token").isin(terms))
    dft = spark.table(f"{prefix}_df").filter(F.col("token").isin(terms))
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    doclen = spark.table(f"{prefix}_doclen")
    idf = F.log(
        1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_term = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        p.join(F.broadcast(dft), "token")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(score_term), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


# The postings-index twin registered as a first-class query so the
# external gate verifies it oracle-exact: the oracle is IDENTICAL to
# search_bm25's (the index changes the ACCESS PATH, never the answer).
_BM25_ORACLE_SQL = ORACLES["search_bm25"]


def _index_prefix(sf_dir: str) -> str:
    """Deterministic catalog prefix per corpus dir (identifier-safe)."""
    import re

    return "bm25ix_" + re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_")


def _corpus_fingerprint(docs: DataFrame) -> tuple[int, int]:
    """(row count, sum of doc_id) — the cheap identity an index's meta
    row records so ensure_index can tell 'same corpus' from 'stale
    index' with one two-column aggregate (no text scan). In-place TEXT
    edits under unchanged doc_ids are NOT detected — callers that
    mutate documents must rebuild explicitly (fixture corpora are
    immutable, and at scale a corpus snapshot gets a fresh prefix)."""
    fp = docs.groupBy().agg(
        F.count("*").alias("n"), F.sum("doc_id").alias("s")
    ).first()
    return int(fp["n"]), int(fp["s"] or 0)


def ensure_index(
    spark: SparkSession, docs: DataFrame, prefix: str, buckets: int = 16
) -> bool:
    """Build the postings index for `docs` under `prefix` ONLY if it
    is absent or stale (corpus fingerprint mismatch). Registered
    queries go through this instead of rebuilding per call: once built
    for a corpus, the catalog tables are never dropped or rewritten
    again, so a previously returned (lazy) query DataFrame can never
    race a rebuild's drop+rewrite of the tables it scans. Returns True
    iff a build ran."""
    n, s = _corpus_fingerprint(docs)
    if spark.catalog.tableExists(f"{prefix}_meta"):
        m = _read_meta(spark, prefix)
        if m["n_docs"] == n and m["fp_sum_ids"] == s:
            return False
    build_inverted_index(spark, docs, prefix, buckets=buckets)
    return True


@register("search_bm25_postings", oracle=_BM25_ORACLE_SQL)
def search_bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4ix as a registered query: (re)build the materialized postings
    layout for this corpus, then answer BM25 top-k FROM THE INDEX —
    bucket-pruned postings probe + candidate-only doclen join, no
    full-corpus shuffle on the query path (plan-pinned in
    test_mining.py: SelectedBucketsCount < total and identical rows to
    the scan-based scorer).  Scale shape: the build is one
    (token, doc_id) shuffle paid once per corpus snapshot; every query
    after that touches O(matching postings), not O(corpus) — the
    sorted-run + sparse-index economics of the reference's
    `src/persistence/pos_db/` † re-expressed as bucketed tables. The
    build runs at most once per corpus (ensure_index) — repeat calls,
    and the sibling phrase/proximity queries on the same prefix, read
    the already-built tables, so no returned DataFrame ever races a
    rebuild."""
    prefix = _index_prefix(sf_dir)
    ensure_index(spark, t(spark, sf_dir, "documents"), prefix)
    return search_indexed(spark, prefix, _QUERY_TERMS)


@register("search_bm25_incremental", oracle=_BM25_ORACLE_SQL)
def search_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append lifecycle as a registered query: build the base index
    from HALF the corpus (even doc_ids), append the other half as a
    delta generation (one batch-sized shuffle — the corpus is never
    rescanned), then answer from the two-generation index.  The oracle
    is the full-corpus BM25 SQL: append+query must be EXACTLY
    equivalent to a fresh build over everything — df, avgdl and n_docs
    all reflect the union, which is the property that makes the sorted
    run lifecycle trustworthy (reference append/merge economics †,
    chess importer U2). Idempotent per corpus: when the two-generation
    index already exists with the full-corpus fingerprint, the
    build+append is skipped — so a previously returned DataFrame never
    races a rebuild of the tables it scans."""
    prefix = _index_prefix(sf_dir) + "_inc"
    docs = t(spark, sf_dir, "documents")
    n, s = _corpus_fingerprint(docs)
    if spark.catalog.tableExists(f"{prefix}_meta"):
        m = _read_meta(spark, prefix)
        if m["n_deltas"] == 1 and m["n_docs"] == n and m["fp_sum_ids"] == s:
            return search_indexed_incremental(spark, prefix, _QUERY_TERMS)
    build_inverted_index(spark, docs.filter(F.col("doc_id") % 2 == 0), prefix)
    append_to_index(spark, docs.filter(F.col("doc_id") % 2 == 1), prefix)
    return search_indexed_incremental(spark, prefix, _QUERY_TERMS)


_DELETED_PRED = "doc_id % 11 = 2"


@register(
    "search_bm25_deleted",
    oracle=_bm25_oracle(f"NOT ({_DELETED_PRED})"),
)
def search_bm25_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE lifecycle as a registered query: full-corpus index,
    then the `doc_id % 11 = 2` slice deleted (one tombstone generation
    — no postings rewritten), then BM25 answered from the index. The
    oracle is the BM25 SQL over the corpus MINUS the slice: tombstone
    masking, live-only df derivation and the recomputed n_docs/avgdl
    must together answer exactly as a fresh build over the live corpus
    — the property that makes tombstone deletes trustworthy (physical
    purge happens at the next compact_index, pinned equivalent in
    tests). Idempotent per corpus: a matching post-delete fingerprint
    skips the build+delete, so a previously returned plan never races
    a rebuild."""
    prefix = _index_prefix(sf_dir) + "_del"
    docs = t(spark, sf_dir, "documents")
    live = docs.filter(~F.expr(_DELETED_PRED))
    n, s = _corpus_fingerprint(live)
    if spark.catalog.tableExists(f"{prefix}_meta"):
        m = _read_meta(spark, prefix)
        if (
            # <= 1, not == 1: a corpus with NO doc_id % 11 == 2 rows
            # makes delete_from_index an empty-feed no-op (0 tombstone
            # generations), and the live-corpus fingerprint already
            # identifies the post-delete state — requiring exactly 1
            # would rebuild on every call AND let a previously returned
            # lazy plan race the rebuild's drop+rewrite
            _n_tomb_gens(m) <= 1
            and m["n_docs"] == n
            and m["fp_sum_ids"] == s
        ):
            return search_indexed(spark, prefix, _QUERY_TERMS)
    build_inverted_index(spark, docs, prefix)
    delete_from_index(
        spark, docs.filter(F.expr(_DELETED_PRED)).select("doc_id"), prefix
    )
    return search_indexed(spark, prefix, _QUERY_TERMS)


def phrase_indexed(
    spark: SparkSession, prefix: str, phrase: str, k: int = _TOP_K
) -> DataFrame:
    """Exact phrase-occurrence top-k from the POSITIONAL index — the
    classic positional-postings phrase walk, no corpus access: read
    each phrase token's (bucket-pruned) postings, then fold
    left-to-right keeping the positions where the matched prefix ENDS
    (ends' = (ends+1) ∩ positions(next token) — array_intersect of
    per-doc-unique position lists, exact).  Each join moves only the
    term-selective postings rows on doc_id; the corpus never scans.
    Token-level semantics: a phrase matches on token boundaries (the
    scan-based ``search_phrase`` counts raw SUBSTRING hits, which can
    span partial tokens — e.g. '…devalue tables…' contains
    'value table' — so the two operators answer related but distinct
    questions; the oracle encodes the token form)."""
    terms = phrase.split(" ")
    tombs = _tombstone_ids(spark, prefix, _read_meta(spark, prefix))

    def pruned(term: str) -> DataFrame:
        out = None
        for g in _generations(spark, prefix):
            pg = (
                spark.table(f"{prefix}_postings{g}")
                .filter(F.col("token") == term)
                .select("doc_id", "positions")
            )
            out = pg if out is None else out.unionByName(pg)
        if tombs is not None:
            out = out.join(tombs, "doc_id", "left_anti")
        return out

    cur = pruned(terms[0]).select("doc_id", F.col("positions").alias("ends"))
    for term in terms[1:]:
        nxt = pruned(term).select("doc_id", F.col("positions").alias("p"))
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("ends", lambda x: x + 1), F.col("p")
                ).alias("ends"),
            )
            .filter(F.size("ends") > 0)
        )
    return (
        cur.select("doc_id", F.size("ends").cast("long").alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(k)
    )


@register(
    "search_phrase_postings",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
g AS (
    SELECT doc_id, {{shingle}} AS bigram
    FROM tok WHERE len(s) >= 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM g WHERE bigram = '{_PHRASE}'
GROUP BY doc_id
ORDER BY n_hits DESC, doc_id
LIMIT {_TOP_K}
""".replace("{shingle}", _pipeline_shingle_sql(2)),
)
def search_phrase_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-boundary phrase count answered from the positional index
    (build + phrase walk); oracle is the token-bigram count over the
    corpus — append+index must reproduce it exactly."""
    prefix = _index_prefix(sf_dir)
    ensure_index(spark, t(spark, sf_dir, "documents"), prefix)
    return phrase_indexed(spark, prefix, _PHRASE)


def stream_index_maintenance(
    spark: SparkSession,
    src_dir: str,
    prefix: str,
    checkpoint_dir: str,
    buckets: int = 16,
    max_files_per_trigger: int | None = None,
) -> None:
    """Keep the postings index fresh over a continuously-ingested
    corpus: a file stream of new document batches, each micro-batch
    appended as a delta generation (T1 micro-batch ingest composed
    with the N4ix sorted-run lifecycle).

    foreachBatch is at-least-once, so replays are resolved by CONTENT,
    not epoch bookkeeping: a batch whose doc_ids are ALL already in
    the index is a replay of a committed append — skipped whole (the
    append's meta write is its single commit point, so "all present"
    can only mean "fully applied"). A PARTIAL overlap is corrupt input
    (some doc already indexed under a different batch) and fails
    loudly. Compaction cadence is the operator's call —
    compact_index() after the stream drains or on a generation-count
    threshold."""
    from ..sources.formats import DOCUMENTS_SCHEMA

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(src_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_ids = batch_df.select("doc_id").distinct()
        n_batch = batch_ids.count()
        if n_batch == 0:
            return
        n_dup = batch_ids.join(
            _existing_doc_ids(spark, prefix), "doc_id", "left_semi"
        ).count()
        if n_dup == n_batch:
            return  # replayed, already-committed batch — idempotent skip
        if n_dup:
            raise ValueError(
                f"stream_index_maintenance: batch {epoch_id} overlaps the "
                f"index on {n_dup}/{n_batch} doc_ids — partial overlap is "
                "corrupt input, not a replay; quarantine the batch"
            )
        append_to_index(
            spark, batch_df, prefix, buckets=buckets, check_disjoint=False
        )

    q = (
        docs.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()


_PROX_WINDOW = 3  # proximity slop: second term within +3 tokens


def proximity_indexed(
    spark: SparkSession,
    prefix: str,
    term_a: str,
    term_b: str,
    window: int = _PROX_WINDOW,
    k: int = _TOP_K,
) -> DataFrame:
    """Proximity (sloppy-phrase) search from the positional index:
    docs where ``term_b`` occurs within ``window`` tokens AFTER
    ``term_a``, scored by the number of such anchor occurrences.  Same
    access shape as the exact phrase walk — two bucket-pruned per-term
    postings reads joined on doc_id, span counting as an in-row
    higher-order predicate (exists j: i < j <= i+window), zero corpus
    access.  Position base (0- or 1-indexed) cancels in the
    difference, so the DuckDB oracle's 1-based list positions agree
    exactly."""

    tombs = _tombstone_ids(spark, prefix, _read_meta(spark, prefix))

    def pruned(term: str, out: str) -> DataFrame:
        res = None
        for g in _generations(spark, prefix):
            pg = (
                spark.table(f"{prefix}_postings{g}")
                .filter(F.col("token") == term)
                .select("doc_id", F.col("positions").alias(out))
            )
            res = pg if res is None else res.unionByName(pg)
        if tombs is not None:
            res = res.join(tombs, "doc_id", "left_anti")
        return res

    joined = pruned(term_a, "pa").join(pruned(term_b, "pb"), "doc_id")
    n_spans = F.size(
        F.filter(
            "pa",
            lambda i: F.exists(
                F.col("pb"), lambda j: (j > i) & (j <= i + window)
            ),
        )
    ).cast("long")
    return (
        joined.select("doc_id", n_spans.alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy(F.col("n_spans").desc(), "doc_id")
        .limit(k)
    )


@register(
    "search_proximity_postings",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
p1 AS (SELECT doc_id,
              unnest(list_filter(range(1, len(s)+1), i -> s[i] = 'window')) AS i
       FROM tok),
p2 AS (SELECT doc_id,
              unnest(list_filter(range(1, len(s)+1), j -> s[j] = 'table')) AS j
       FROM tok)
SELECT p1.doc_id AS doc_id, CAST(COUNT(DISTINCT p1.i) AS BIGINT) AS n_spans
FROM p1 JOIN p2
  ON p1.doc_id = p2.doc_id AND p2.j > p1.i AND p2.j <= p1.i + {_PROX_WINDOW}
GROUP BY p1.doc_id
ORDER BY n_spans DESC, doc_id
LIMIT {_TOP_K}
""",
)
def search_proximity_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'window' followed by 'table' within 3 tokens, answered from the
    positional index — the Lucene-style slop query a retrieval eval
    set builder needs beyond exact phrases."""
    prefix = _index_prefix(sf_dir)
    ensure_index(spark, t(spark, sf_dir, "documents"), prefix)
    return proximity_indexed(spark, prefix, "window", "table")


@register(
    "search_bm25_maintained",
    oracle=_bm25_oracle(f"NOT ({_DELETED_PRED})"),
)
def search_bm25_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full postings lifecycle composed and externally verified:
    base index from even doc_ids, odd doc_ids APPENDED as a delta
    generation, the `doc_id % 11 = 2` slice DELETED (one tombstone
    generation), then the UNIFIED MAINTENANCE SCHEDULER folds the
    generations and physically purges the tombstoned rows (due on the
    generation threshold), and BM25 answers from the compacted index.
    The oracle is the BM25 SQL over the live corpus: append+delete+
    compact+query must equal a fresh build over (everything minus the
    deleted slice) — the composition property none of the single-step
    queries pin externally. Idempotent per corpus: a compacted
    post-lifecycle fingerprint (0 delta gens, 0 tombstone gens) skips
    the rebuild."""
    from .maintenance import maintain_indexes

    prefix = _index_prefix(sf_dir) + "_mnt"
    docs = t(spark, sf_dir, "documents")
    live = docs.filter(~F.expr(_DELETED_PRED))
    n, s = _corpus_fingerprint(live)
    rebuild = True
    if spark.catalog.tableExists(f"{prefix}_meta"):
        m = _read_meta(spark, prefix)
        if (
            m["n_deltas"] == 0
            and _n_tomb_gens(m) == 0
            and m["n_docs"] == n
            and m["fp_sum_ids"] == s
        ):
            rebuild = False
    if rebuild:
        build_inverted_index(spark, docs.filter(F.col("doc_id") % 2 == 0), prefix)
        append_to_index(spark, docs.filter(F.col("doc_id") % 2 == 1), prefix)
        delete_from_index(
            spark, docs.filter(F.expr(_DELETED_PRED)).select("doc_id"), prefix
        )
        rep = maintain_indexes(
            spark, postings_prefixes=[prefix], max_generations=1
        )
        assert rep["postings"][prefix] == "compacted"
    return search_indexed(spark, prefix, _QUERY_TERMS)
