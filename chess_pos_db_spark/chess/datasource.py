"""`pgn` as a first-class Spark data source (Python Data Source API).

SURVEY.md §4 names a custom DataSource for PGN as the optional
follow-on to the chunk-splitting source (reference: `src/chess/Pgn.h`
LazyPgnFileReader †, which streams one file sequentially). Spark 4's
Python Data Source API makes it a public, declarative surface:

    spark.dataSource.register(PgnDataSource)
    spark.read.format("pgn").load("/dumps/*.pgn")

One InputPartition per byte-range chunk — the same game-boundary
split planning the importer uses (`plan_pgn_splits` +
`chunk_game_slices`), so a single large dump fans out across the
cluster and Spark schedules/retries chunks like any file source's
splits. Rows are game records; `(file_idx, game_offset)` is a stable
total order equal to a sequential read's (offsets are game-start
bytes, unique within a file), so downstream ordinal assignment — the
importer's two-pass dense game_id — remains a pure window/join over
this source's output when dense ids are needed.

The reader is metadata-only on the driver (paths + sizes); file bytes
are touched exclusively inside partitions, executor-side — the
FileInputFormat discipline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import pgn

_SCHEMA_DDL = (
    "path string, file_idx int, game_offset long, "
    "tags map<string,string>, sans array<string>, result string, "
    "year int, month int, day int"
)

DEFAULT_CHUNK_BYTES = 16 << 20


@dataclass
class PgnInputPartition(InputPartition):
    path: str
    file_idx: int
    start: int
    end: int


class PgnDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        import glob
        import os

        raw = options.get("path")
        if not raw:
            raise ValueError("pgn source requires a path")
        paths = sorted(glob.glob(raw)) if any(
            c in raw for c in "*?["
        ) else [raw]
        expanded: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                expanded.extend(
                    sorted(
                        os.path.join(p, f)
                        for f in os.listdir(p)
                        if f.endswith(".pgn")
                    )
                )
            else:
                expanded.append(p)
        if not expanded:
            raise ValueError(f"pgn source matched no files: {raw}")
        self._files = [os.path.abspath(p) for p in expanded]
        self._chunk_bytes = int(
            options.get("chunk_bytes", DEFAULT_CHUNK_BYTES)
        )
        self._sizes = {p: os.path.getsize(p) for p in self._files}

    def partitions(self) -> Sequence[InputPartition]:
        out: list[InputPartition] = []
        cb = self._chunk_bytes
        for idx, path in enumerate(self._files):
            size = self._sizes[path]
            n_chunks = max(1, -(-size // cb))
            for ci in range(n_chunks):
                out.append(
                    PgnInputPartition(
                        path, idx, ci * cb, min((ci + 1) * cb, size)
                    )
                )
        return out

    def read(self, partition: PgnInputPartition) -> Iterator[tuple]:
        for offset, text in pgn.chunk_game_slices(
            partition.path, partition.start, partition.end
        ):
            if not pgn.game_is_kept(text):
                continue
            g = pgn.parse_game(text)
            yield (
                partition.path,
                partition.file_idx,
                offset,
                g["tags"],
                g["sans"],
                g["result"],
                g["year"],
                g["month"],
                g["day"],
            )


class PgnDataSource(DataSource):
    """Register with ``spark.dataSource.register(PgnDataSource)``; read
    with ``spark.read.format("pgn").load(path_or_glob)``. Options:
    ``chunk_bytes`` (split size upper bound, default 16 MiB)."""

    @classmethod
    def name(cls) -> str:
        return "pgn"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return PgnDataSourceReader(self.options)

    def streamReader(self, schema: StructType) -> "PgnStreamReader":
        return PgnStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming form: the reference's `append` loop (watch a directory, new
# game files become new database runs) as a NATIVE streaming source —
# micro-batches are planned from the set of not-yet-seen files, each
# file still fans out into byte-range chunk partitions, and the
# checkpoint holds the offset (the seen-file list), so restarts resume
# exactly-once without rescanning imported dumps.
#
#     spark.dataSource.register(PgnDataSource)
#     spark.readStream.format("pgn").load(dir)  ->  foreachBatch(import)
#
# Offsets are JSON dicts per the Python Data Source streaming API; a
# file is identified by (path, size) — PGN dumps are immutable once
# written, the standard file-source contract.
# ---------------------------------------------------------------------------


class PgnStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._options = dict(options)
        self._chunk_bytes = int(options.get("chunk_bytes", DEFAULT_CHUNK_BYTES))

    def _current_files(self) -> list[str]:
        import glob
        import os

        raw = self._options.get("path")
        if not raw:
            raise ValueError("pgn source requires a path")
        if os.path.isdir(raw):
            return sorted(
                os.path.abspath(os.path.join(raw, f))
                for f in os.listdir(raw)
                if f.endswith(".pgn")
            )
        if any(c in raw for c in "*?["):
            return sorted(os.path.abspath(p) for p in glob.glob(raw))
        return [os.path.abspath(raw)] if os.path.exists(raw) else []

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": self._current_files()}

    def partitions(self, start: dict, end: dict):
        import os

        new = [p for p in end["seen"] if p not in set(start["seen"])]
        out = []
        cb = self._chunk_bytes
        for idx, path in enumerate(new):
            size = os.path.getsize(path)
            n_chunks = max(1, -(-size // cb))
            for ci in range(n_chunks):
                out.append(
                    PgnInputPartition(
                        path, idx, ci * cb, min((ci + 1) * cb, size)
                    )
                )
        # the API requires >= 1 partition per plan; an empty batch reads
        # an empty byte range
        if not out and end["seen"]:
            out.append(PgnInputPartition(end["seen"][0], 0, 0, 0))
        return out or [PgnInputPartition("", 0, 0, 0)]

    def read(self, partition: PgnInputPartition):
        if partition.end <= partition.start:
            return iter(())
        # same per-chunk row logic as the batch reader (the method only
        # touches the partition, so it is shared unbound)
        return PgnDataSourceReader.read(self, partition)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint already persisted `end`
