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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
