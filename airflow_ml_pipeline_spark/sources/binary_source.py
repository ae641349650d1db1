"""Custom Python DataSource (Spark 4 API): deterministic synthetic binary
payloads — the ingestion pattern for multimodal (image/audio) corpora.

Why a custom source and not a UDF over ``spark.range``: the DataSource API
gives (a) explicit input partitions so parallelism is planned, not
inherited, (b) a declared schema (binary + typed metadata) checked at plan
time, and (c) the exact extension point a real codec-backed source
(S3-object reader, tar-shard reader, WebDataset) would use — swap
``_payload`` for an object-store fetch and nothing else changes.

The payload generator is a deterministic xorshift byte stream seeded by
row id, so tests can assert exact content without any media libraries
(container has none — codec decode stays stubbed per the multimodal
operator module, operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _payload(row_id: int, n_bytes: int) -> bytes:
    """Deterministic pseudo-random bytes per row id (xorshift64*)."""
    x = (row_id + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while len(out) < n_bytes:
        x ^= (x >> 12)
        x ^= (x << 25) & 0xFFFFFFFFFFFFFFFF
        x ^= (x >> 27)
        out += ((x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    return bytes(out[:n_bytes])


class FakeMediaDataSource(DataSource):
    """``spark.read.format("fake_media")`` — options:

    - ``n_rows`` (default 64): total rows
    - ``n_partitions`` (default 8): input partitions (planned parallelism)
    - ``payload_bytes`` (default 256): binary payload size per row
    """

    @classmethod
    def name(cls) -> str:
        return "fake_media"

    def schema(self) -> str:
        return (
            "media_id bigint, kind string, width int, height int, "
            "payload binary"
        )

    def reader(self, schema) -> "FakeMediaReader":
        return FakeMediaReader(self.options)

    def simpleStreamReader(self, schema) -> "FakeMediaStreamReader":
        return FakeMediaStreamReader(self.options)


class FakeMediaReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 64))
        self.n_parts = int(options.get("n_partitions", 8))
        self.payload_bytes = int(options.get("payload_bytes", 256))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):
        kinds = ("image", "audio", "video")
        for i in range(partition.start, partition.end):
            yield (
                i,
                kinds[i % 3],
                64 + (i % 8) * 32,
                64 + (i % 5) * 32,
                _payload(i, self.payload_bytes),
            )


def register(spark) -> None:
    """Register the source on a session: ``spark.read.format('fake_media')``."""
    spark.dataSource.register(FakeMediaDataSource)


class FakeMediaStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of media rows: offset = next media_id. Each
    ``read`` emits up to ``rows_per_batch`` rows and advances the offset —
    the replay/commit contract a Kafka-like source implements. Bounded by
    ``n_rows`` so AvailableNow terminates."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 64))
        self.batch = int(options.get("rows_per_batch", 16))
        self.payload_bytes = int(options.get("payload_bytes", 256))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch, self.n_rows)
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["next"], end["next"]))

    def _rows(self, lo: int, hi: int):
        kinds = ("image", "audio", "video")
        return [
            (
                i,
                kinds[i % 3],
                64 + (i % 8) * 32,
                64 + (i % 5) * 32,
                _payload(i, self.payload_bytes),
            )
            for i in range(lo, hi)
        ]
