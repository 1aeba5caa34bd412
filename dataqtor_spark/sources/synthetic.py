"""Custom connector on the Spark 4 Python DataSource API: a deterministic
synthetic events generator.

The reference ingests only files a user uploads (home.py:28-49: Excel/CSV
through pandas).  An engine that owns its pipelines also needs sources that
are *not* files — and Spark 4's Python DataSource API is the idiomatic way
to add one without touching the JVM.  This source generates the same shape
as ``events.parquet`` at any requested row count, split across any number
of input partitions:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("dataqtor_synth")
          .option("rows", 1_000_000).option("partitions", 64).load())

Scale design: every partition generates its own row range in the executor
(nothing flows from the driver except the tiny partition descriptors), and
row content is a pure function of the row index (splitmix64), so the
dataset is reproducible across retries/speculation — a task that reruns
produces bit-identical rows, which keeps downstream exactly-once sinks
honest.  Arrow batches are yielded per 64k rows to keep the Python→JVM
hop vectorized.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["view", "click", "cart", "purchase", "refund"]
_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _splitmix64(x: int) -> int:
    # public-domain splitmix64: the standard seed-expansion mixer
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", max(1, self.rows // 64)))

    def partitions(self):
        per = -(-self.rows // self.n_parts)
        return [_RangePartition(i * per, min((i + 1) * per, self.rows),
                                self.seed)
                for i in range(self.n_parts) if i * per < self.rows]

    def read(self, partition: _RangePartition) -> Iterator:
        import pyarrow as pa

        for lo in range(partition.start, partition.end, 65536):
            hi = min(lo + 65536, partition.end)
            ids, ts, uid, etype, val = [], [], [], [], []
            for i in range(lo, hi):
                h = _splitmix64(i ^ partition.seed)
                ids.append(i)
                ts.append(_EPOCH + _dt.timedelta(
                    microseconds=(h >> 20) % (30 * 86400 * 1_000_000)))
                uid.append(h % self.n_users)
                etype.append(EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)])
                val.append(round(((h >> 16) % 1_000_000) / 100.0, 2))
            yield pa.record_batch(
                [pa.array(ids, pa.int64()),
                 pa.array(ts, pa.timestamp("us", tz="UTC")),
                 pa.array(uid, pa.int64()),
                 pa.array(etype, pa.string()),
                 pa.array(val, pa.float64())],
                names=["event_id", "ts", "user_id", "event_type", "value"])


class SyntheticEventsDataSource(DataSource):
    """``format("dataqtor_synth")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "dataqtor_synth"

    def schema(self) -> str:
        return ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticReader(self.options)


def register_sources(spark) -> None:
    """Register every custom Python data source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
