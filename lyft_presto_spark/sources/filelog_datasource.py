"""File-backed log-segment connector: the Kafka record-stream SPI without
a broker.

The reference scans Kafka topics as static tables of
(key, value, partition, offset, timestamp) records
(presto-kafka/.../KafkaRecordSet.java:53, splits per topic-partition in
KafkaSplitManager) and layers the decoder SPI on the value bytes. No broker
exists in this environment, so this connector demonstrates the SAME scan
contract over a directory of log segments — the Kafka storage model with
the network removed:

- a "topic" is a directory; each file ``p<partition>-<base_offset>.log``
  is one segment: newline-delimited records, record offset = base_offset +
  line index (exactly Kafka's segment-file layout, minus the binary
  framing);
- the BATCH reader plans one InputPartition per segment (the
  topic-partition split parallelism KafkaSplitManager produces) and
  supports ``startingOffset`` / ``endingOffset`` pruning — segments wholly
  outside the range are never opened (the connector-level offset pushdown
  the reference applies via KafkaFilterManager);
- the STREAM reader tracks per-partition offsets and replays any committed
  range deterministically (``readBetweenOffsets`` — exactly-once recovery's
  contract), like the tpchgen stream reader but over external files with
  multiple partitions;
- rows come out in the Kafka source schema (key/value binary + topic/
  partition/offset/timestamp), so every decoder in
  ``sources/kafka_decoders.py`` composes unchanged — against a real
  cluster the input swaps to ``spark.read.format("kafka")`` with zero
  decoder changes.

Scale notes: one split per segment file is the natural parallel unit (a
100 TB topic is many segments); offset pruning happens at PLANNING time
from file names alone (no file opened); records stream through an
iterator — nothing buffers a whole segment.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), False),
        StructField("partition", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("timestamp", TimestampType(), False),
    ]
)

# Fixed per-connector epoch for record timestamps (offset-derived so rows
# are deterministic — a real broker stamps append time; a replayable test
# double must not).
_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)


def _segments(path: str) -> list[tuple[int, int, str]]:
    """Sorted (partition, base_offset, file) triples from segment names."""
    out = []
    for f in os.listdir(path):
        if not f.endswith(".log"):
            continue
        stem = f[: -len(".log")]
        try:
            p_str, base_str = stem.split("-", 1)
            if not p_str.startswith("p"):
                continue
            out.append((int(p_str[1:]), int(base_str), os.path.join(path, f)))
        except ValueError:
            continue  # foreign file in the directory: ignored, like Kafka
    return sorted(out)


def write_segments(
    path: str,
    records: list[tuple[int, bytes | None, bytes]],
    segment_records: int = 128,
) -> int:
    """Test/ingest helper: lay out (partition, key, value) records as
    segment files in Kafka's storage shape (per-partition offset order,
    ``segment_records`` per file). Returns the number of segments."""
    os.makedirs(path, exist_ok=True)
    by_part: dict[int, list[tuple[bytes | None, bytes]]] = {}
    for p, k, v in records:
        by_part.setdefault(p, []).append((k, v))
    n = 0
    for p, recs in by_part.items():
        for base in range(0, len(recs), segment_records):
            seg = recs[base : base + segment_records]
            fname = os.path.join(path, f"p{p}-{base}.log")
            with open(fname, "wb") as f:
                for k, v in seg:
                    kk = k if k is not None else b""
                    # tab-framed key\tvalue per line; values must not
                    # contain raw newlines/tabs (JSON/CSV payloads don't)
                    f.write(kk + b"\t" + v + b"\n")
            n += 1
    return n


class _SegmentSplit(InputPartition):
    def __init__(self, topic: str, part: int, base: int, path: str,
                 lo: int, hi: int):
        self.topic = topic
        self.part = part
        self.base = base
        self.path = path
        self.lo = lo  # half-open pruned offset range
        self.hi = hi


class FileLogReader(DataSourceReader):
    """One split per segment file; offset bounds prune segments at
    planning time from file names alone."""

    def __init__(self, path: str, topic: str, lo: int, hi: int):
        self.path = path
        self.topic = topic
        self.lo = lo
        self.hi = hi

    def partitions(self):
        segs = _segments(self.path)
        # next segment's base bounds this one's records; the last segment
        # is unbounded until read (mirrors Kafka's active segment)
        out = []
        by_part: dict[int, list[tuple[int, str]]] = {}
        for p, base, f in segs:
            by_part.setdefault(p, []).append((base, f))
        for p, lst in by_part.items():
            for i, (base, f) in enumerate(lst):
                nxt = lst[i + 1][0] if i + 1 < len(lst) else None
                # prune: segment wholly below lo (when its end is known)
                # or wholly at/above hi
                if nxt is not None and nxt <= self.lo:
                    continue
                if base >= self.hi:
                    continue
                out.append(
                    _SegmentSplit(self.topic, p, base, f, self.lo, self.hi)
                )
        return out or [_SegmentSplit(self.topic, -1, 0, "", 0, 0)]

    def read(self, split: _SegmentSplit):
        if split.part < 0:
            return
        # iterate the file object — records stream through; memory stays
        # bounded per split even for a multi-GB segment (ADVICE r10)
        with open(split.path, "rb") as f:
            for i, line in enumerate(f):
                if line.endswith(b"\n"):
                    line = line[:-1]
                if not line:
                    continue
                off = split.base + i
                if off < split.lo or off >= split.hi:
                    continue
                k, _, v = line.partition(b"\t")
                yield (
                    k or None,
                    v,
                    self.topic,
                    split.part,
                    off,
                    _EPOCH.replace(tzinfo=None),
                )


class FileLogStreamReader(SimpleDataSourceStreamReader):
    """Per-partition offset tracking with deterministic replay — the
    exactly-once recovery contract KafkaRecordSet's streaming twin needs."""

    def __init__(self, path: str, topic: str, per_batch: int):
        self.path = path
        self.topic = topic
        self.per = max(1, per_batch)

    def _all_records(self) -> dict[int, list[tuple[int, bytes, bytes]]]:
        recs: dict[int, list[tuple[int, bytes, bytes]]] = {}
        for p, base, f in _segments(self.path):
            with open(f, "rb") as fh:
                for i, line in enumerate(fh):
                    if line.endswith(b"\n"):
                        line = line[:-1]
                    if not line:
                        continue
                    k, _, v = line.partition(b"\t")
                    recs.setdefault(p, []).append((base + i, k, v))
        for lst in recs.values():
            lst.sort()
        return recs

    def initialOffset(self) -> dict:
        return {}  # per-partition offsets appear as partitions are seen

    def read(self, start: dict):
        recs = self._all_records()
        end = {}
        for p, lst in recs.items():
            lo = int(start.get(str(p), 0))
            end[str(p)] = min(lo + self.per, lst[-1][0] + 1 if lst else lo)
        # partitions absent from recs keep their start offsets
        for p in start:
            end.setdefault(p, start[p])
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict):
        recs = self._all_records()
        out = []
        for p, lst in recs.items():
            lo = int(start.get(str(p), 0))
            hi = int(end.get(str(p), 0))
            for off, k, v in lst:
                if lo <= off < hi:
                    out.append(
                        (
                            k or None,
                            v,
                            self.topic,
                            p,
                            off,
                            _EPOCH.replace(tzinfo=None),
                        )
                    )
        return iter(out)


class FileLogDataSource(DataSource):
    """``format("filelog")`` — options: ``path`` (segment directory),
    ``topic`` (name stamped on rows, default the directory basename),
    ``startingOffset`` / ``endingOffset`` (batch offset pruning),
    ``rowsPerBatch`` (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "filelog"

    def schema(self) -> StructType:
        return RECORD_SCHEMA

    def _topic(self) -> str:
        return self.options.get(
            "topic", os.path.basename(self.options["path"].rstrip("/"))
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        lo = int(self.options.get("startingOffset", "0"))
        hi = int(self.options.get("endingOffset", str(2**62)))
        return FileLogReader(self.options["path"], self._topic(), lo, hi)

    def simpleStreamReader(self, schema: StructType):
        return FileLogStreamReader(
            self.options["path"],
            self._topic(),
            int(self.options.get("rowsPerBatch", "100")),
        )


_REGISTERED: set[str] = set()


def register_filelog(spark) -> None:
    """Idempotent per session (the tpchgen registration pattern)."""
    from ..session import session_key

    if session_key(spark) in _REGISTERED:
        return
    spark.dataSource.register(FileLogDataSource)
    _REGISTERED.add(session_key(spark))
