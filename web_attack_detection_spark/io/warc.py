"""WARC source: crawl-archive ingestion as a Spark 4 Python data source.

Web-scale training corpora start life as WARC files (ISO 28500 — the
Common Crawl distribution format). The format is simple enough to
parse with the standard library: records are
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<payload>\\r\\n\\r\\n`` with the
payload length in ``Content-Length``. This module provides:

- :class:`WarcDataSource` — a Python Data Source (Spark 4 API,
  ``spark.dataSource.register``) exposing ``.read.format("warc")``:
  one input partition PER FILE, so a directory of N archives scans
  with N-way parallelism exactly like the built-in file sources; rows
  are (record_id, url, warc_type, content_type, ts, payload).
- :func:`write_warc` — a minimal writer (used by tests and usable as
  a sink for re-archiving).

Scale notes: WARC ingestion is embarrassingly parallel (file == unit
of work; records stream — the parser never holds more than one record
in memory). Python-side parsing costs one Arrow hop, which is the
accepted price for a format Spark has no JVM reader for; downstream
processing (dedup, quality, decontamination — plans/text*.py) is all
JVM-side from the first DataFrame on. Plain ``.warc`` only: the
usual ``.warc.gz`` member-per-record gzip framing needs a
seek-per-record reader — documented boundary, same class as the
codec-less image decode.
"""

from __future__ import annotations

from collections.abc import Iterator
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    BinaryType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_type", StringType()),
        StructField("content_type", StringType()),
        StructField("ts", StringType()),
        StructField("length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def write_warc(path: str, records: list[dict]) -> None:
    """Write a plain WARC/1.0 file. Each record dict: url, payload
    (bytes), and optionally warc_type / content_type / ts / record_id."""
    with open(path, "wb") as f:
        for i, r in enumerate(records):
            payload = r["payload"]
            headers = [
                "WARC/1.0",
                f"WARC-Type: {r.get('warc_type', 'response')}",
                f"WARC-Record-ID: {r.get('record_id', f'<urn:uuid:rec-{i}>')}",
                f"WARC-Date: {r.get('ts', '2024-01-01T00:00:00Z')}",
                f"WARC-Target-URI: {r['url']}",
                f"Content-Type: {r.get('content_type', 'text/plain')}",
                f"Content-Length: {len(payload)}",
            ]
            f.write(("\r\n".join(headers) + "\r\n\r\n").encode())
            f.write(payload)
            f.write(b"\r\n\r\n")


def parse_warc(path: str) -> Iterator[tuple]:
    """Stream records from one plain WARC file (constant memory)."""
    with open(path, "rb") as f:
        while True:
            line = f.readline()
            if not line:
                return
            if line.strip() != b"WARC/1.0":
                continue  # skip inter-record blank lines
            headers: dict[str, str] = {}
            while True:
                h = f.readline()
                if not h or h in (b"\r\n", b"\n"):
                    break
                k, _, v = h.decode("utf-8", "replace").partition(":")
                headers[k.strip().lower()] = v.strip()
            n = int(headers.get("content-length", "0"))
            payload = f.read(n)
            yield (
                headers.get("warc-record-id", ""),
                headers.get("warc-target-uri", ""),
                headers.get("warc-type", ""),
                headers.get("content-type", ""),
                headers.get("warc-date", ""),
                n,
                payload,
            )


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")

    def partitions(self):
        p = Path(self.path)
        files = sorted(p.glob("*.warc")) if p.is_dir() else [p]
        return [_WarcFilePartition(str(f)) for f in files]

    def read(self, partition: _WarcFilePartition):
        yield from parse_warc(partition.path)


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load(dir_or_file)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WarcReader(self.options)
