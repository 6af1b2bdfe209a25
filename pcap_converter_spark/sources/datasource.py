"""Spark 4 Python DataSource face of the pcap source:
``spark.read.format("pcap").load(path)``.

The chunk indexer runs at planning time (``DataSourceReader.partitions``,
driver side) — one ``InputPartition`` per chunk descriptor, so decode
parallelism equals chunk count exactly as in ``read_pcap``; executors
decode their chunk through the same packed NumPy decoder and hand Spark
Arrow RecordBatches (zero row-by-row Python). This is the API-idiomatic
entry (format registry, ``.load()`` ergonomics, schema attached to the
source); ``read_pcap`` remains the primary library entry because it also
wires the exactly-once plan ``Observation`` for packet/error stats, which
the DataSource API has no hook for — the DataSource keeps the per-row
``errors`` column instead, so ``sum(errors)`` recovers the reference's
"Packets: N Errors: M" accounting (statswriter.rs:61-68).

Options (all strings, per the DataSource options contract):

- ``path`` (or the ``.load(path)`` argument); globs allowed
- ``target_chunk_bytes``: split granularity (default 64 MB)
- ``speculative``: "auto" (default) | "true" | "false" — colossal-file
  O(1) splitting, see ``sources/pcap._index_or_split``

Register once per session::

    from pcap_converter_spark.sources.datasource import register
    register(spark)
    df = spark.read.format("pcap").load("/captures/*.pcap")
"""

from __future__ import annotations

import glob
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PcapDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self):
        from pcap_converter_spark.sources.pcap import DECODE_OUTPUT_SCHEMA

        return DECODE_OUTPUT_SCHEMA

    def reader(self, schema) -> "PcapDataSourceReader":
        return PcapDataSourceReader(dict(self.options), schema)


class PcapDataSourceReader(DataSourceReader):
    def __init__(self, options: dict, schema) -> None:
        self._options = options
        self._schema = schema

    def partitions(self) -> list[InputPartition]:
        from pcap_converter_spark.sources.pcap import (
            DEFAULT_CHUNK_BYTES,
            _index_or_split,
        )

        path = self._options.get("path")
        if not path:
            raise ValueError("pcap source requires a path: .load('/file.pcap')")
        paths = (
            sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
        )
        if not paths:
            raise FileNotFoundError(f"pcap source: no files match {path!r}")
        target = int(self._options.get("target_chunk_bytes", DEFAULT_CHUNK_BYTES))
        spec_raw = str(self._options.get("speculative", "auto")).lower()
        speculative: bool | str = {"true": True, "false": False}.get(
            spec_raw, "auto"
        )
        chunks = []
        for p in paths:
            chunks.extend(_index_or_split(p, target, speculative))
        return [InputPartition(c.__dict__) for c in chunks]

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from pcap_converter_spark.sources.pcap import read_pcap_chunk

        pdf = read_pcap_chunk(partition.value)
        table = pa.Table.from_pandas(
            pdf, schema=to_arrow_schema(self._schema), preserve_index=False
        )
        yield from table.to_batches()


def register(spark) -> None:
    """Idempotently register the ``pcap`` format on this session."""
    spark.dataSource.register(PcapDataSource)
