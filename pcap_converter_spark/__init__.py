"""pcap_converter_spark — a PySpark-native analytics engine with the
capabilities of NLADC/pcap-converter (reference: /root/reference), rebuilt
Spark-first.

Layers
------
- ``sources``   : pcap/pcapng chunk indexer + distributed reader (the one
                  operator Spark lacks natively).
- ``decode``    : the per-packet extraction layer (E1-E17 in SURVEY.md §2.2)
                  as batch-oriented Python running under ``mapInPandas``.
- ``operators`` : relational + pipeline operators (defrag R2-R6, dedup,
                  similarity search, text analysis, multimodal plumbing).
- ``io``        : testdata loaders and Parquet sinks.
- ``queries``   : the declared correctness query registry (SURVEY.md §2.6)
                  with dual-dialect (Spark DataFrame / DuckDB SQL) entries.
- ``streaming`` : Structured Streaming variants of the batch operators.
"""

__version__ = "0.1.0"

from pcap_converter_spark.session import get_spark  # noqa: F401
