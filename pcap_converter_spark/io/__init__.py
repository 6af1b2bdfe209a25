from pcap_converter_spark.io.loader import TABLES, load_tables, register_views  # noqa: F401
