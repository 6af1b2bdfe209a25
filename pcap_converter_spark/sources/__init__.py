from pcap_converter_spark.sources.pcap import index_pcap, read_pcap, read_pcap_chunk  # noqa: F401
