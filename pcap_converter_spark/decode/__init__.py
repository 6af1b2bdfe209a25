from pcap_converter_spark.decode.parser import decode_packet, decode_packets_to_pandas  # noqa: F401
