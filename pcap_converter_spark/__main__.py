from pcap_converter_spark.cli import main

raise SystemExit(main())
