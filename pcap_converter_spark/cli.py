"""Command-line entry point — the reference CLI, Spark-edition.

Mirrors /root/reference/src/main.rs:22-43 (`pcap-converter -f in.pcap -o
out.parquet [-n] [-j N] [-v]`)::

    python -m pcap_converter_spark -f in.pcap -o out.parquet
    python -m pcap_converter_spark -f 'captures/*.pcap' -o out.parquet -j 16 -n

Differences from the reference, by design:
- `-f` accepts globs / multiple files (the corpus case the reference lacks).
- `-j` sizes local-mode cores; under spark-submit the cluster master wins.
- `--single-file` coalesces output to one parquet part (D5 parity; default
  is N part-files, which downstream DuckDB/Spark read identically via glob).
"""

from __future__ import annotations

import argparse
import glob
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="pcap-converter-spark",
        description="Convert pcap/pcapng captures to analysis-ready Parquet "
        "(with UDP fragment repair, as the reference converter does).",
    )
    ap.add_argument("-f", "--file", required=True, nargs="+",
                    help="pcap/pcapng path(s); globs allowed")
    ap.add_argument("-o", "--out", required=True, help="output parquet path")
    ap.add_argument("-n", "--nodefrag", action="store_true",
                    help="do not combine fragments")
    ap.add_argument("-j", type=int, default=None, metavar="N",
                    help="local-mode parallelism (default: all cores)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--single-file", action="store_true",
                    help="write one parquet part-file instead of N")
    args = ap.parse_args(argv)

    paths: list[str] = []
    for pat in args.file:
        hits = sorted(glob.glob(pat))
        if not hits:
            print(f"error: no files match {pat!r}", file=sys.stderr)
            return 2
        paths.extend(hits)

    from pcap_converter_spark.operators.convert import convert
    from pcap_converter_spark.session import get_spark

    master = f"local[{args.j}]" if args.j else None
    spark = get_spark("pcap-converter", master=master)
    if not args.verbose:
        spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    stats = convert(
        spark, paths, args.out,
        nodefrag=args.nodefrag, single_file=args.single_file,
    )
    dt = time.perf_counter() - t0
    pps = stats["packets"] / dt if dt > 0 else 0.0
    print(
        f"Wrote {args.out}: {stats['packets']} packets, "
        f"{stats['errors']} decode errors, "
        f"{stats['fragment_pct']:.0f}% fragmented"
        f"{' (defragmented)' if stats['defragged'] else ''} "
        f"in {dt:.2f}s ({pps / 1e3:.0f}k pkts/s)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
