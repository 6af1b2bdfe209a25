"""Generate the 2,500-row ``packets`` correctness fixture (FIXTURES.md §1).

Crafts a deterministic pcap exercising every extractor (E1-E17) and the
defrag operator (R2-R6), decodes it through the real source+parser code
(index_pcap → read_pcap_chunk — no Spark session needed), and writes:

- fixtures/data/packets_fixture.pcap   (binary, reused by source tests)
- fixtures/data/packets.parquet        (single file; Spark + DuckDB read it
                                        identically for PQ1-PQ7)

Row population per FIXTURES.md §1: fragmented DNS/NTP datagram groups (>1%
of rows, incl. one group with a missing first fragment), plain DNS (incl.
``<Root>``), NTP mode-7 + v4, TCP flag variety, ICMP echo + dest-unreach
(quoting UDP, TCP, and an inner IPv6/UDP), IPv6 rows, DHDiscover, and
non-IP ARP rows. frame_time is unique per row (1 ms stride).

Run:  python fixtures/gen_packets.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from fixtures import pcapgen as g

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
PCAP_PATH = os.path.join(DATA_DIR, "packets_fixture.pcap")
PARQUET_PATH = os.path.join(DATA_DIR, "packets.parquet")

BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def build_packets() -> list[tuple[int, bytes]]:
    pkts: list[bytes] = []
    m1, m2 = g.mac(1), g.mac(2)

    def eth4(payload: bytes) -> bytes:
        return g.ethernet(m1, m2, 0x0800, payload)

    def eth6(payload: bytes) -> bytes:
        return g.ethernet(m1, m2, 0x86DD, payload)

    # 1) fragmented DNS-over-UDP: 30 groups x 3 fragments
    qtypes = [1, 28, 255]
    for grp in range(30):
        src, dst = f"10.0.{grp}.1", f"10.1.{grp}.1"
        ident = 1000 + grp
        dns = g.dns_query(f"frag{grp}.example.com", qtypes[grp % 3])
        first = g.udp(33000 + grp, 53, dns, length=8 + len(dns) + 64)
        pkts.append(eth4(g.ipv4(src, dst, 17, first, ident=ident, mf=True)))
        pkts.append(eth4(g.ipv4(src, dst, 17, bytes(64), ident=ident, frag_offset=len(first) // 8, mf=True)))
        pkts.append(eth4(g.ipv4(src, dst, 17, bytes(32), ident=ident, frag_offset=(len(first) + 64) // 8)))

    # one group whose FIRST fragment is missing: coalesce keeps NULLs
    pkts.append(eth4(g.ipv4("10.9.9.1", "10.9.9.2", 17, bytes(64), ident=4242, frag_offset=8, mf=True)))
    pkts.append(eth4(g.ipv4("10.9.9.1", "10.9.9.2", 17, bytes(32), ident=4242, frag_offset=16)))

    # one fragmented NTP mode-7 group (ntp_priv_reqcode propagation)
    ntp_payload = g.udp(123, 123, g.ntp_v2_mode7(42), length=8 + 8 + 64)
    pkts.append(eth4(g.ipv4("10.2.0.1", "10.2.0.2", 17, ntp_payload, ident=5000, mf=True)))
    pkts.append(eth4(g.ipv4("10.2.0.1", "10.2.0.2", 17, bytes(64), ident=5000, frag_offset=(8 + 8) // 8)))

    # 2) plain DNS: 600 rows (queries + responses, varied qnames/qtypes)
    names = ["example.com", "a.root-servers.net", "", "xn--nxasmq6b.example", "deep.sub.domain.test"]
    for i in range(600):
        qname = names[i % len(names)]
        qtype = qtypes[i % 3]
        resp = i % 4 == 0
        dns = g.dns_query(qname, qtype, txid=i & 0xFFFF, response=resp)
        udp = g.udp(53 if resp else 40000 + (i % 1000), 40000 + (i % 1000) if resp else 53, dns)
        pkts.append(eth4(g.ipv4(f"172.16.{i % 8}.{1 + i % 250}", "8.8.8.8", 17, udp, ident=0, ttl=60 + i % 4)))

    # 3) NTP: 120 mode-7 + 80 normal v4
    for i in range(120):
        udp = g.udp(50000 + i, 123, g.ntp_v2_mode7(20 + (i % 3) * 11))
        pkts.append(eth4(g.ipv4(f"192.168.1.{1 + i % 200}", "10.0.0.123", 17, udp, ident=0)))
    for i in range(80):
        udp = g.udp(123, 51000 + i, g.ntp_v4())
        pkts.append(eth4(g.ipv4("10.0.0.123", f"192.168.2.{1 + i % 200}", 17, udp, ident=0)))

    # 4) TCP: 800 rows, flag variety (packetstats.rs:114-142 rendering)
    tcp_flags = [0x02, 0x10, 0x14, 0x04, 0x18, 0x12, 0x11, 0x29]
    for i in range(800):
        seg = g.tcp(20000 + (i % 500), 443 if i % 2 else 80, tcp_flags[i % len(tcp_flags)], seq=i)
        pkts.append(eth4(g.ipv4(f"172.20.{i % 16}.{1 + i % 250}", f"151.101.{i % 4}.{1 + i % 100}", 6, seg, ident=0, ttl=48 + i % 16)))

    # 5) ICMP: 100 echo + 70 dest-unreachable with lifted inner ports
    for i in range(100):
        pkts.append(eth4(g.ipv4(f"10.5.0.{1 + i % 250}", "10.5.1.1", 1, g.icmp_echo(8 if i % 2 else 0, seq=i), ident=0)))
    for i in range(50):  # quoting a UDP original
        orig = g.ipv4("10.6.0.1", f"10.6.1.{1 + i % 250}", 17, g.udp(7777, 53, bytes(8)), ident=0)
        pkts.append(eth4(g.ipv4(f"10.6.1.{1 + i % 250}", "10.6.0.1", 1, g.icmp_dest_unreach(orig), ident=0)))
    for i in range(15):  # quoting a TCP original
        orig = g.ipv4("10.7.0.1", f"10.7.1.{1 + i}", 6, g.tcp(8888, 443, 0x02), ident=0)
        pkts.append(eth4(g.ipv4(f"10.7.1.{1 + i}", "10.7.0.1", 1, g.icmp_dest_unreach(orig), ident=0)))
    for i in range(5):  # quoting an inner IPv6/UDP (reference from_ip_slice parity)
        v6src, v6dst = bytes([0x20, 0x01] + [0] * 13 + [i + 1]), bytes([0x20, 0x01] + [0] * 13 + [0xFE])
        orig6 = g.ipv6(v6src, v6dst, 17, g.udp(9999, 53, bytes(4)))
        pkts.append(eth4(g.ipv4(f"10.8.0.{i + 1}", "10.8.0.254", 1, g.icmp_dest_unreach(orig6), ident=0)))

    # 6) IPv6: 150 rows (100 UDP/DNS + 50 TCP)
    for i in range(100):
        v6src = bytes([0x20, 0x01, 0x0D, 0xB8] + [0] * 11 + [1 + i % 200])
        v6dst = bytes([0x20, 0x01, 0x0D, 0xB8] + [0] * 11 + [0xFF])
        dns = g.dns_query(f"v6-{i}.example.org", 28)
        pkts.append(eth6(g.ipv6(v6src, v6dst, 17, g.udp(42000 + i, 53, dns))))
    for i in range(50):
        v6src = bytes([0xFD, 0x00] + [0] * 13 + [1 + i])
        v6dst = bytes([0xFD, 0x00] + [0] * 13 + [0xFE])
        pkts.append(eth6(g.ipv6(v6src, v6dst, 6, g.tcp(52000 + i, 22, 0x18))))

    # 7) DHDiscover: 30 rows (udp srcport 37810)
    devices = ["IPC", "NVR", "DVR"]
    for i in range(30):
        udp = g.udp(37810, 37810, g.dhip_discover(devices[i % 3]))
        pkts.append(eth4(g.ipv4(f"192.168.254.{1 + i}", "255.255.255.255", 17, udp, ident=0)))

    # 8) non-IP ARP: 50 rows (defaults ip_proto=0/offset=0/id=0/mf=false)
    for i in range(50):
        arp = bytes([0, 1, 8, 0, 6, 4, 0, 1]) + g.mac(i) + bytes([10, 0, 0, i % 250]) + bytes(6) + bytes([10, 0, 0, 254])
        pkts.append(g.ethernet(g.mac(i), b"\xff" * 6, 0x0806, arp))

    # pad with TCP acks to exactly 2500 rows
    while len(pkts) < 2500:
        i = len(pkts)
        seg = g.tcp(30000 + i % 99, 8080, 0x10, seq=i)
        pkts.append(eth4(g.ipv4(f"10.99.{i % 8}.{1 + i % 250}", "10.99.255.1", 6, seg, ident=0)))
    assert len(pkts) == 2500, len(pkts)

    # unique frame_time per row: 1 ms stride (FIXTURES.md §1)
    return [(BASE_US + i * 1000, p) for i, p in enumerate(pkts)]


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    records = build_packets()
    g.write_pcap(PCAP_PATH, records)

    # Decode through the real source path (no Spark needed): index + chunk read.
    from pcap_converter_spark.sources.pcap import index_pcap, read_pcap_chunk

    chunks = index_pcap(PCAP_PATH)
    assert chunks, "index produced no chunks"
    import pandas as pd

    pdf = pd.concat([read_pcap_chunk(c) for c in chunks], ignore_index=True)
    n_errors = int(pdf["errors"].sum())
    pdf = pdf.drop(columns=["errors"])
    assert len(pdf) == 2500, len(pdf)
    assert n_errors == 0, f"fixture should decode cleanly, got {n_errors} errors"

    # Single-file parquet via pyarrow so Spark and DuckDB read the same file.
    # Explicit arrow schema: all-NULL string columns (col_info, http_*) must
    # not degrade to the null type, or readers see the wrong column type.
    from pcap_converter_spark.schema import PACKET_PANDAS_DTYPES

    _PA_BY_PANDAS = {
        "datetime64[us]": pa.timestamp("us"),
        "Int64": pa.int64(),
        "Int32": pa.int32(),
        "boolean": pa.bool_(),
        "object": pa.string(),
    }
    schema = pa.schema(
        [(name, _PA_BY_PANDAS[dt]) for name, dt in PACKET_PANDAS_DTYPES.items()]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, PARQUET_PATH, compression="snappy")
    print(f"wrote {PCAP_PATH} ({os.path.getsize(PCAP_PATH)} bytes)")
    print(f"wrote {PARQUET_PATH} ({os.path.getsize(PARQUET_PATH)} bytes), {len(pdf)} rows")


if __name__ == "__main__":
    main()
