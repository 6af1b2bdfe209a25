"""Generate the 2,500-row ``packets`` correctness fixture (FIXTURES.md §1).

Crafts a deterministic pcap exercising every extractor (E1-E17) and the
defrag operator (R2-R6), and writes:

- fixtures/data/packets_fixture.pcap   (binary, reused by source tests)
- fixtures/data/packets.parquet        (single file; Spark + DuckDB read it
                                        identically for PQ1-PQ7)

**The parquet is CONSTRUCTION-TIME ground truth, not decoder output**
(VERDICT r13 #4): every crafting step below co-emits the 31-column row the
reference semantics demand for the bytes it just built — qnames, ports,
lengths, flag renderings and the IPv4 frame_len←total_len rule are all
knowledge the generator already has. The engine decoder never touches what
goes into the parquet; instead ``main()`` decodes the pcap through the real
source path and ASSERTS cell-for-cell equality as a regeneration-time parity
proof (matching gen_warc_docs.py's ground-truth standard). Because PQ1-PQ7's
Spark side decodes the pcap live while their DuckDB oracle reads this
parquet, every driver run hash-gates the decoder end-to-end.

Row population per FIXTURES.md §1: fragmented DNS/NTP datagram groups (>1%
of rows, incl. one group with a missing first fragment), plain DNS (incl.
``<Root>``), NTP mode-7 + v4, TCP flag variety, ICMP echo + dest-unreach
(quoting UDP, TCP, and an inner IPv6/UDP), IPv6 rows, DHDiscover, and
non-IP ARP rows. frame_time is unique per row (1 ms stride).

Run:  python fixtures/gen_packets.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fixtures import pcapgen as g

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
PCAP_PATH = os.path.join(DATA_DIR, "packets_fixture.pcap")
PARQUET_PATH = os.path.join(DATA_DIR, "packets.parquet")

BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
PCAP_BASENAME = "packets_fixture.pcap"

# The reference's fixed-width "CEUAPRSF" rendering (packetstats.rs:114-142)
# for exactly the flag bytes this fixture crafts — spec-side literals, not a
# call into the engine's renderer.
TCP_FLAG_STR = {
    0x02: "......S.",
    0x10: "...A....",
    0x14: "...A.R..",
    0x04: ".....R..",
    0x18: "...AP...",
    0x12: "...A..S.",
    0x11: "...A...F",
    0x29: "..U.P..F",
}


def _dns_len(qname: str) -> int:
    """Wire length of a crafted one-question DNS message: 12-byte header +
    name encoding (+1 length byte per label, +1 terminating null — i.e.
    len(qname)+2 for a non-empty name, 1 for the root) + 4 (qtype, qclass)."""
    enc = 1 if qname in ("", ".") else len(qname.rstrip(".")) + 2
    return 12 + enc + 4


def spec_row(
    *,
    frame_len: int,
    eth_type: int | None = None,
    ip_src: str | None = None,
    ip_dst: str | None = None,
    ip_proto: int = 0,
    ip_ttl: int | None = None,
    ip_frag_offset: int = 0,
    ip_id: int = 0,
    ip_mf: bool = False,
    icmp_type: int | None = None,
    udp_length: int | None = None,
    udp_srcport: int | None = None,
    udp_dstport: int | None = None,
    tcp_flags: str | None = None,
    tcp_srcport: int | None = None,
    tcp_dstport: int | None = None,
    col_protocol: str | None = None,
    dns_qry_name: str | None = None,
    dns_qry_type: int | None = None,
    ntp_priv_reqcode: int | None = None,
    dhip_device: str | None = None,
) -> dict:
    """One expected 31-column row. Defaults mirror packetstats.rs:17-23
    (non-null ip_proto=0 / offset=0 / id=0 / mf=false even for non-IP rows);
    col_source/col_destination mirror the IP addresses; the http_* and
    col_info columns are never produced by this fixture's packet families
    and stay NULL."""
    return {
        "frame_len": frame_len,
        "eth_type": eth_type,
        "ip_src": ip_src,
        "ip_dst": ip_dst,
        "ip_proto": ip_proto,
        "ip_ttl": ip_ttl,
        "ip_frag_offset": ip_frag_offset,
        "ip_id": ip_id,
        "ip_mf": ip_mf,
        "icmp_type": icmp_type,
        "udp_length": udp_length,
        "udp_srcport": udp_srcport,
        "udp_dstport": udp_dstport,
        "tcp_flags": tcp_flags,
        "tcp_srcport": tcp_srcport,
        "tcp_dstport": tcp_dstport,
        "col_info": None,
        "col_source": ip_src,
        "col_destination": ip_dst,
        "col_protocol": col_protocol,
        "dns_qry_name": dns_qry_name,
        "dns_qry_type": dns_qry_type,
        "http_request_uri": None,
        "http_host": None,
        "http_request_method": None,
        "http_user_agent": None,
        "http_file_data": None,
        "ntp_priv_reqcode": ntp_priv_reqcode,
        "dhip_device": dhip_device,
        "pcap_file": PCAP_BASENAME,
    }


def build_packets() -> tuple[list[tuple[int, bytes]], list[dict]]:
    """Craft the 2,500 packets AND their expected rows, side by side."""
    pkts: list[bytes] = []
    rows: list[dict] = []
    m1, m2 = g.mac(1), g.mac(2)

    def eth4(payload: bytes) -> bytes:
        return g.ethernet(m1, m2, 0x0800, payload)

    def eth6(payload: bytes) -> bytes:
        return g.ethernet(m1, m2, 0x86DD, payload)

    def add(pkt: bytes, row: dict) -> None:
        pkts.append(pkt)
        rows.append(row)

    def v4(**kw) -> dict:
        kw.setdefault("eth_type", 0x0800)
        kw.setdefault("ip_ttl", 64)
        return spec_row(**kw)

    # 1) fragmented DNS-over-UDP: 30 groups x 3 fragments.
    #    frame_len on IPv4 rows is the IP total_length (packetstats.rs:197),
    #    NOT the wire length; continuation fragments stop after the IP layer
    #    so their transport/app columns stay NULL for the defrag join to fill.
    qtypes = [1, 28, 255]
    for grp in range(30):
        src, dst = f"10.0.{grp}.1", f"10.1.{grp}.1"
        ident = 1000 + grp
        qname = f"frag{grp}.example.com"
        qtype = qtypes[grp % 3]
        dlen = _dns_len(qname)
        dns = g.dns_query(qname, qtype)
        assert len(dns) == dlen
        ulen = 8 + dlen + 64  # crafted UDP length field spans the fragments
        first = g.udp(33000 + grp, 53, dns, length=ulen)
        add(
            eth4(g.ipv4(src, dst, 17, first, ident=ident, mf=True)),
            v4(frame_len=20 + 8 + dlen, ip_src=src, ip_dst=dst, ip_proto=17,
               ip_id=ident, ip_mf=True, col_protocol="DNS",
               udp_srcport=33000 + grp, udp_dstport=53, udp_length=ulen,
               dns_qry_name=qname, dns_qry_type=qtype),
        )
        off2 = len(first) // 8
        add(
            eth4(g.ipv4(src, dst, 17, bytes(64), ident=ident,
                        frag_offset=off2, mf=True)),
            v4(frame_len=20 + 64, ip_src=src, ip_dst=dst, ip_proto=17,
               ip_id=ident, ip_mf=True, ip_frag_offset=off2,
               col_protocol="IPv4"),
        )
        off3 = (len(first) + 64) // 8
        add(
            eth4(g.ipv4(src, dst, 17, bytes(32), ident=ident,
                        frag_offset=off3)),
            v4(frame_len=20 + 32, ip_src=src, ip_dst=dst, ip_proto=17,
               ip_id=ident, ip_frag_offset=off3, col_protocol="IPv4"),
        )

    # one group whose FIRST fragment is missing: coalesce keeps NULLs
    add(
        eth4(g.ipv4("10.9.9.1", "10.9.9.2", 17, bytes(64), ident=4242,
                    frag_offset=8, mf=True)),
        v4(frame_len=84, ip_src="10.9.9.1", ip_dst="10.9.9.2", ip_proto=17,
           ip_id=4242, ip_mf=True, ip_frag_offset=8, col_protocol="IPv4"),
    )
    add(
        eth4(g.ipv4("10.9.9.1", "10.9.9.2", 17, bytes(32), ident=4242,
                    frag_offset=16)),
        v4(frame_len=52, ip_src="10.9.9.1", ip_dst="10.9.9.2", ip_proto=17,
           ip_id=4242, ip_frag_offset=16, col_protocol="IPv4"),
    )

    # one fragmented NTP mode-7 group (ntp_priv_reqcode propagation):
    # the 8-byte v2 payload fails the >=48-byte v3/v4 parse, so byte 3 is
    # the private-mode request code (packetstats.rs:305-308)
    ntp_payload = g.udp(123, 123, g.ntp_v2_mode7(42), length=8 + 8 + 64)
    add(
        eth4(g.ipv4("10.2.0.1", "10.2.0.2", 17, ntp_payload, ident=5000,
                    mf=True)),
        v4(frame_len=20 + 16, ip_src="10.2.0.1", ip_dst="10.2.0.2",
           ip_proto=17, ip_id=5000, ip_mf=True, col_protocol="NTP",
           udp_srcport=123, udp_dstport=123, udp_length=8 + 8 + 64,
           ntp_priv_reqcode=42),
    )
    add(
        eth4(g.ipv4("10.2.0.1", "10.2.0.2", 17, bytes(64), ident=5000,
                    frag_offset=(8 + 8) // 8)),
        v4(frame_len=84, ip_src="10.2.0.1", ip_dst="10.2.0.2", ip_proto=17,
           ip_id=5000, ip_frag_offset=2, col_protocol="IPv4"),
    )

    # 2) plain DNS: 600 rows (queries + responses, varied qnames/qtypes);
    #    the empty qname renders as the literal "<Root>" (packetstats.rs:274)
    names = ["example.com", "a.root-servers.net", "",
             "xn--nxasmq6b.example", "deep.sub.domain.test"]
    for i in range(600):
        qname = names[i % len(names)]
        qtype = qtypes[i % 3]
        resp = i % 4 == 0
        dlen = _dns_len(qname)
        dns = g.dns_query(qname, qtype, txid=i & 0xFFFF, response=resp)
        assert len(dns) == dlen
        sport = 53 if resp else 40000 + (i % 1000)
        dport = 40000 + (i % 1000) if resp else 53
        udp = g.udp(sport, dport, dns)
        src = f"172.16.{i % 8}.{1 + i % 250}"
        add(
            eth4(g.ipv4(src, "8.8.8.8", 17, udp, ident=0, ttl=60 + i % 4)),
            v4(frame_len=20 + 8 + dlen, ip_src=src, ip_dst="8.8.8.8",
               ip_proto=17, ip_ttl=60 + i % 4, col_protocol="DNS",
               udp_srcport=sport, udp_dstport=dport, udp_length=8 + dlen,
               dns_qry_name=qname if qname else "<Root>",
               dns_qry_type=qtype),
        )

    # 3) NTP: 120 mode-7 (8-byte v2 → reqcode) + 80 normal v4 (48-byte,
    #    parses cleanly and contributes nothing — packetstats.rs:296-300)
    for i in range(120):
        req = 20 + (i % 3) * 11
        udp = g.udp(50000 + i, 123, g.ntp_v2_mode7(req))
        src = f"192.168.1.{1 + i % 200}"
        add(
            eth4(g.ipv4(src, "10.0.0.123", 17, udp, ident=0)),
            v4(frame_len=20 + 8 + 8, ip_src=src, ip_dst="10.0.0.123",
               ip_proto=17, col_protocol="NTP", udp_srcport=50000 + i,
               udp_dstport=123, udp_length=16, ntp_priv_reqcode=req),
        )
    for i in range(80):
        udp = g.udp(123, 51000 + i, g.ntp_v4())
        dst = f"192.168.2.{1 + i % 200}"
        add(
            eth4(g.ipv4("10.0.0.123", dst, 17, udp, ident=0)),
            v4(frame_len=20 + 8 + 48, ip_src="10.0.0.123", ip_dst=dst,
               ip_proto=17, col_protocol="NTP", udp_srcport=123,
               udp_dstport=51000 + i, udp_length=56),
        )

    # 4) TCP: 800 rows, flag variety (packetstats.rs:114-142 rendering)
    tcp_flags = [0x02, 0x10, 0x14, 0x04, 0x18, 0x12, 0x11, 0x29]
    for i in range(800):
        bits = tcp_flags[i % len(tcp_flags)]
        sport = 20000 + (i % 500)
        dport = 443 if i % 2 else 80
        seg = g.tcp(sport, dport, bits, seq=i)
        src = f"172.20.{i % 16}.{1 + i % 250}"
        dst = f"151.101.{i % 4}.{1 + i % 100}"
        add(
            eth4(g.ipv4(src, dst, 6, seg, ident=0, ttl=48 + i % 16)),
            v4(frame_len=20 + 20, ip_src=src, ip_dst=dst, ip_proto=6,
               ip_ttl=48 + i % 16, col_protocol="TCP",
               tcp_srcport=sport, tcp_dstport=dport,
               tcp_flags=TCP_FLAG_STR[bits]),
        )

    # 5) ICMP: 100 echo + 70 dest-unreachable with lifted inner ports
    #    (type 3 quotes the original packet; its transport ports land on
    #    THIS row — packetstats.rs:351-385; udp_length is NOT lifted)
    for i in range(100):
        t = 8 if i % 2 else 0
        src = f"10.5.0.{1 + i % 250}"
        add(
            eth4(g.ipv4(src, "10.5.1.1", 1, g.icmp_echo(t, seq=i), ident=0)),
            v4(frame_len=20 + 8, ip_src=src, ip_dst="10.5.1.1", ip_proto=1,
               col_protocol="ICMP", icmp_type=t),
        )
    for i in range(50):  # quoting a UDP original
        victim = f"10.6.1.{1 + i % 250}"
        orig = g.ipv4("10.6.0.1", victim, 17, g.udp(7777, 53, bytes(8)),
                      ident=0)
        add(
            eth4(g.ipv4(victim, "10.6.0.1", 1, g.icmp_dest_unreach(orig),
                        ident=0)),
            v4(frame_len=20 + 8 + len(orig), ip_src=victim,
               ip_dst="10.6.0.1", ip_proto=1, col_protocol="ICMP",
               icmp_type=3, udp_srcport=7777, udp_dstport=53),
        )
    for i in range(15):  # quoting a TCP original
        victim = f"10.7.1.{1 + i}"
        orig = g.ipv4("10.7.0.1", victim, 6, g.tcp(8888, 443, 0x02), ident=0)
        add(
            eth4(g.ipv4(victim, "10.7.0.1", 1, g.icmp_dest_unreach(orig),
                        ident=0)),
            v4(frame_len=20 + 8 + len(orig), ip_src=victim,
               ip_dst="10.7.0.1", ip_proto=1, col_protocol="ICMP",
               icmp_type=3, tcp_srcport=8888, tcp_dstport=443,
               tcp_flags=TCP_FLAG_STR[0x02]),
        )
    for i in range(5):  # quoting an inner IPv6/UDP (from_ip_slice parity)
        v6src = bytes([0x20, 0x01] + [0] * 13 + [i + 1])
        v6dst = bytes([0x20, 0x01] + [0] * 13 + [0xFE])
        orig6 = g.ipv6(v6src, v6dst, 17, g.udp(9999, 53, bytes(4)))
        src = f"10.8.0.{i + 1}"
        add(
            eth4(g.ipv4(src, "10.8.0.254", 1, g.icmp_dest_unreach(orig6),
                        ident=0)),
            v4(frame_len=20 + 8 + len(orig6), ip_src=src,
               ip_dst="10.8.0.254", ip_proto=1, col_protocol="ICMP",
               icmp_type=3, udp_srcport=9999, udp_dstport=53),
        )

    # 6) IPv6: 150 rows (100 UDP/DNS + 50 TCP). frame_len is the fixed
    #    header's 40 bytes + payload_length; addresses render RFC-5952
    #    compressed; ip_ttl carries the hop limit; ip_proto the fixed
    #    header's next_header (E5)
    for i in range(100):
        v6src = bytes([0x20, 0x01, 0x0D, 0xB8] + [0] * 11 + [1 + i % 200])
        v6dst = bytes([0x20, 0x01, 0x0D, 0xB8] + [0] * 11 + [0xFF])
        qname = f"v6-{i}.example.org"
        dlen = _dns_len(qname)
        dns = g.dns_query(qname, 28)
        assert len(dns) == dlen
        add(
            eth6(g.ipv6(v6src, v6dst, 17, g.udp(42000 + i, 53, dns))),
            spec_row(frame_len=40 + 8 + dlen, eth_type=0x86DD,
                     ip_src=f"2001:db8::{1 + i % 200:x}",
                     ip_dst="2001:db8::ff", ip_proto=17, ip_ttl=64,
                     col_protocol="DNS", udp_srcport=42000 + i,
                     udp_dstport=53, udp_length=8 + dlen,
                     dns_qry_name=qname, dns_qry_type=28),
        )
    for i in range(50):
        v6src = bytes([0xFD, 0x00] + [0] * 13 + [1 + i])
        v6dst = bytes([0xFD, 0x00] + [0] * 13 + [0xFE])
        add(
            eth6(g.ipv6(v6src, v6dst, 6, g.tcp(52000 + i, 22, 0x18))),
            spec_row(frame_len=40 + 20, eth_type=0x86DD,
                     ip_src=f"fd00::{1 + i:x}", ip_dst="fd00::fe",
                     ip_proto=6, ip_ttl=64, col_protocol="TCP",
                     tcp_srcport=52000 + i, tcp_dstport=22,
                     tcp_flags=TCP_FLAG_STR[0x18]),
        )

    # 7) DHDiscover: 30 rows (udp srcport 37810). The extracted DeviceType
    #    is JSON-encoded — quotes included (serde_json Value::to_string,
    #    packetstats.rs:316-338)
    devices = ["IPC", "NVR", "DVR"]
    for i in range(30):
        dt = devices[i % 3]
        body = g.dhip_discover(dt)
        udp = g.udp(37810, 37810, body)
        src = f"192.168.254.{1 + i}"
        add(
            eth4(g.ipv4(src, "255.255.255.255", 17, udp, ident=0)),
            v4(frame_len=20 + 8 + len(body), ip_src=src,
               ip_dst="255.255.255.255", ip_proto=17,
               col_protocol="DHDiscover", udp_srcport=37810,
               udp_dstport=37810, udp_length=8 + len(body),
               dhip_device=json.dumps(dt)),
        )

    # 8) non-IP ARP: 50 rows — L2 fields only; the non-null defaults
    #    (ip_proto=0 / offset=0 / id=0 / mf=false) and NULL everything else;
    #    frame_len stays the wire length (no IP total_length to adopt)
    for i in range(50):
        arp = (bytes([0, 1, 8, 0, 6, 4, 0, 1]) + g.mac(i)
               + bytes([10, 0, 0, i % 250]) + bytes(6)
               + bytes([10, 0, 0, 254]))
        pkt = g.ethernet(g.mac(i), b"\xff" * 6, 0x0806, arp)
        add(pkt, spec_row(frame_len=len(pkt), eth_type=0x0806))

    # pad with TCP acks to exactly 2500 rows
    while len(pkts) < 2500:
        i = len(pkts)
        sport = 30000 + i % 99
        seg = g.tcp(sport, 8080, 0x10, seq=i)
        src = f"10.99.{i % 8}.{1 + i % 250}"
        add(
            eth4(g.ipv4(src, "10.99.255.1", 6, seg, ident=0)),
            v4(frame_len=40, ip_src=src, ip_dst="10.99.255.1", ip_proto=6,
               col_protocol="TCP", tcp_srcport=sport, tcp_dstport=8080,
               tcp_flags=TCP_FLAG_STR[0x10]),
        )
    assert len(pkts) == 2500, len(pkts)
    assert len(rows) == 2500, len(rows)

    # unique frame_time per row: 1 ms stride (FIXTURES.md §1)
    records = [(BASE_US + i * 1000, p) for i, p in enumerate(pkts)]
    for i, r in enumerate(rows):
        r["frame_time"] = BASE_US + i * 1000
    return records, rows


def spec_frame(rows: list[dict]) -> pd.DataFrame:
    """The expected rows as a pandas frame with the engine's normative
    column order and dtypes (schema is the shared contract — using it
    here fixes types, not values)."""
    import numpy as np

    from pcap_converter_spark.schema import (
        PACKET_COLUMNS,
        PACKET_PANDAS_DTYPES,
    )

    out = {}
    for name in PACKET_COLUMNS:
        vals = [r[name] for r in rows]
        if name == "frame_time":
            out[name] = pd.Series(
                np.asarray(vals, dtype="int64").view("datetime64[us]")
            )
        else:
            out[name] = pd.Series(vals, dtype=PACKET_PANDAS_DTYPES[name])
    return pd.DataFrame(out)


def decode_frame() -> pd.DataFrame:
    """The fixture pcap decoded through the REAL source path (no Spark
    needed): the parity side of the regeneration-time proof."""
    from pcap_converter_spark.sources.pcap import index_pcap, read_pcap_chunk

    chunks = index_pcap(PCAP_PATH)
    assert chunks, "index produced no chunks"
    pdf = pd.concat([read_pcap_chunk(c) for c in chunks], ignore_index=True)
    n_errors = int(pdf["errors"].sum())
    assert n_errors == 0, f"fixture should decode cleanly, got {n_errors}"
    return pdf.drop(columns=["errors"])


def assert_parity(spec: pd.DataFrame, decoded: pd.DataFrame) -> None:
    """Cell-for-cell equality between the construction-time expectation and
    the engine decode — any divergence is a bug on ONE of the two sides and
    must be adjudicated, not papered over."""
    assert list(spec.columns) == list(decoded.columns)
    assert len(spec) == len(decoded)
    for col in spec.columns:
        a, b = spec[col], decoded[col]
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = int(neq.idxmax())
            raise AssertionError(
                f"spec/decoder divergence in '{col}' at row {i}: "
                f"spec={a[i]!r} decoded={b[i]!r} "
                f"({int(neq.sum())} rows differ)"
            )


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    records, rows = build_packets()
    g.write_pcap(PCAP_PATH, records)

    spec = spec_frame(rows)
    assert_parity(spec, decode_frame())

    # Single-file parquet of the SPEC rows via pyarrow so Spark and DuckDB
    # read the same file. Explicit arrow schema: all-NULL string columns
    # (col_info, http_*) must not degrade to the null type.
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
    table = pa.Table.from_pandas(spec, schema=schema, preserve_index=False)
    pq.write_table(table, PARQUET_PATH, compression="snappy")
    print(f"wrote {PCAP_PATH} ({os.path.getsize(PCAP_PATH)} bytes)")
    print(f"wrote {PARQUET_PATH} ({os.path.getsize(PARQUET_PATH)} bytes), "
          f"{len(spec)} rows (construction-time ground truth, "
          "decoder-parity verified)")


if __name__ == "__main__":
    main()
