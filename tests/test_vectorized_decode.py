"""Vectorized decoder parity: byte-for-byte equal to the scalar decoder
(the executable specification) over the full fixture and edge shapes."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from fixtures import pcapgen as g
from pcap_converter_spark.decode.parser import decode_packets_to_pandas
from pcap_converter_spark.decode.vectorized import decode_packets_vectorized

FIXTURE_PCAP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "data", "packets_fixture.pcap",
)

M1, M2 = g.mac(1), g.mac(2)


def _records_from_fixture():
    import struct

    with open(FIXTURE_PCAP, "rb") as f:
        f.read(24)
        out = []
        while True:
            head = f.read(16)
            if len(head) < 16:
                break
            sec, usec, caplen, origlen = struct.unpack("<IIII", head)
            data = f.read(caplen)
            out.append((sec * 1_000_000 + usec, origlen, caplen, data))
    return out


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        pd.testing.assert_series_equal(
            a[col], b[col], check_dtype=True, obj=f"column {col}"
        )


def test_fixture_parity():
    records = _records_from_fixture()
    assert len(records) == 2500
    scalar = decode_packets_to_pandas(records, 1, "packets_fixture.pcap")
    vec = decode_packets_vectorized(records, 1, "packets_fixture.pcap")
    assert_frames_equal(scalar, vec)


def _edge_packets():
    pkts = []
    # VLAN-tagged (fallback path)
    inner = g.ipv4("3.3.3.3", "4.4.4.4", 17, g.udp(7, 9, b""))
    pkts.append(
        g.ethernet(M1, M2, 0x8100, b"")[:12]
        + bytes([0x81, 0x00, 0x00, 0x05, 0x08, 0x00]) + inner
    )
    # truncated ethernet
    pkts.append(b"\x00" * 10)
    # truncated IP header
    pkts.append(g.ethernet(M1, M2, 0x0800, b"\x45\x00\x00"))
    # bad IP version nibble
    pkts.append(g.ethernet(M1, M2, 0x0800, bytes([0x95]) + bytes(30)))
    # bad IHL
    pkts.append(g.ethernet(M1, M2, 0x0800, bytes([0x4F]) + bytes(19)))
    # UDP too short
    pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4("1.1.1.1", "2.2.2.2", 17, b"\x00" * 4)))
    # TCP bad data-offset
    seg = bytearray(g.tcp(1, 2, 0x02))
    seg[12] = 0x10  # doff=4 words = 16 bytes < 20
    pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4("1.1.1.1", "2.2.2.2", 6, bytes(seg))))
    # ICMP dest-unreach quoting UDP (fallback lift)
    orig = g.ipv4("10.0.0.1", "10.0.0.2", 17, g.udp(1234, 53, b"abcd"))
    pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4("2.2.2.2", "1.1.1.1", 1, g.icmp_dest_unreach(orig))))
    # ICMP echo
    pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4("5.5.5.5", "6.6.6.6", 1, g.icmp_echo())))
    # ICMPv6-ish: v6 with next_header 58
    src, dst = bytes(15) + b"\x01", bytes(15) + b"\x02"
    pkts.append(g.ethernet(M1, M2, 0x86DD, g.ipv6(src, dst, 58, bytes(8))))
    # v6 hop-by-hop ext header then UDP (fallback walk)
    hbh = bytes([17, 0, 0, 0, 0, 0, 0, 0])
    pkts.append(g.ethernet(M1, M2, 0x86DD, g.ipv6(src, dst, 0, hbh + g.udp(5, 6, b""))))
    # v6 fragmenting fragment (no transport)
    frag = bytes([17, 0, 0x01, 0x01, 0, 0, 0, 0])
    pkts.append(g.ethernet(M1, M2, 0x86DD, g.ipv6(src, dst, 44, frag + bytes(16))))
    # non-IP (ARP)
    pkts.append(g.ethernet(M1, M2, 0x0806, bytes(28)))
    # IPv4 continuation fragment
    pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4("9.9.9.9", "8.8.8.8", 17, bytes(16), ident=5, frag_offset=3)))
    # empty payload after ethernet header
    pkts.append(g.ethernet(M1, M2, 0x0800, b""))
    return [(1_700_000_000_000_000 + i, len(p), len(p), p) for i, p in enumerate(pkts)]


def test_edge_shape_parity():
    records = _edge_packets()
    scalar = decode_packets_to_pandas(records, 1, "edge.pcap")
    vec = decode_packets_vectorized(records, 1, "edge.pcap")
    assert_frames_equal(scalar, vec)


def test_raw_linktype_parity():
    pkt = g.ipv4("1.2.3.4", "4.3.2.1", 17, g.udp(1, 2, b"xy"))
    records = [(1_000_000, len(pkt), len(pkt), pkt)]
    scalar = decode_packets_to_pandas(records, 101, "raw.pcap")
    vec = decode_packets_vectorized(records, 101, "raw.pcap")
    assert_frames_equal(scalar, vec)


def test_per_record_linktypes_parity():
    p1 = g.ethernet(M1, M2, 0x0800, g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(1, 9, b"")))
    p2 = g.ipv4("3.3.3.3", "4.4.4.4", 6, g.tcp(80, 81, 0x18))
    records = [(1, len(p1), len(p1), p1), (2, len(p2), len(p2), p2)]
    lts = [1, 101]
    scalar = decode_packets_to_pandas(records, 1, "mix.pcap", per_record_linktype=lts)
    vec = decode_packets_vectorized(records, 1, "mix.pcap", per_record_linktype=lts)
    assert_frames_equal(scalar, vec)


@pytest.mark.slow
def test_vectorized_is_faster():
    import time

    records = _records_from_fixture() * 40  # 100k packets
    t0 = time.perf_counter()
    decode_packets_to_pandas(records, 1, "x.pcap")
    scalar_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode_packets_vectorized(records, 1, "x.pcap")
    vec_s = time.perf_counter() - t0
    print(f"\nscalar {len(records)/scalar_s/1e3:.0f}k pkts/s, "
          f"vectorized {len(records)/vec_s/1e3:.0f}k pkts/s")
    assert vec_s < scalar_s
