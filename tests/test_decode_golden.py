"""Golden decode tests for the extraction layer (E1-E17, SURVEY.md §2.2).

Each test crafts packets with fixtures/pcapgen and decodes them through the
real batch decoder (decode_packets_to_pandas) — no Spark needed — then
asserts the exact 31-column values the reference would emit
(/root/reference/src/packetstats.rs:145-392 semantics).
"""

from __future__ import annotations

import pandas as pd
import pytest

from fixtures import pcapgen as g
from pcap_converter_spark.decode import parser as P
from pcap_converter_spark.decode.parser import (
    decode_packets_to_pandas,
    parse_dns_first_question,
    parse_ntp,
    tcp_flags_string,
)

M1, M2 = g.mac(1), g.mac(2)


def decode_one(pkt: bytes, linktype: int = 1):
    pdf = decode_packets_to_pandas(
        [(1_700_000_000_000_000, len(pkt), len(pkt), pkt)], linktype, "t.pcap"
    )
    assert len(pdf) == 1
    return pdf.iloc[0]


def eth4(payload: bytes) -> bytes:
    return g.ethernet(M1, M2, 0x0800, payload)


# ---------------------------------------------------------------- E1/E2/E14
def test_ipv4_udp_basic_fields():
    row = decode_one(eth4(g.ipv4("10.0.0.1", "10.0.0.2", 17, g.udp(1111, 2222, b"x" * 4))))
    assert row["eth_type"] == 0x0800
    assert row["ip_src"] == "10.0.0.1" and row["ip_dst"] == "10.0.0.2"
    assert row["col_source"] == "10.0.0.1" and row["col_destination"] == "10.0.0.2"
    assert row["ip_proto"] == 17 and row["udp_srcport"] == 1111
    assert row["udp_dstport"] == 2222 and row["udp_length"] == 12
    assert row["col_protocol"] == "UDP"
    # E2: frame_len overwritten with ip.total_len (packetstats.rs:197)
    assert row["frame_len"] == 20 + 12
    assert row["errors"] == 0


def test_non_ip_defaults_not_null():
    """Non-IP rows keep unboxed defaults 0/false, never NULL (schema §1.2)."""
    arp = g.ethernet(M1, b"\xff" * 6, 0x0806, bytes(28))
    row = decode_one(arp)
    assert row["eth_type"] == 0x0806
    assert row["ip_proto"] == 0 and row["ip_frag_offset"] == 0
    assert row["ip_id"] == 0 and not row["ip_mf"]
    assert pd.isna(row["ip_src"]) and pd.isna(row["col_protocol"])


# ------------------------------------------------------------------- E3/E4
def test_fragment_gate_and_first_fragment_transport():
    first = eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(53, 53, b"abcd"), ident=7, mf=True))
    cont = eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, bytes(16), ident=7, frag_offset=2))
    r1, r2 = decode_one(first), decode_one(cont)
    # first fragment (offset=0, mf=1): transport IS parsed (E4)
    assert r1["ip_mf"] and r1["ip_frag_offset"] == 0 and r1["udp_srcport"] == 53
    # continuation: gate stops decode — L3 only (E3)
    assert r2["ip_frag_offset"] == 2 and pd.isna(r2["udp_srcport"])
    assert r2["col_protocol"] == "IPv4"


# ---------------------------------------------------------------------- E5
def test_ipv6_fields():
    src = bytes([0x20, 0x01] + [0] * 13 + [1])
    dst = bytes([0x20, 0x01] + [0] * 13 + [2])
    row = decode_one(g.ethernet(M1, M2, 0x86DD, g.ipv6(src, dst, 17, g.udp(5, 6, b""), hop_limit=33)))
    assert row["eth_type"] == 0x86DD
    assert row["ip_src"] == "2001::1" and row["ip_dst"] == "2001::2"
    assert row["ip_ttl"] == 33 and row["ip_proto"] == 17
    assert row["udp_srcport"] == 5 and row["col_protocol"] == "UDP"
    # frame_len = payload_length + 40 (packetstats.rs:246)
    assert row["frame_len"] == 40 + 8


def test_ipv6_fragment_yields_no_transport():
    """A fragmenting v6 fragment header ends decode — continuation bytes are
    mid-datagram payload, not a transport header (etherparse parity)."""
    src, dst = bytes(15) + b"\x01", bytes(15) + b"\x02"
    frag_hdr = bytes([17, 0, 0x01, 0x01, 0, 0, 0, 0])  # offset>0, MF set
    row = decode_one(g.ethernet(M1, M2, 0x86DD, g.ipv6(src, dst, 44, frag_hdr + bytes(16))))
    assert row["ip_proto"] == 44
    assert pd.isna(row["udp_srcport"]) and pd.isna(row["tcp_srcport"])


# ------------------------------------------------------------------- E6/E7
def test_dns_first_question_and_root():
    row = decode_one(eth4(g.ipv4("9.9.9.9", "8.8.8.8", 17, g.udp(4242, 53, g.dns_query("example.com", 28)))))
    assert row["col_protocol"] == "DNS"
    assert row["dns_qry_name"] == "example.com" and row["dns_qry_type"] == 28
    root = decode_one(eth4(g.ipv4("9.9.9.9", "8.8.8.8", 17, g.udp(4242, 53, g.dns_query("", 255)))))
    assert root["dns_qry_name"] == "<Root>"  # packetstats.rs:283 literal


def test_dns_unit_parser():
    name, qtype, errs = parse_dns_first_question(memoryview(g.dns_query("a.b.c", 1)))
    assert (name, qtype, errs) == ("a.b.c", 1, 0)
    assert parse_dns_first_question(memoryview(b"\x00\x01"))[2] == 1  # truncated


# ---------------------------------------------------------------------- E8
def test_ntp_v2_mode7_fallback():
    row = decode_one(eth4(g.ipv4("1.2.3.4", "5.6.7.8", 17, g.udp(9999, 123, g.ntp_v2_mode7(42)))))
    assert row["col_protocol"] == "NTP" and row["ntp_priv_reqcode"] == 42
    normal = decode_one(eth4(g.ipv4("1.2.3.4", "5.6.7.8", 17, g.udp(123, 999, g.ntp_v4()))))
    assert normal["col_protocol"] == "NTP" and pd.isna(normal["ntp_priv_reqcode"])


def test_ntp_unit_vectors():
    # version bits (b0>>3)&7 == 2 → reqcode from byte 3 (packetstats.rs:306-308)
    assert parse_ntp(memoryview(bytes([0x17, 0, 0, 99]) + bytes(4))) == (99, 0)
    # v4 normal packet: no reqcode
    assert parse_ntp(memoryview(g.ntp_v4())) == (None, 0)
    # empty payload: reference panics, we count an error
    assert parse_ntp(memoryview(b""))[1] == 1


# ---------------------------------------------------------------------- E9
def test_dhdiscover_json_device():
    row = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(37810, 1, g.dhip_discover("NVR")))))
    assert row["col_protocol"] == "DHDiscover"
    assert row["dhip_device"] == '"NVR"'  # JSON-quoted, reference parity


def test_dhdiscover_bad_json_is_error_not_panic():
    payload = b"    DHIP" + bytes(24) + b"{not json"
    row = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(37810, 1, payload))))
    assert pd.isna(row["dhip_device"]) and row["errors"] == 1


# --------------------------------------------------------------------- E10
def test_tcp_flags_rendering():
    row = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 6, g.tcp(1, 2, 0x02))))
    assert row["col_protocol"] == "TCP" and row["tcp_flags"] == "......S."
    assert row["tcp_srcport"] == 1 and row["tcp_dstport"] == 2


def test_tcp_flags_string_vectors():
    # "CEUAPRSF" template, '.' for unset (packetstats.rs:114-142)
    assert tcp_flags_string(0x02) == "......S."
    assert tcp_flags_string(0x12) == "...A..S."
    assert tcp_flags_string(0xFF) == "CEUAPRSF"
    assert tcp_flags_string(0x00) == "........"
    assert tcp_flags_string(0x29) == "..U.P..F"


# --------------------------------------------------------------- E11/E12
def test_icmp_dest_unreach_lifts_inner_udp_ports():
    orig = g.ipv4("10.0.0.1", "10.0.0.2", 17, g.udp(1234, 53, b"abcd"))
    row = decode_one(eth4(g.ipv4("10.0.0.2", "10.0.0.1", 1, g.icmp_dest_unreach(orig))))
    assert row["col_protocol"] == "ICMP" and row["icmp_type"] == 3
    assert row["udp_srcport"] == 1234 and row["udp_dstport"] == 53


def test_icmp_dest_unreach_lifts_inner_ipv6():
    src, dst = bytes(15) + b"\x01", bytes(15) + b"\x02"
    orig6 = g.ipv6(src, dst, 17, g.udp(9999, 53, b""))
    row = decode_one(eth4(g.ipv4("10.0.0.2", "10.0.0.1", 1, g.icmp_dest_unreach(orig6))))
    assert row["udp_srcport"] == 9999 and row["udp_dstport"] == 53


def test_icmp_echo_no_lift():
    row = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 1, g.icmp_echo())))
    assert row["icmp_type"] == 8 and pd.isna(row["udp_srcport"])


# --------------------------------------------------------------- E13/E16
def test_protocol_cascade_last_writer_wins():
    dns = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(1, 53, g.dns_query("x.y", 1)))))
    assert dns["col_protocol"] == "DNS"  # IPv4 → UDP → DNS
    plain = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(1, 9, b""))))
    assert plain["col_protocol"] == "UDP"


def test_pcap_file_constant():
    row = decode_one(eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(1, 2, b""))))
    assert row["pcap_file"] == "t.pcap"


# ----------------------------------------------------------------- E17/S3
def test_truncated_packet_counts_error():
    pkt = eth4(g.ipv4("1.1.1.1", "2.2.2.2", 17, g.udp(1, 2, b"")))[:20]  # cut mid-IP
    row = decode_one(pkt)
    assert row["errors"] >= 1


def test_vlan_walk():
    inner = g.ipv4("3.3.3.3", "4.4.4.4", 17, g.udp(7, 8, b""))
    vlan = g.ethernet(M1, M2, 0x8100, bytes(0))[:12] + bytes([0x81, 0x00, 0x00, 0x05, 0x08, 0x00]) + inner
    row = decode_one(vlan)
    # eth_type stays the OUTER ethertype (VLAN tag), inner IP still decoded
    assert row["eth_type"] == 0x8100 and row["ip_src"] == "3.3.3.3"


def test_v6_walk_unit():
    # hop-by-hop (0) then UDP: walk lands on proto 17 at offset 48
    pkt = bytearray(60)
    assert P._v6_walk(memoryview(bytes([17] + [0] * 7) + bytes(8)), 0, 0) == (17, 8)
    # fragmenting fragment: None
    frag = bytes([17, 0, 0x00, 0x09, 0, 0, 0, 0])  # offset=1
    assert P._v6_walk(memoryview(frag + bytes(8)), 0, 44) is None
