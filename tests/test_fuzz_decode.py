"""Property/fuzz tests (hypothesis): the decoder must never raise on
arbitrary bytes, must count errors instead, and the vectorized path must
agree with the scalar spec on whatever bytes come its way."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from fixtures import pcapgen as g
from pcap_converter_spark.decode.parser import (
    decode_packets_to_pandas,
    parse_dns_first_question,
    parse_ntp,
    tcp_flags_string,
)
from pcap_converter_spark.decode.vectorized import decode_packets_vectorized

M1, M2 = g.mac(1), g.mac(2)

# structured-ish packets: valid ethernet+IP prefixes over random tails
_tail = st.binary(min_size=0, max_size=120)
_ip = st.tuples(st.integers(1, 254), st.integers(0, 255)).map(
    lambda t: f"10.{t[0]}.{t[1]}.7"
)
_proto = st.sampled_from([1, 6, 17, 58, 47, 0])


@st.composite
def structured_packet(draw):
    kind = draw(st.integers(0, 4))
    tail = draw(_tail)
    if kind == 0:  # raw garbage
        return tail
    if kind == 1:  # ethernet + garbage
        return g.ethernet(M1, M2, draw(st.sampled_from([0x0800, 0x86DD, 0x0806, 0x8100])), tail)
    if kind == 2:  # valid IPv4 header + random proto/payload
        return g.ethernet(M1, M2, 0x0800, g.ipv4(
            draw(_ip), draw(_ip), draw(_proto), tail,
            ident=draw(st.integers(0, 0xFFFF)),
            frag_offset=draw(st.sampled_from([0, 0, 0, 5])),
            mf=draw(st.booleans()),
        ))
    if kind == 3:  # UDP to interesting ports (app-layer parsers on random bytes)
        port = draw(st.sampled_from([53, 123, 37810, 9, 443]))
        return g.ethernet(M1, M2, 0x0800, g.ipv4(
            draw(_ip), draw(_ip), 17,
            g.udp(draw(st.integers(1, 65535)), port, tail)))
    # IPv6 with random next header
    src = bytes(15) + bytes([draw(st.integers(1, 255))])
    return g.ethernet(M1, M2, 0x86DD, g.ipv6(src, src, draw(_proto), tail))


@settings(max_examples=200, deadline=None)
@given(st.lists(structured_packet(), min_size=1, max_size=12))
def test_decoders_never_raise_and_agree(pkts):
    records = [(1_700_000_000_000_000 + i, len(p), len(p), p) for i, p in enumerate(pkts)]
    scalar = decode_packets_to_pandas(records, 1, "f.pcap")
    vec = decode_packets_vectorized(records, 1, "f.pcap")
    assert len(scalar) == len(vec) == len(pkts)
    for col in scalar.columns:
        pd.testing.assert_series_equal(scalar[col], vec[col], obj=f"column {col}")


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_app_parsers_total(payload):
    """DNS/NTP parsers are total functions: any bytes → (value, errors),
    never an exception (the reference panics on several of these paths)."""
    mv = memoryview(payload)
    name, qtype, e1 = parse_dns_first_question(mv)
    assert e1 in (0, 1)
    reqcode, e2 = parse_ntp(mv)
    assert e2 in (0, 1)


@settings(max_examples=64, deadline=None)
@given(st.integers(0, 255))
def test_tcp_flags_string_properties(bits):
    s = tcp_flags_string(bits)
    assert len(s) == 8
    # independent bit-order spec: CEUAPRSF ↔ bit 7..0
    for pos, (mask, ch) in enumerate(
        [(0x80, "C"), (0x40, "E"), (0x20, "U"), (0x10, "A"),
         (0x08, "P"), (0x04, "R"), (0x02, "S"), (0x01, "F")]
    ):
        assert s[pos] == (ch if bits & mask else ".")
