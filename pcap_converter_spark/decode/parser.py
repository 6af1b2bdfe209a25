"""Per-packet extraction layer (SURVEY.md §2.2, E1-E17).

Pure Python, batch-oriented: ``decode_packets_to_pandas`` turns a list of
(frame_time_us, frame_len, caplen, data) records into one pandas DataFrame
with the 31 normative columns plus an ``errors`` int column. It is invoked
from ``mapInPandas`` over chunk descriptors (sources/pcap.py), so each Spark
task decodes a whole multi-megabyte chunk per Python call — the Arrow batch
boundary, not the packet, is the unit of Python overhead.

Semantics mirror the reference decoder (/root/reference/src/packetstats.rs):

- IPv4 rows overwrite frame_len with the IP total_length (packetstats.rs:197).
- Continuation fragments (frag_offset > 0) stop after the IP layer
  (packetstats.rs:214) — that is what creates the NULLs the defrag join fills.
- First fragments (mf=1, offset=0) still get a transport parse
  (packetstats.rs:222-238).
- col_protocol is a last-writer-wins cascade:
  IPv4/IPv6 → UDP/TCP/ICMP → DNS/NTP/DHDiscover (E13).
- TCP flags render as the fixed 8-char "CEUAPRSF" template with '.' for
  unset bits (packetstats.rs:114-142).
- DNS: first question only; the root name encodes as the literal "<Root>"
  (packetstats.rs:274-278).
- NTP: a well-formed v3/v4 packet is parsed and discarded; on parse failure a
  version-2 packet yields ntp_priv_reqcode = payload[3] (mode-7 private
  MON_GETLIST detection, packetstats.rs:296-315).
- DHDiscover (UDP srcport 37810): non-printable bytes → space, require the
  "    DHIP" prefix, JSON-parse payload[32:], extract
  params.deviceInfo.DeviceType as a JSON-encoded value (quotes included,
  packetstats.rs:316-338). Where the reference panics on malformed UTF-8 /
  JSON we degrade to NULL + error count (documented divergence).
- ICMPv4 destination-unreachable lifts the quoted original packet's UDP/TCP
  ports (+ tcp_flags) into this row (packetstats.rs:351-385).
- Non-IP rows keep the non-null defaults ip_proto=0, ip_frag_offset=0,
  ip_id=0, ip_mf=false (packetstats.rs:17-23).
"""

from __future__ import annotations

import json
from ipaddress import IPv6Address
from struct import Struct

import numpy as np
import pandas as pd

from pcap_converter_spark.schema import PACKET_COLUMNS, PACKET_PANDAS_DTYPES

# ---------------------------------------------------------------- constants

LINKTYPE_ETHERNET = 1
LINKTYPE_RAW = 101  # raw IP, no link layer
LINKTYPE_NULL = 0  # BSD loopback: 4-byte family header

ETH_IPV4 = 0x0800
ETH_IPV6 = 0x86DD
VLAN_TAGS = (0x8100, 0x88A8, 0x9100)

PROTO_ICMP = 1
PROTO_TCP = 6
PROTO_UDP = 17
PROTO_ICMPV6 = 58

ICMP_DEST_UNREACH = 3

# IPv6 extension headers we walk to find the transport (etherparse does the
# same walk internally; ip_proto stays the *fixed header's* next_header).
_V6_EXT = frozenset((0, 43, 60, 44, 51, 135, 139, 140))


def _v6_walk(pkt: memoryview, off: int, next_header: int) -> tuple[int, int] | None:
    """Walk IPv6 extension headers from `off`; return (transport_proto, offset)
    or None when there is no parseable transport.

    A fragmenting fragment header (offset>0 or MF set) ends the walk with no
    transport — etherparse's is_fragmenting_payload behavior: the bytes after
    it are mid-datagram payload, not a transport header. Atomic fragments
    (offset=0, MF=0) continue. AH (51) encodes its length in 4-byte units + 2,
    unlike the other extensions' 8-byte units + 1.
    """
    n = len(pkt)
    proto = next_header
    while proto in _V6_EXT:
        if off + 8 > n:
            return None
        nxt = pkt[off]
        if proto == 44:  # fragment header
            frag_bits = (pkt[off + 2] << 8) | pkt[off + 3]
            if (frag_bits >> 3) or (frag_bits & 1):  # offset or MF
                return None
            proto, off = nxt, off + 8
            continue
        if proto == 51:  # AH
            hdr_len = (pkt[off + 1] + 2) * 4
        else:
            hdr_len = (pkt[off + 1] + 1) * 8
        proto, off = nxt, off + hdr_len
    if off > n:
        return None
    return proto, off

_U16BE = Struct(">H")
_ETH = Struct(">6s6sH")

_TCP_FLAG_TEMPLATE = (
    (0x80, 0, "C"),
    (0x40, 1, "E"),
    (0x20, 2, "U"),
    (0x10, 3, "A"),
    (0x08, 4, "P"),
    (0x04, 5, "R"),
    (0x02, 6, "S"),
    (0x01, 7, "F"),
)


def tcp_flags_string(bits: int) -> str:
    """Fixed-width "CEUAPRSF" rendering, '.' for unset (packetstats.rs:114-142)."""
    out = ["."] * 8
    for mask, pos, ch in _TCP_FLAG_TEMPLATE:
        if bits & mask:
            out[pos] = ch
    return "".join(out)


def ipv4_str(b: bytes) -> str:
    return f"{b[0]}.{b[1]}.{b[2]}.{b[3]}"


def ipv6_str(b: bytes) -> str:
    # RFC 5952 compression — same rendering Rust's Ipv6Addr Display uses.
    return str(IPv6Address(b))


# ---------------------------------------------------------------- DNS (E7)


def parse_dns_first_question(payload: memoryview) -> tuple[str | None, int | None, int]:
    """Return (qry_name, qry_type, errors) for the FIRST question only.

    Name rendering: labels joined with '.', no trailing dot; the root name is
    the literal "<Root>" (packetstats.rs:274-278). Compression pointers are
    followed (bounded, loop-safe). A message too short to carry a header
    counts as a decode error (packetstats.rs:287-289); qdcount == 0 is not an
    error — the fields just stay NULL.
    """
    n = len(payload)
    if n < 12:
        return None, None, 1
    qdcount = _U16BE.unpack_from(payload, 4)[0]
    if qdcount == 0:
        return None, None, 0
    labels: list[str] = []
    pos = 12
    jumps = 0
    try:
        while True:
            if pos >= n:
                return None, None, 1
            ln = payload[pos]
            if ln == 0:
                pos += 1
                break
            if ln & 0xC0 == 0xC0:  # compression pointer
                if pos + 1 >= n:
                    return None, None, 1
                target = ((ln & 0x3F) << 8) | payload[pos + 1]
                if jumps == 0:
                    end_after_ptr = pos + 2
                jumps += 1
                if jumps > 64 or target >= n:
                    return None, None, 1
                pos = target
                continue
            if pos + 1 + ln > n:
                return None, None, 1
            labels.append(bytes(payload[pos + 1 : pos + 1 + ln]).decode("ascii", "replace"))
            pos += 1 + ln
        if jumps:
            pos = end_after_ptr
        if pos + 4 > n:
            return None, None, 1
        qtype = _U16BE.unpack_from(payload, pos)[0]
        name = ".".join(labels) if labels else "<Root>"
        return name, qtype, 0
    except Exception:
        return None, None, 1


# ---------------------------------------------------------------- NTP (E8)


def parse_ntp(payload: memoryview) -> tuple[int | None, int]:
    """Return (ntp_priv_reqcode, errors).

    A ≥48-byte v3/v4 packet parses cleanly and contributes nothing (the
    reference parses and discards, packetstats.rs:296-300). Otherwise, if the
    version bits are 2 the 4th byte is the private-mode request code
    (packetstats.rs:305-308); anything else is an error. The reference panics
    on an empty payload — we count an error instead.
    """
    n = len(payload)
    if n == 0:
        return None, 1
    version = (payload[0] >> 3) & 0b111
    if version in (3, 4) and n >= 48:
        return None, 0
    if version == 2:
        if n < 4:
            return None, 1
        return payload[3], 0
    return None, 1


# ---------------------------------------------------------- DHDiscover (E9)


def parse_dhdiscover(payload: memoryview) -> tuple[str | None, int]:
    """Return (dhip_device, errors) — packetstats.rs:316-338.

    Bytes outside 32..127 are replaced with spaces before the prefix check.
    The extracted DeviceType is JSON-encoded (a JSON string keeps its quotes,
    a missing key renders as "null") to match serde_json's Value::to_string.
    """
    sanitized = bytes(b if 32 <= b <= 127 else 0x20 for b in payload)
    try:
        s = sanitized.decode("ascii")
    except UnicodeDecodeError:
        return None, 1
    if not s.startswith("    DHIP") or len(s) < 32:
        return None, 0
    try:
        v = json.loads(s[32:])
        device = v.get("params", {}).get("deviceInfo", {}).get("DeviceType")
        return json.dumps(device, separators=(",", ":")), 0
    except Exception:
        return None, 1


# ----------------------------------------------------------- decode driver

# Row layout indices into the mutable record list (fast positional writes).
_IDX = {name: i for i, name in enumerate(PACKET_COLUMNS)}
_I_FRAME_TIME = _IDX["frame_time"]
_I_FRAME_LEN = _IDX["frame_len"]
_I_ETH_TYPE = _IDX["eth_type"]
_I_IP_SRC = _IDX["ip_src"]
_I_IP_DST = _IDX["ip_dst"]
_I_IP_PROTO = _IDX["ip_proto"]
_I_IP_TTL = _IDX["ip_ttl"]
_I_IP_FRAG = _IDX["ip_frag_offset"]
_I_IP_ID = _IDX["ip_id"]
_I_IP_MF = _IDX["ip_mf"]
_I_ICMP_TYPE = _IDX["icmp_type"]
_I_UDP_LEN = _IDX["udp_length"]
_I_UDP_SRC = _IDX["udp_srcport"]
_I_UDP_DST = _IDX["udp_dstport"]
_I_TCP_FLAGS = _IDX["tcp_flags"]
_I_TCP_SRC = _IDX["tcp_srcport"]
_I_TCP_DST = _IDX["tcp_dstport"]
_I_COL_SRC = _IDX["col_source"]
_I_COL_DST = _IDX["col_destination"]
_I_COL_PROTO = _IDX["col_protocol"]
_I_DNS_NAME = _IDX["dns_qry_name"]
_I_DNS_TYPE = _IDX["dns_qry_type"]
_I_NTP_REQ = _IDX["ntp_priv_reqcode"]
_I_DHIP = _IDX["dhip_device"]

_N_COLS = len(PACKET_COLUMNS)


def _decode_transport(row: list, proto: int, seg: memoryview, errors: int) -> int:
    """Transport + application decode shared by the normal path and the
    first-fragment path (packetstats.rs:49-107, 222-238, 258-385)."""
    n = len(seg)
    if proto == PROTO_UDP:
        if n < 8:
            return errors + 1
        sport = (seg[0] << 8) | seg[1]
        dport = (seg[2] << 8) | seg[3]
        ulen = (seg[4] << 8) | seg[5]
        row[_I_COL_PROTO] = "UDP"
        row[_I_UDP_SRC] = sport
        row[_I_UDP_DST] = dport
        row[_I_UDP_LEN] = ulen
        payload = seg[8:]
        if sport == 53 or dport == 53:
            row[_I_COL_PROTO] = "DNS"
            name, qtype, e = parse_dns_first_question(payload)
            row[_I_DNS_NAME] = name
            row[_I_DNS_TYPE] = qtype
            errors += e
        elif sport == 123 or dport == 123:
            row[_I_COL_PROTO] = "NTP"
            reqcode, e = parse_ntp(payload)
            row[_I_NTP_REQ] = reqcode
            errors += e
        elif sport == 37810:
            row[_I_COL_PROTO] = "DHDiscover"
            device, e = parse_dhdiscover(payload)
            row[_I_DHIP] = device
            errors += e
    elif proto == PROTO_TCP:
        if n < 20:
            return errors + 1
        doff = (seg[12] >> 4) * 4
        if doff < 20 or doff > n:
            return errors + 1
        row[_I_COL_PROTO] = "TCP"
        row[_I_TCP_SRC] = (seg[0] << 8) | seg[1]
        row[_I_TCP_DST] = (seg[2] << 8) | seg[3]
        row[_I_TCP_FLAGS] = tcp_flags_string(seg[13])
        return errors
    elif proto == PROTO_ICMP:
        if n < 8:
            return errors + 1
        row[_I_COL_PROTO] = "ICMP"
        icmp_type = seg[0]
        row[_I_ICMP_TYPE] = icmp_type
        if icmp_type == ICMP_DEST_UNREACH:
            # The payload quotes the original packet: lift its ports so the
            # victim flow is identifiable (packetstats.rs:357-377). Strict
            # parse — a truncated inner transport header is an error.
            inner = seg[8:]
            iproto, iseg = None, None
            if len(inner) >= 20 and (inner[0] >> 4) == 4:
                ihl = (inner[0] & 0x0F) * 4
                iproto = inner[9]
                iseg = inner[ihl:]
            elif len(inner) >= 40 and (inner[0] >> 4) == 6:
                # The reference's from_ip_slice also parses a quoted IPv6
                # packet (packetstats.rs:360) — walk its extensions too.
                walked = _v6_walk(inner, 40, inner[6])
                if walked is not None:
                    iproto = walked[0]
                    iseg = inner[walked[1]:]
            if iseg is not None:
                if iproto == PROTO_UDP and len(iseg) >= 8:
                    row[_I_UDP_SRC] = (iseg[0] << 8) | iseg[1]
                    row[_I_UDP_DST] = (iseg[2] << 8) | iseg[3]
                elif iproto == PROTO_TCP and len(iseg) >= 20:
                    row[_I_TCP_SRC] = (iseg[0] << 8) | iseg[1]
                    row[_I_TCP_DST] = (iseg[2] << 8) | iseg[3]
                    row[_I_TCP_FLAGS] = tcp_flags_string(iseg[13])
                elif iproto in (PROTO_UDP, PROTO_TCP):
                    errors += 1
            else:
                errors += 1
    elif proto == PROTO_ICMPV6:
        pass  # recognized, no fields (packetstats.rs:388)
    return errors


def _decode_ip(row: list, pkt: memoryview, errors: int) -> int:
    """IP layer decode (E2-E5); dispatches into _decode_transport."""
    n = len(pkt)
    if n < 1:
        return errors + 1
    version = pkt[0] >> 4
    if version == 4:
        if n < 20:
            return errors + 1
        ihl = (pkt[0] & 0x0F) * 4
        if ihl < 20 or ihl > n:
            return errors + 1
        total_len = (pkt[2] << 8) | pkt[3]
        row[_I_COL_PROTO] = "IPv4"
        row[_I_FRAME_LEN] = total_len  # overwrites capture length (E2)
        row[_I_IP_ID] = (pkt[4] << 8) | pkt[5]
        flags_frag = (pkt[6] << 8) | pkt[7]
        mf = bool(flags_frag & 0x2000)
        frag_offset = flags_frag & 0x1FFF
        src = ipv4_str(pkt[12:16])
        dst = ipv4_str(pkt[16:20])
        row[_I_IP_SRC] = src
        row[_I_IP_DST] = dst
        row[_I_COL_SRC] = src
        row[_I_COL_DST] = dst
        row[_I_IP_TTL] = pkt[8]
        row[_I_IP_PROTO] = pkt[9]
        row[_I_IP_MF] = mf
        row[_I_IP_FRAG] = frag_offset
        if frag_offset > 0:
            return errors  # continuation fragment: L3 only (E3)
        return _decode_transport(row, pkt[9], pkt[ihl:], errors)
    if version == 6:
        if n < 40:
            return errors + 1
        payload_len = (pkt[4] << 8) | pkt[5]
        next_header = pkt[6]
        row[_I_COL_PROTO] = "IPv6"
        row[_I_FRAME_LEN] = payload_len + 40
        src = ipv6_str(bytes(pkt[8:24]))
        dst = ipv6_str(bytes(pkt[24:40]))
        row[_I_IP_SRC] = src
        row[_I_IP_DST] = dst
        row[_I_COL_SRC] = src
        row[_I_COL_DST] = dst
        row[_I_IP_TTL] = pkt[7]
        row[_I_IP_PROTO] = next_header  # fixed header's next_header (E5)
        # Walk extension headers to the transport; ip_proto keeps the fixed
        # header value, matching etherparse's split of header vs transport.
        # Fragmenting fragments end the walk with no transport decode.
        walked = _v6_walk(pkt, 40, next_header)
        if walked is None:
            return errors
        return _decode_transport(row, walked[0], pkt[walked[1]:], errors)
    return errors + 1


def decode_packet(row: list, data: memoryview, linktype: int) -> int:
    """Decode one packet into `row` (positional, pre-filled with defaults).
    Returns the number of decode errors encountered (E17)."""
    try:
        if linktype == LINKTYPE_ETHERNET:
            if len(data) < 14:
                return 1
            eth_type = (data[12] << 8) | data[13]
            row[_I_ETH_TYPE] = eth_type  # outer ethertype, VLAN included (E1)
            off = 14
            inner = eth_type
            while inner in VLAN_TAGS:
                if off + 4 > len(data):
                    return 1
                inner = (data[off + 2] << 8) | data[off + 3]
                off += 4
            if inner in (ETH_IPV4, ETH_IPV6):
                return _decode_ip(row, data[off:], 0)
            return 0  # non-IP (ARP etc.): L2 fields only
        if linktype == LINKTYPE_RAW:
            return _decode_ip(row, data, 0)
        if linktype == LINKTYPE_NULL:
            if len(data) < 4:
                return 1
            return _decode_ip(row, data[4:], 0)
        return 0  # unsupported linktype: row keeps defaults
    except Exception:
        return 1


def decode_packets_to_pandas(
    records: list[tuple[int, int, int, bytes]],
    linktype_default: int,
    pcap_file: str,
    per_record_linktype: list[int] | None = None,
) -> pd.DataFrame:
    """Decode a batch of (frame_time_us, frame_len, caplen, data) records into
    one pandas DataFrame with the 31 normative columns + ``errors``.

    Batch-oriented by design: one call per multi-MB chunk keeps Python
    call overhead off the per-packet path and produces a single Arrow batch.
    """
    nrows = len(records)
    cols: list[list] = [[None] * nrows for _ in range(_N_COLS)]
    errors = [0] * nrows
    for i, (ft_us, flen, _caplen, data) in enumerate(records):
        row: list = [None] * _N_COLS
        row[_I_FRAME_TIME] = ft_us
        row[_I_FRAME_LEN] = flen
        row[_I_IP_PROTO] = 0
        row[_I_IP_FRAG] = 0
        row[_I_IP_ID] = 0
        row[_I_IP_MF] = False
        lt = per_record_linktype[i] if per_record_linktype is not None else linktype_default
        errors[i] = decode_packet(row, memoryview(data), lt)
        for c in range(_N_COLS):
            cols[c][i] = row[c]
    out = {}
    for c, name in enumerate(PACKET_COLUMNS):
        if name == "frame_time":
            out[name] = pd.Series(
                np.asarray(cols[c], dtype="int64").view("datetime64[us]")
                if nrows
                else np.array([], dtype="datetime64[us]")
            )
        elif name == "pcap_file":
            out[name] = pd.Series([pcap_file] * nrows, dtype="object")
        else:
            out[name] = pd.Series(cols[c], dtype=PACKET_PANDAS_DTYPES[name])
    out["errors"] = pd.Series(errors, dtype="int64")
    return pd.DataFrame(out)
