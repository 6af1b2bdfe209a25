"""Deterministic packet-crafting + capture-file writers for fixtures/tests.

Builds raw packet bytes (Ethernet/IPv4/IPv6/UDP/TCP/ICMP/DNS/NTP/DHIP) and
writes them as legacy pcap (µs or ns magic) or pcapng (EPB/SPB, per-interface
if_tsresol). Used to generate the golden decode fixtures (FIXTURES.md §2) and
the 2,500-row `packets` correctness fixture (FIXTURES.md §1).
"""

from __future__ import annotations

import json as _json
import struct


def mac(i: int) -> bytes:
    return bytes([0x02, 0, 0, (i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF])


def ethernet(src: bytes, dst: bytes, eth_type: int, payload: bytes) -> bytes:
    return dst + src + struct.pack(">H", eth_type) + payload


def ipv4(
    src: str,
    dst: str,
    proto: int,
    payload: bytes,
    ttl: int = 64,
    ident: int = 0,
    frag_offset: int = 0,  # in 8-byte units
    mf: bool = False,
    total_len: int | None = None,
) -> bytes:
    if total_len is None:
        total_len = 20 + len(payload)
    flags_frag = (0x2000 if mf else 0) | (frag_offset & 0x1FFF)
    src_b = bytes(int(x) for x in src.split("."))
    dst_b = bytes(int(x) for x in dst.split("."))
    hdr = struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, total_len, ident, flags_frag, ttl, proto, 0, src_b, dst_b
    )
    # header checksum left zero: the decoder does not verify it
    return hdr + payload


def ipv6(src_b: bytes, dst_b: bytes, next_header: int, payload: bytes, hop_limit: int = 64) -> bytes:
    hdr = struct.pack(">IHBB", 0x60000000, len(payload), next_header, hop_limit) + src_b + dst_b
    return hdr + payload


def udp(sport: int, dport: int, payload: bytes, length: int | None = None) -> bytes:
    if length is None:
        length = 8 + len(payload)
    return struct.pack(">HHHH", sport, dport, length, 0) + payload


def tcp(sport: int, dport: int, flags: int, seq: int = 0, ack: int = 0) -> bytes:
    return struct.pack(">HHIIBBHHH", sport, dport, seq, ack, 5 << 4, flags, 8192, 0, 0)


def icmp_echo(icmp_type: int = 8, code: int = 0, ident: int = 1, seq: int = 1) -> bytes:
    return struct.pack(">BBHHH", icmp_type, code, 0, ident, seq)


def icmp_dest_unreach(original_packet: bytes, code: int = 3) -> bytes:
    # type 3 + code + checksum + unused, then the quoted original IP packet
    return struct.pack(">BBHI", 3, code, 0, 0) + original_packet


def dns_query(qname: str, qtype: int, txid: int = 0x1234, response: bool = False) -> bytes:
    flags = 0x8180 if response else 0x0100
    hdr = struct.pack(">HHHHHH", txid, flags, 1, 0, 0, 0)
    q = b""
    if qname not in ("", "."):
        for label in qname.rstrip(".").split("."):
            lb = label.encode()
            q += bytes([len(lb)]) + lb
    q += b"\x00" + struct.pack(">HH", qtype, 1)
    return hdr + q


def ntp_v4() -> bytes:
    b0 = (0 << 6) | (4 << 3) | 3  # LI=0, VN=4, mode=3 (client)
    return bytes([b0]) + bytes(47)


def ntp_v2_mode7(reqcode: int = 42) -> bytes:
    b0 = (0 << 6) | (2 << 3) | 7  # VN=2, mode=7 (private)
    return bytes([b0, 0, 0, reqcode]) + bytes(4)


def dhip_discover(device_type: str = "IPC") -> bytes:
    body = _json.dumps(
        {"method": "DHDiscover.search", "params": {"deviceInfo": {"DeviceType": device_type}}}
    ).encode()
    head = b"    DHIP" + bytes(24)  # 32-byte binary header, prefix survives sanitize
    return head + body


# ------------------------------------------------------------- file writers


def write_pcap(path: str, packets: list[tuple[int, bytes]], linktype: int = 1, nanos: bool = False) -> None:
    """packets: [(frame_time_us, raw_bytes)]; ns files store frac in ns."""
    magic = 0xA1B23C4D if nanos else 0xA1B2C3D4
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", magic, 2, 4, 0, 0, 65535, linktype))
        for ft_us, data in packets:
            sec, us = divmod(ft_us, 1_000_000)
            frac = us * 1000 if nanos else us
            f.write(struct.pack("<IIII", sec, frac, len(data), len(data)) + data)


def _ng_block(btype: int, body: bytes) -> bytes:
    pad = (-len(body)) % 4
    total = 12 + len(body) + pad
    return struct.pack("<II", btype, total) + body + bytes(pad) + struct.pack("<I", total)


def write_pcapng(
    path: str,
    interfaces: list[tuple[int, int]],  # [(linktype, tsresol_code)]
    packets: list[tuple[int, int, bytes]],  # [(if_id, timestamp_in_if_units, data)]
    simple_packets: list[bytes] | None = None,
) -> None:
    out = b""
    shb = struct.pack("<IHHq", 0x1A2B3C4D, 1, 0, -1)
    out += _ng_block(0x0A0D0D0A, shb)
    for lt, tsresol in interfaces:
        body = struct.pack("<HHI", lt, 0, 65535)
        body += struct.pack("<HH", 9, 1) + bytes([tsresol]) + bytes(3)  # if_tsresol
        body += struct.pack("<HH", 0, 0)  # opt_endofopt
        out += _ng_block(0x00000001, body)
    for if_id, ts, data in packets:
        body = struct.pack("<IIIII", if_id, (ts >> 32) & 0xFFFFFFFF, ts & 0xFFFFFFFF, len(data), len(data))
        out += _ng_block(0x00000006, body + data)
    for data in simple_packets or []:
        out += _ng_block(0x00000003, struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(out)
