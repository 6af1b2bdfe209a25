"""Speculative split: raw byte ranges + executor-side resync must decode
exactly the same records as the exact index walk."""

from __future__ import annotations

import pandas as pd
import pytest

from fixtures import pcapgen as g
from pcap_converter_spark.sources.pcap import (
    _resync_legacy,
    index_pcap,
    read_pcap_chunk,
    split_pcap_speculative,
)

M1, M2 = g.mac(1), g.mac(2)


def _mixed_pcap(path: str, n: int = 3000) -> None:
    pkts = []
    for i in range(n):
        if i % 3 == 0:
            seg = g.tcp(30000 + i % 999, 443, 0x18, seq=i)
            pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4(
                f"10.{i % 200}.0.{1 + i % 250}", "1.1.1.1", 6, seg)))
        elif i % 3 == 1:
            # payload bytes chosen adversarially: plausible-looking u32 runs
            payload = (i.to_bytes(4, "little") * 16)[: 32 + i % 64]
            pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4(
                f"10.{i % 200}.1.{1 + i % 250}", "2.2.2.2", 17,
                g.udp(1000 + i % 500, 9, payload))))
        else:
            dns = g.dns_query(f"h{i}.test", 1)
            pkts.append(g.ethernet(M1, M2, 0x0800, g.ipv4(
                f"10.{i % 200}.2.{1 + i % 250}", "8.8.8.8", 17,
                g.udp(40000, 53, dns))))
    g.write_pcap(path, [(1_700_000_000_000_000 + i * 1000, p) for i, p in enumerate(pkts)])


def _decode_chunks(chunks) -> pd.DataFrame:
    pdf = pd.concat([read_pcap_chunk(c) for c in chunks], ignore_index=True)
    return pdf.sort_values("frame_time").reset_index(drop=True)


def test_speculative_equals_exact(tmp_path):
    path = str(tmp_path / "big.pcap")
    _mixed_pcap(path)
    exact = _decode_chunks(index_pcap(path, target_chunk_bytes=1 << 26))
    for target in (8_192, 65_536, 1 << 20):
        spec_chunks = split_pcap_speculative(path, target_chunk_bytes=target)
        assert len(spec_chunks) > 1 or target == 1 << 20
        spec = _decode_chunks(spec_chunks)
        assert len(spec) == len(exact), f"target={target}"
        pd.testing.assert_frame_equal(spec, exact, obj=f"target={target}")


def test_failed_resync_raises_not_silent_empty(tmp_path):
    """ADVICE r2: a speculative range where no plausible record chain exists
    must raise loudly, never decode to zero records silently."""
    path = str(tmp_path / "garbage.pcap")
    _mixed_pcap(path, n=20)
    import os

    from pcap_converter_spark.sources.pcap import Chunk

    size = os.path.getsize(path)
    # mid-file range filled with bytes that cannot pass the sanity chain
    with open(path, "r+b") as f:
        f.seek(100)
        f.write(b"\xff" * (size - 200))
    bad = Chunk(path, "pcap_spec", 64, size - 128, "<", 1, 1,
                '{"snaplen": 65535}', -1)
    with pytest.raises(ValueError, match="resync failed"):
        read_pcap_chunk(bad)


def test_resync_sec_bounds_configurable(tmp_path):
    """Epoch-0 captures (zeroed timestamps) resync when the caller relaxes
    the timestamp sanity floor."""
    path = str(tmp_path / "epoch0.pcap")
    pkts = [g.ethernet(M1, M2, 0x0800, g.ipv4(
        "10.0.0.1", "1.1.1.1", 17, g.udp(1000, 9, bytes(32))))] * 60
    g.write_pcap(path, [(i, p) for i, p in enumerate(pkts)])  # ts ≈ epoch 0
    data = open(path, "rb").read()
    raw = memoryview(data)[24 + 3 :]  # misaligned mid-file start
    assert _resync_legacy(raw, "<", 1, 65535, len(raw)) is None  # default bounds
    sync = _resync_legacy(raw, "<", 1, 65535, len(raw), sec_bounds=(0, 2**32 - 1))
    assert sync is not None


def test_resync_finds_true_boundary(tmp_path):
    path = str(tmp_path / "t.pcap")
    _mixed_pcap(path, n=50)
    data = open(path, "rb").read()
    # start mid-file at an arbitrary misaligned offset; the resync must land
    # on a real record boundary (verified by walking to EOF exactly)
    raw = memoryview(data)[24 + 37 :]
    sync = _resync_legacy(raw, "<", 1, 65535, len(raw))
    assert sync is not None
    from struct import unpack_from

    pos = sync
    n_ok = 0
    while pos + 16 <= len(raw):
        _s, _f, caplen, _o = unpack_from("<IIII", raw, pos)
        if pos + 16 + caplen > len(raw):
            break
        pos += 16 + caplen
        n_ok += 1
    assert pos == len(raw), "resync walk must end exactly at EOF"
    assert n_ok > 0


def test_speculative_chunk_count_is_o1(tmp_path):
    path = str(tmp_path / "t.pcap")
    _mixed_pcap(path, n=500)
    chunks = split_pcap_speculative(path, target_chunk_bytes=10_000)
    import os

    assert len(chunks) == -(-(os.path.getsize(path) - 24) // 10_000)
    assert all(c.n_records == -1 for c in chunks)
