"""bench.py --require-idle (VERDICT r12 stretch #7): a contended host
must be REFUSED (exit 3, no JSON artifact line), a quiet one passed
through — pinned by monkeypatching the /proc sampler, since the real
host's load is whatever it is."""

from __future__ import annotations

import pytest

import bench


def _sample(load, steal_j, total_j):
    return {
        "loadavg1": load,
        "jiffies": {"total": total_j, "idle": 0, "iowait": 0,
                    "steal": steal_j},
    }


def test_require_idle_refuses_loaded_host(monkeypatch):
    seq = iter([_sample(5.8, 0, 1000), _sample(5.8, 0, 2000)])
    monkeypatch.setattr(bench, "_cpu_sample", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        bench._refuse_if_busy()
    assert ei.value.code == 3


def test_require_idle_refuses_stolen_cpu(monkeypatch):
    # 0.5% steal over the window, loadavg fine
    seq = iter([_sample(0.2, 0, 1000), _sample(0.2, 5, 2000)])
    monkeypatch.setattr(bench, "_cpu_sample", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench._refuse_if_busy()


def test_require_idle_passes_quiet_host(monkeypatch):
    seq = iter([_sample(0.3, 0, 1000), _sample(0.3, 0, 2000)])
    monkeypatch.setattr(bench, "_cpu_sample", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._refuse_if_busy()  # no raise
