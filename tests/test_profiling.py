"""Observability: phase timers, metrics registry, trace gating."""

import logging

from bigsi_tpu.utils.profiling import Metrics, device_trace, metrics, phase, trace_dir


def test_phase_records_timer():
    reg = Metrics()
    with phase("unit.phase", registry=reg):
        pass
    snap = reg.snapshot()
    assert snap["timers"]["unit.phase"]["count"] == 1
    assert snap["timers"]["unit.phase"]["total_s"] >= 0


def test_counters_accumulate_and_reset():
    reg = Metrics()
    reg.incr("a")
    reg.incr("a", 4)
    assert reg.snapshot()["counters"]["a"] == 5
    reg.reset()
    assert reg.snapshot() == {"counters": {}, "timers": {}}


def test_device_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("BIGSI_TPU_TRACE_DIR", raising=False)
    assert trace_dir({}) is None
    with device_trace("unit.trace", {}):
        pass  # must not import/require jax profiler


def test_trace_dir_sources(monkeypatch):
    monkeypatch.setenv("BIGSI_TPU_TRACE_DIR", "/tmp/t1")
    assert trace_dir(None) == "/tmp/t1"
    assert trace_dir({"trace_dir": "/tmp/t2"}) == "/tmp/t2"


def test_search_populates_metrics():
    from bigsi_tpu import BIGSI
    from bigsi_tpu.storage import get_storage

    cfg = {
        "storage-engine": "memory",
        "storage-config": {"filename": "prof-t"},
        "k": 3,
        "m": 200,
        "h": 2,
    }
    get_storage(cfg).delete_all()
    metrics.reset()
    bigsi = BIGSI.build(cfg, [BIGSI.bloom(cfg, ["ATC", "TTT"])], ["s0"])
    bigsi.search("ATCT")
    snap = metrics.snapshot()
    assert snap["counters"]["build.samples"] == 1
    assert snap["counters"]["search.queries"] == 1
    assert "search.lookup" in snap["timers"]
    assert "build.transpose" in snap["timers"]
