"""Unit tests for the cache tier, config system, and metrics subsystem."""

import json
import time

import numpy as np
import pytest

from video_quierer_tpu.engine.cache import LRUCache, QueryResultCache
from video_quierer_tpu.engine.config import (
    ApiConfig,
    EngineConfig,
    apply_env_overrides,
    load_api_config,
    load_engine_config,
    save_api_config,
)
from video_quierer_tpu.engine.metrics import SystemMetrics


# -- LRU -------------------------------------------------------------------

def test_lru_eviction_order():
    c = LRUCache(max_size=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1   # refresh a
    c.put("c", 3)            # evicts b
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_lru_ttl_expiry():
    c = LRUCache(max_size=10, ttl_seconds=0.05)
    c.put("k", "v")
    assert c.get("k") == "v"
    time.sleep(0.06)
    assert c.get("k") is None
    assert c.stats()["hit_rate"] == 0.5


def test_query_cache_keys_distinct_k():
    qc = QueryResultCache()
    qc.put_text("dog", 5, ["five"])
    assert qc.get_text("dog", 5) == ["five"]
    assert qc.get_text("dog", 10) is None


def test_query_cache_semantic_reuse_threshold():
    qc = QueryResultCache(similarity_threshold=0.95)
    v = np.zeros(512, np.float32)
    v[0] = 1.0
    qc.put_vector(v, 3, ["res"])
    near = v.copy()
    near[1] = 0.1  # cosine ≈ 0.995
    assert qc.get_vector(near, 3) == ["res"]
    far = np.zeros(512, np.float32)
    far[5] = 1.0   # cosine 0
    assert qc.get_vector(far, 3) is None
    # same vector, different k → miss
    assert qc.get_vector(near, 7) is None
    qc.invalidate_all()
    assert qc.get_vector(v, 3) is None


# -- Config ----------------------------------------------------------------

def test_api_config_defaults_match_reference():
    """Defaults must equal routes.py:100-109 field-for-field."""
    cfg = ApiConfig()
    assert cfg.model_dump() == {
        "sampling_mode": "high", "max_frames": 300, "use_clip": True,
        "enhanced_mode": True, "default_results": 10, "cache_search": True,
        "search_timeout": 30, "auto_save": True, "log_level": "INFO",
    }


def test_api_config_roundtrip(tmp_path):
    p = tmp_path / "config.json"
    cfg = ApiConfig(sampling_mode="ultra_high", max_frames=500,
                    log_level="DEBUG")
    assert save_api_config(cfg, p)
    loaded = load_api_config(p)
    assert loaded == cfg
    data = json.loads(p.read_text())
    assert data["sampling_mode"] == "ultra_high"


def test_api_config_bad_file_falls_back(tmp_path):
    p = tmp_path / "config.json"
    p.write_text("{not json")
    assert load_api_config(p) == ApiConfig()


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("VQT_BATCH_SIZE", "64")
    monkeypatch.setenv("VQT_DTYPE", "bfloat16")
    monkeypatch.setenv("VQT_DECODE_WORKERS", "notanint")
    cfg = apply_env_overrides(EngineConfig())
    assert cfg.ingest.batch_size == 64
    assert cfg.model.dtype == "bfloat16"
    assert cfg.ingest.num_decode_workers == 4  # invalid ignored


def test_engine_config_validation(tmp_path):
    p = tmp_path / "config.json"
    save_api_config(ApiConfig(sampling_mode="bogus"), p)
    with pytest.raises(ValueError):
        load_engine_config(p)


# -- Metrics ---------------------------------------------------------------

def test_metrics_counters_gauges():
    m = SystemMetrics()
    m.inc("req")
    m.inc("req", 2)
    m.set_gauge("g", 7.5)
    assert m.counter("req") == 3
    assert m.gauge("g") == 7.5
    assert m.counter("missing") == 0


def test_metrics_histogram_percentiles():
    m = SystemMetrics()
    for v in range(1, 101):
        m.observe("lat", float(v))
    s = m.histogram_stats("lat")
    assert s["count"] == 100
    assert s["min"] == 1 and s["max"] == 100
    assert abs(s["p50"] - 50.5) < 1.0
    assert s["p95"] >= 95 and s["p99"] >= 99


def test_metrics_timer_and_prometheus():
    m = SystemMetrics()
    with m.timer("op"):
        time.sleep(0.01)
    s = m.histogram_stats("op_ms")
    assert s["count"] == 1 and s["min"] >= 5
    text = m.export_prometheus()
    assert "video_search_op_ms" in text
    assert 'quantile="50"' in text


def test_metrics_thread_safety():
    import threading
    m = SystemMetrics()

    def work():
        for _ in range(1000):
            m.inc("n")
            m.observe("h", 1.0)

    threads = [threading.Thread(target=work) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert m.counter("n") == 8000
