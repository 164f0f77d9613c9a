"""Cross-compatibility against the ACTUAL reference implementation.

When the reference checkout is present (read-only at /root/reference),
import its ``SimpleVideoIndex`` and verify both directions of the cache
contract plus score-ordering agreement. This is an integration proof, not
a port: the reference module is imported from its own tree, never copied.
Skipped automatically when the reference isn't available.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "video_search_overhaul.py").exists(),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_index_cls():
    sys.path.insert(0, str(REFERENCE))
    try:
        from video_search_overhaul import SimpleVideoIndex
    finally:
        sys.path.remove(str(REFERENCE))
    return SimpleVideoIndex


def _unit(rng, n):
    e = rng.standard_normal((n, 512)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_our_cache_loads_in_reference(tmp_path, rng, ref_index_cls):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    ours = DeviceVideoIndex()
    embs = _unit(rng, 25)
    ours.add_batch(embs, "x.mp4", (np.arange(25) / 30.0).tolist())
    ours.video_hashes["x.mp4"] = "h123"
    p = tmp_path / "cache.pkl"
    assert ours.save_to_disk(p)

    ref = ref_index_cls()
    assert ref.load_from_disk(p)
    assert len(ref.embeddings) == 25
    assert ref.metadata[7]["video_name"] == "x.mp4"
    assert ref.metadata[7]["frame_id"] == 7
    assert ref.video_hashes == {"x.mp4": "h123"}
    # and the reference can search what we wrote
    q = embs[3] + 0.01 * rng.standard_normal(512).astype(np.float32)
    results = ref.search(q, k=1)
    assert results[0]["frame_id"] == 3


def test_reference_cache_loads_in_ours(tmp_path, rng, ref_index_cls):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    ref = ref_index_cls()
    embs = _unit(rng, 12)
    for i in range(12):
        ref.add_frame(embs[i], "r.mp4", i / 30.0)
    ref.video_hashes["r.mp4"] = "deadbeef"
    p = tmp_path / "refcache.pkl"
    assert ref.save_to_disk(p)

    ours = DeviceVideoIndex()
    assert ours.load_from_disk(p)
    assert len(ours) == 12
    assert ours.video_hashes == {"r.mp4": "deadbeef"}
    res = ours.search(embs[5], k=1)
    assert res[0]["frame_id"] == 5
    assert res[0]["timestamp"] == pytest.approx(5 / 30.0)


def test_score_ordering_agreement(tmp_path, rng, ref_index_cls):
    """Same corpus, same query → same ranking and scores (within f32)."""
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    embs = _unit(rng, 500)
    ts = (np.arange(500) / 30.0).tolist()
    ref = ref_index_cls()
    for i in range(500):
        ref.add_frame(embs[i], "v.mp4", ts[i])
    ours = DeviceVideoIndex()
    ours.add_batch(embs, "v.mp4", ts)

    for trial in range(5):
        q = rng.standard_normal(512).astype(np.float32)
        r_ref = ref.search(q, k=10)
        r_ours = ours.search(q, k=10)
        assert [r["frame_id"] for r in r_ours] == \
            [r["frame_id"] for r in r_ref]
        np.testing.assert_allclose(
            [r["score"] for r in r_ours],
            [r["score"] for r in r_ref], rtol=1e-5, atol=1e-6)
