"""Multimodal plumbing tests (decode stubbed; schema/batching real)."""

import numpy as np
import pytest


def test_decode_features(ray_session):
    import ray.data

    from tangent_ray.ops.multimodal import decode_features, synth_media_table

    t = synth_media_table(48)
    out = decode_features(ray.data.from_arrow(t)).take_all()
    assert len(out) == 48
    r = out[0]
    assert len(r["feature"]) == 8 and all(0 <= x <= 1 for x in r["feature"])
    assert r["payload_bytes"] > 0
    # deterministic across runs
    out2 = decode_features(ray.data.from_arrow(t)).take_all()
    assert out[0]["feature"] == out2[0]["feature"]


def test_decode_real_mode_raises():
    from tangent_ray.ops.multimodal import MediaDecode, synth_media_table

    with pytest.raises(NotImplementedError):
        MediaDecode(mode="real")(synth_media_table(2))


def test_resize_metadata(ray_session):
    import ray.data

    from tangent_ray.ops.multimodal import MediaResize, synth_media_table

    t = synth_media_table(24)
    out = ray.data.from_arrow(t).map_batches(
        MediaResize(224, 224), batch_format="pyarrow"
    ).take_all()
    for r in out:
        assert 1 <= r["width"] <= 224 and 1 <= r["height"] <= 224


def test_frame_sample(ray_session):
    import ray.data

    from tangent_ray.ops.multimodal import frame_sample, synth_media_table

    t = synth_media_table(30)
    rows = frame_sample(ray.data.from_arrow(t), every_ms=5000).take_all()
    assert rows, "expected sampled frames"
    durs = {r["media_id"]: r["duration_ms"] for r in t.to_pylist()}
    kinds = {r["media_id"]: r["kind"] for r in t.to_pylist()}
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert kinds[r["media_id"]] == "video"
    for mid, fis in per.items():
        assert sorted(fis) == list(range(max(1, durs[mid] // 5000)))
