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


def test_image_header_parsers_round_trip():
    from tangent_ray.ops.multimodal import (
        image_dims,
        make_gif,
        make_jpeg,
        make_png,
    )

    for maker, fmt in ((make_png, "png"), (make_gif, "gif"), (make_jpeg, "jpeg")):
        for w, h in ((1, 1), (640, 480), (1919, 1079)):
            assert image_dims(maker(w, h)) == (fmt, w, h)
    assert image_dims(b"not an image") == ("unknown", -1, -1)
    assert image_dims(b"\xff\xd8\xff\xe0\x00\x04zz")[0] == "jpeg"  # truncated


def test_image_dims_pipeline(ray_session):
    import ray.data

    from tangent_ray.ops.multimodal import image_dims_batch, synth_image_table

    out = (
        ray.data.from_arrow(synth_image_table(48))
        .map_batches(image_dims_batch, batch_format="pyarrow", batch_size=16)
        .take_all()
    )
    assert len(out) == 48
    for r in out:
        i = r["media_id"]
        assert (r["width"], r["height"]) == ((i * 37) % 1920 + 1, (i * 53) % 1080 + 1)
        assert r["format"] in ("png", "gif", "jpeg")


def test_media_duration_parsers():
    from tangent_ray.ops.multimodal import make_mp4, make_wav, media_duration

    for ms in (0, 1000, 61500, 3600000):
        assert media_duration(make_wav(ms)) == ("wav", ms)
        assert media_duration(make_mp4(ms)) == ("mp4", ms)
    # version-agnostic fallbacks / junk
    assert media_duration(b"junk") == ("unknown", -1)
    assert media_duration(make_wav(1000)[:16]) == ("wav", -1)  # truncated


def test_media_duration_pipeline(ray_session):
    import pyarrow as pa

    import ray.data

    from tangent_ray.ops.multimodal import (
        make_mp4,
        make_wav,
        media_duration_batch,
    )

    t = pa.table(
        {
            "media_id": pa.array(range(20), type=pa.int64()),
            "payload": pa.array(
                [
                    (make_wav if i % 2 == 0 else make_mp4)((i + 1) * 500)
                    for i in range(20)
                ],
                type=pa.binary(),
            ),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(media_duration_batch, batch_format="pyarrow", batch_size=8)
        .take_all()
    )
    for r in out:
        assert r["duration_ms"] == (r["media_id"] + 1) * 500


def test_header_parser_spec_variants():
    """Spec-valid variants beyond our own synthesis: JPEG fill bytes / EOI,
    MP4 extended (64-bit) box size and size-0 (to-EOF) boxes."""
    import struct

    from tangent_ray.ops.multimodal import image_dims, make_jpeg, make_mp4, media_duration

    j = make_jpeg(640, 480)
    assert image_dims(j[:2] + b"\xff\xff" + j[2:]) == ("jpeg", 640, 480)
    assert image_dims(b"\xff\xd8\xff\xd9") == ("jpeg", -1, -1)

    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 24) + b"\x00" * 8
    assert media_duration(free + make_mp4(5000)) == ("mp4", 5000)
    mvhd = struct.pack(">B3xIIII", 0, 0, 0, 1000, 7000) + b"\x00" * 80
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    m3 = (struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
          + struct.pack(">I", 0) + b"moov" + mvhd_box)
    assert media_duration(m3) == ("mp4", 7000)


def test_header_parser_edge_bounds():
    """Regressions from review: fill-run-terminated JPEG payloads must not
    raise; extended-size moov children start after the 16-byte header."""
    import struct

    from tangent_ray.ops.multimodal import image_dims, media_duration

    assert image_dims(b"\xff\xd8\xff\xff") == ("jpeg", -1, -1)
    assert image_dims(b"\xff\xd8\xff\xff\xff") == ("jpeg", -1, -1)

    mvhd = struct.pack(">B3xIIII", 0, 0, 0, 1000, 9000) + b"\x00" * 80
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov_ext = (struct.pack(">I", 1) + b"moov"
                + struct.pack(">Q", 16 + len(mvhd_box)) + mvhd_box)
    m = (struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
         + moov_ext)
    assert media_duration(m) == ("mp4", 9000)


def test_sessionize_null_keys_dropped(ray_session):
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.streaming import sessionize

    t = pa.table(
        {
            "user_id": pa.array(["a", None, "a"], type=pa.string()),
            "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                           type=pa.timestamp("us")),
        }
    )
    got = sessionize(ray.data.from_arrow(t), gap_minutes=30).take_all()
    assert {r["user_id"] for r in got} == {"a"}
    assert sum(r["n_events"] for r in got) == 2


def test_media_meta_roundtrip():
    """Unified header-metadata kernel: every fact parsed from the bytes
    must equal the generation parameter it was synthesized from (the same
    contract the multimodal_meta DuckDB twin enforces via range(n))."""
    from tangent_ray.ops.multimodal import (
        MM_CODECS,
        media_meta_batch,
        synth_multimodal_table,
    )

    n = 30
    meta = media_meta_batch(synth_multimodal_table(n)).to_pylist()
    for i, r in enumerate(meta):
        m = i % 5
        fmt = ["png", "gif", "jpeg", "wav", "mp4"][m]
        assert r["format"] == fmt
        if m <= 2:
            assert (r["width"], r["height"]) == (
                (i * 37) % 1920 + 1, (i * 53) % 1080 + 1
            )
            assert r["duration_ms"] == -1
        else:
            assert r["duration_ms"] == (i + 1) * 250
        assert r["bit_depth"] == (8 + 8 * (i % 2) if m == 0 else -1)
        assert r["orientation"] == ((i % 8) + 1 if m == 2 else -1)
        assert r["sample_rate"] == (8000 * (1 + i % 3) if m == 3 else -1)
        assert r["n_tracks"] == ((i % 3) + 1 if m == 4 else -1)
        assert r["codec"] == (MM_CODECS[i % 3] if m == 4 else "")


def test_media_meta_little_endian_exif_and_junk():
    """The EXIF walker must handle II (little-endian) TIFF order too, and
    junk payloads must come back all-sentinel, never raise."""
    import struct

    from tangent_ray.ops.multimodal import jpeg_orientation, media_meta_batch

    # hand-build an II-order APP1: tag/type/count/value little-endian
    tiff = (
        b"II\x2a\x00" + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1)
        + struct.pack("<HH", 6, 0)
        + struct.pack("<I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 10, 20, 1) + b"\x01\x11\x00"
    assert jpeg_orientation(b"\xff\xd8" + app1 + sof0) == 6

    import pyarrow as pa

    junk = pa.table(
        {
            "media_id": pa.array([0, 1, 2], type=pa.int64()),
            "payload": pa.array([b"", b"garbage", None], type=pa.binary()),
        }
    )
    rows = media_meta_batch(junk).to_pylist()
    for r in rows:
        assert r["format"] == "unknown"
        assert r["width"] == -1 and r["duration_ms"] == -1


def test_gif_frame_count():
    from tangent_ray.ops.multimodal import (
        gif_meta,
        image_dims,
        make_gif,
        make_gif_animated,
    )

    for frames in (1, 4, 9):
        for gct in (0, 4, 64):
            p = make_gif_animated(33, 17, frames, gct)
            assert gif_meta(p) == frames
            assert image_dims(p) == ("gif", 33, 17)
    # the minimal dims-only stub ends cleanly right after the LSD with no
    # blocks at all: clean end, zero frames
    assert gif_meta(make_gif(8, 8)) == 0
    # trailer-stripped file still counts its frames (clean end)
    full = make_gif_animated(6, 6, 5)
    assert gif_meta(full[:-1]) == 5
    assert gif_meta(b"GIF8") == -1
    assert gif_meta(b"") == -1
    assert gif_meta(make_gif_animated(4, 4, 2)[:20]) == -1
    # unknown block byte mid-stream
    p = bytearray(make_gif_animated(4, 4, 1))
    p[13] = 0x77
    assert gif_meta(bytes(p)) == -1
