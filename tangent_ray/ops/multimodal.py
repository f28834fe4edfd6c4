"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The decode/feature kernels themselves are STUBBED (image/audio libraries are
not in this container — the deterministic fake derives features from the
payload bytes so the Ray-side plumbing is fully testable), but the schema,
actor signature, batching, and output layout are real: this is exactly the
shape a production decode stage has (actor pool, small batches for large
binary rows, ``batch_format="pyarrow"`` to avoid pandas object-dtype copies).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media rows (pure function of index)."""
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [
            hashlib.blake2b(f"media{i}".encode(), digest_size=32).digest() * (1 + i % 7)
            for i in range(n)
        ],
        "mime": ["application/octet-stream"] * n,
        "width": [(i * 37) % 1920 for i in range(n)],
        "height": [(i * 53) % 1080 for i in range(n)],
        "duration_ms": [(i * 997) % 60000 for i in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class MediaDecode:
    """Actor-pool decode/feature stage.

    ``mode="fake"`` (default here): deterministic 8-dim feature from the
    payload bytes — keeps the pipeline testable end-to-end.
    ``mode="real"``: raises NotImplementedError — the container has no
    image/audio codecs; wire Pillow/torchaudio here in production.
    """

    def __init__(self, mode: str = "fake"):
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this container; use mode='fake' for plumbing tests"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), 8), dtype=np.float32)
        sizes = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            sizes[i] = len(p or b"")
            d = hashlib.blake2b(p or b"", digest_size=32).digest()
            feats[i] = np.frombuffer(d, dtype=np.uint32)[:8] / np.float32(2**32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, type=pa.int64()),
                "feature": pa.array(list(feats), type=pa.list_(pa.float32(), 8)),
            }
        )


def decode_features(ds, concurrency: int | tuple[int, int] = (1, 2), batch_size: int = 16):
    """Run the decode stage: small batches (large binary rows), actor pool."""
    return ds.map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class MediaResize:
    """Actor-pool resize stage (images): metadata-real, pixel-op stubbed.

    Real implementation would decode -> resample -> re-encode per batch;
    the fake keeps output schema + aspect-ratio math exact so downstream
    stages are testable.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224, mode: str = "fake"):
        self.tw, self.th, self.mode = target_w, target_h, mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("no image codecs in this container")
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        scale = np.minimum(
            self.tw / np.maximum(w, 1), self.th / np.maximum(h, 1)
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array(np.maximum(1, (w * scale)).astype(np.int32)),
                "height": pa.array(np.maximum(1, (h * scale)).astype(np.int32)),
                "scale": pa.array(scale.astype(np.float64)),
            }
        )


def frame_sample(ds, every_ms: int = 1000):
    """One output row per sampled frame of each video (flat expansion).

    The frame payload itself is stubbed (a deterministic digest of
    (media_id, frame_idx)); the row explosion, schema, and batch shape are
    the real thing a frame-sampling stage produces.
    """

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        kinds = batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_numpy(zero_copy_only=False)
        out_id: list[int] = []
        out_fi: list[int] = []
        out_ts: list[int] = []
        out_d: list[bytes] = []
        for i, kind in enumerate(kinds):
            if kind != "video":
                continue
            n_frames = max(1, int(durs[i]) // every_ms)
            for fi in range(n_frames):
                out_id.append(int(ids[i]))
                out_fi.append(fi)
                out_ts.append(fi * every_ms)
                out_d.append(
                    hashlib.blake2b(f"{ids[i]}:{fi}".encode(), digest_size=16).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_fi, type=pa.int32()),
                "ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame_digest": pa.array(out_d, type=pa.binary()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=16)
