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
