"""Resumable partitioned-Parquet sink for curation pipelines.

The output-side counterpart of the index build's manifest-resumable
partials (`index/build.py`): input files group into contiguous partitions,
each partition runs the caller's pipeline over ONLY its files and lands in
its own directory via write-to-tmp + atomic rename, with a lineage
manifest (input paths + sizes + mtime_ns + the pipeline tag). A re-run
skips every partition whose manifest still matches its inputs — a failed
100 TB job resumes from the first unfinished partition instead of
restarting, and no partition is ever half-visible (the rename is atomic).

Partitions execute sequentially on the driver; parallelism lives INSIDE
each partition's Ray pipeline (each is a full streaming Dataset job), so
the restart granularity knob (``partitions``) trades resume cost against
per-partition scheduling overhead.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from tangent_ray.index.build import list_input_files, plan_partitions

MANIFEST = "_MANIFEST.json"


def _lineage(files: list[str], tag: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(tag.encode())
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def write_resumable(
    pipeline,
    input_path,
    out_dir: str,
    partitions: int = 16,
    columns: list[str] | None = None,
    tag: str = "",
) -> dict:
    """Run ``pipeline(ds)`` over each input partition and write its result
    under ``out_dir/part-NNNN/``; skip partitions whose manifest matches
    their inputs. ``pipeline`` must be a PURE function of its input
    Dataset (change ``tag`` when its logic changes — the tag is part of
    the lineage, so stale outputs rebuild). Returns
    ``{"written": [...], "skipped": [...], "removed": [...], "rows": n}``."""
    import ray.data

    files = list_input_files(input_path)
    if not files:
        raise ValueError(f"write_resumable: no parquet under {input_path!r}")
    os.makedirs(out_dir, exist_ok=True)
    written, skipped, total = [], [], 0
    parts = plan_partitions(files, partitions)
    # orphans from a previous run with a different partition count (or
    # crashed half-writes) would otherwise stay half-visible to any
    # out_dir/*/*.parquet reader — remove anything this run will not own
    own = {f"part-{i:04d}" for i in range(len(parts))}
    removed = []
    for entry in sorted(os.listdir(out_dir)):
        base = entry[:-4] if entry.endswith(".tmp") else entry
        if base.startswith("part-") and base not in own:
            shutil.rmtree(os.path.join(out_dir, entry))
            removed.append(entry)
    for i, chunk in enumerate(parts):
        name = f"part-{i:04d}"
        pdir = os.path.join(out_dir, name)
        mpath = os.path.join(pdir, MANIFEST)
        token = _lineage(chunk, tag)
        if os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
            except (OSError, json.JSONDecodeError):
                m = {}
            if m.get("lineage") == token:
                # a half-written .tmp from a crashed later attempt is junk
                if os.path.exists(pdir + ".tmp"):
                    shutil.rmtree(pdir + ".tmp")
                skipped.append(name)
                total += int(m.get("rows", 0))
                continue
        if os.path.exists(pdir):
            # stale output (inputs or pipeline changed), or a manifest-less
            # leftover from a crash mid-rebuild: clear it, else the final
            # os.replace would fail ENOTEMPTY and wedge the sink
            shutil.rmtree(pdir)
        tmp = pdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds = ray.data.read_parquet(chunk, columns=columns)
        out = pipeline(ds)
        out.write_parquet(tmp)
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        with open(os.path.join(tmp, MANIFEST), "w") as fh:
            json.dump(
                {"lineage": token, "rows": rows, "inputs": sorted(chunk)}, fh
            )
        os.replace(tmp, pdir)
        written.append(name)
        total += rows
    return {"written": written, "skipped": skipped, "removed": removed,
            "rows": total}
