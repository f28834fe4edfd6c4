"""Stored-fields sidecar: O(results) text lookup by docid.

Lucene's stored-fields file is the public model: retrieval indexes keep a
doc-keyed copy of the displayable fields so serving a results page never
re-scans the corpus. Here it is docid-SORTED Parquet with small row
groups: a lookup for k docids reads only the row groups whose
[min, max] docid range covers a requested id — O(k · row_group_docs)
rows off disk, independent of corpus size. (The alternative — predicate
pushdown against the original corpus files — degrades to a full scan
whenever the corpus's row groups are large or unsorted by docid, which
is exactly the common case for hash docids.)

Build is one pruned read + ONE distributed sort (the same docid order the
postings already use); the sidecar duplicates the text bytes, the
standard stored-fields trade. Lookup is driver-local pyarrow (footer
metadata + selected row groups) — no Ray job, so a 200-pair snippet call
costs milliseconds, not a per-query streaming scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: row-group granularity: the lookup unit. 256 docs/group keeps a k-doc
#: fetch at ~k*256 rows read while footers stay small (1M docs = 4k groups)
ROW_GROUP_DOCS = 256


def build_stored_fields(
    input_path: str | list[str],
    out_dir: str,
    corpus=None,
    row_group_docs: int = ROW_GROUP_DOCS,
) -> None:
    """Corpus -> docid-sorted (docid, text) Parquet under ``out_dir``.

    One pruned read + one distributed sort; written atomically
    (tmp + rename) so a crashed build never serves a half sidecar."""
    import shutil

    import ray.data

    from tangent_ray.index.build import list_input_files

    if corpus is None:
        from tangent_ray.sources.corpus import TranscriptsCorpus

        corpus = TranscriptsCorpus()

    def emit(batch: pa.Table) -> pa.Table:
        ids = corpus.docids(batch)
        texts = corpus.texts(batch)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table(
            {
                "docid": pa.array(np.asarray(ids, np.int64), pa.int64()),
                "text": texts.cast(pa.string()),
            }
        )

    tmp = out_dir + "__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        ray.data.read_parquet(
            list_input_files(input_path), columns=list(corpus.columns)
        )
        .map_batches(emit, batch_format="pyarrow")
        .sort("docid")
        .write_parquet(tmp, row_group_size=row_group_docs)
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


class StoredFields:
    """Resident handle on a stored-fields dir: per-file row-group docid
    ranges from the footers (loaded once, O(row groups) ints), texts
    fetched per call by row-group-pruned reads."""

    def __init__(self, stored_dir: str):
        self._files: list[str] = [
            os.path.join(stored_dir, f)
            for f in sorted(os.listdir(stored_dir))
            if f.endswith(".parquet")
        ]
        if not self._files:
            raise FileNotFoundError(
                f"no stored fields under {stored_dir!r} — run "
                "build_stored_fields"
            )
        self._ranges: list[tuple[np.ndarray, np.ndarray]] = []
        for f in self._files:
            md = pq.ParquetFile(f).metadata
            col = md.schema.to_arrow_schema().get_field_index("docid")
            mins = np.empty(md.num_row_groups, np.int64)
            maxs = np.empty(md.num_row_groups, np.int64)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(col).statistics
                mins[g], maxs[g] = st.min, st.max
            self._ranges.append((mins, maxs))

    def texts(self, docids) -> dict[int, str]:
        """docid -> text for the requested ids (absent ids omitted).
        Reads only row groups whose [min, max] covers a requested id."""
        q = np.unique(np.asarray(docids, np.int64))
        if not len(q):
            return {}
        out: dict[int, str] = {}
        for f, (mins, maxs) in zip(self._files, self._ranges):
            # row groups are docid-sorted and non-overlapping: group g can
            # hold id x iff mins[g] <= x <= maxs[g]
            g_of = np.searchsorted(mins, q, side="right") - 1
            ok = (g_of >= 0) & (q <= maxs[np.maximum(g_of, 0)])
            groups = np.unique(g_of[ok])
            if not len(groups):
                continue
            pf = pq.ParquetFile(f)
            t = pf.read_row_groups(groups.tolist(), columns=["docid", "text"])
            ids = t["docid"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, q)
            pos_c = np.minimum(pos, len(ids) - 1)
            hit = np.flatnonzero((pos < len(ids)) & (ids[pos_c] == q))
            if not len(hit):
                continue
            texts = t["text"]
            for i in hit:
                out[int(q[i])] = texts[int(pos_c[i])].as_py() or ""
        return out
