"""apply_paragraph_cuts: fixtures + python oracle + the paragraph_dedup ->
apply_paragraph_cuts composition (corpus-wide paragraph dedup end to end)."""

import numpy as np
import pyarrow as pa

from tangent_ray.ops.dedup import apply_paragraph_cuts, paragraph_dedup


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _flags(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "para_idx": pa.array([r[1] for r in rows], type=pa.int64()),
            "keep": pa.array([r[2] for r in rows], type=pa.bool_()),
        }
    )


def _run(doc_tbl, flag_tbl, shards=4):
    import ray
    import ray.data

    out = apply_paragraph_cuts(
        ray.data.from_arrow(doc_tbl),
        ray.data.from_arrow(flag_tbl),
        shards=shards,
    )
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(
        [x.select(["doc_id", "text", "n_cut_paras"]) for x in tabs]
    )
    order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))


def _oracle(texts, flags):
    dropped = {(d, i) for d, i, k in flags if not k}
    out = []
    for d, text in enumerate(texts):
        splits = (text or "").split("\n\n")
        if not any((d, i + 1) in dropped for i in range(len(splits))):
            out.append((d, text, 0))
            continue
        kept = [s for i, s in enumerate(splits) if (d, i + 1) not in dropped]
        out.append((d, "\n\n".join(kept), len(splits) - len(kept)))
    return out


def test_apply_paragraph_cuts_fixtures(ray_session):
    texts = [
        "first\n\nshared\n\nlast",
        "shared\n\nunique one",
        "Untouched  DOC with  odd   spacing!\n\nand CASE",
        "a\n\n\n\nb",  # empty split at idx 2
    ]
    flags = [
        (1, 1, False),  # doc1 loses "shared"
        (0, 2, True),   # keep flag: no effect
        (3, 3, False),  # doc3 loses "b" (idx 3 counts the empty split)
    ]
    got = _run(_docs(texts), _flags(flags))
    want = _oracle(texts, flags)
    assert list(
        zip(
            got["doc_id"].to_pylist(),
            got["text"].to_pylist(),
            got["n_cut_paras"].to_pylist(),
        )
    ) == want
    # untouched docs byte-identical, even sharing shards (shards=1)
    got1 = _run(_docs(texts), _flags(flags), shards=1)
    assert got1["text"].to_pylist()[2] == texts[2]
    assert got1["text"].to_pylist()[1] == "unique one"
    assert got1["text"].to_pylist()[3] == "a\n\n"


def test_stale_flags_raise(ray_session):
    import pytest

    # para_idx beyond the doc's split count = flags from another corpus
    with pytest.raises(Exception, match="out of range"):
        _run(_docs(["a\n\nb"]), _flags([(0, 5, False)]))
    with pytest.raises(Exception, match="unknown doc id"):
        _run(_docs(["a\n\nb"]), _flags([(42, 1, False)]))


def test_paragraph_dedup_then_cuts_e2e(ray_session):
    import ray
    import ray.data

    texts = [
        "intro zero\n\nboilerplate legal text\n\nbody zero",
        "boilerplate legal text\n\nbody one",
        "body one\n\nboilerplate legal text\n\nbody two",
        None,
    ]
    doc_tbl = _docs(texts)
    flags_ds = paragraph_dedup(ray.data.from_arrow(doc_tbl), shards=3)
    flags_tab = pa.concat_tables(
        [t for t in ray.get(flags_ds.to_arrow_refs()) if t.num_rows]
    )
    got = _run(doc_tbl, flags_tab)
    flag_rows = list(
        zip(
            flags_tab["doc_id"].to_pylist(),
            flags_tab["para_idx"].to_pylist(),
            flags_tab["keep"].to_pylist(),
        )
    )
    want = _oracle(texts, flag_rows)
    assert list(
        zip(
            got["doc_id"].to_pylist(),
            got["text"].to_pylist(),
            got["n_cut_paras"].to_pylist(),
        )
    ) == want
    # doc0 keeps everything; doc1 loses the boilerplate; doc2 loses
    # boilerplate AND its repeat of "body one"; null doc passes through
    assert got["n_cut_paras"].to_pylist() == [0, 1, 2, 0]
    assert got["text"].to_pylist()[2] == "body two"
    assert got["text"].to_pylist()[3] is None
    # a second dedup pass over the cut corpus flags nothing
    again = paragraph_dedup(
        ray.data.from_arrow(got.select(["doc_id", "text"])), shards=3
    )
    t2 = pa.concat_tables(
        [t for t in ray.get(again.to_arrow_refs()) if t.num_rows]
    )
    assert t2.filter(
        pa.compute.equal(t2["keep"], False)
    ).num_rows == 0
