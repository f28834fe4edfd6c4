"""Span-cut application (ops/dedup.apply_span_cuts): hand fixtures, a
python oracle, and the window_dedup -> apply_span_cuts composition (the
full Lee-et-al substring-dedup pipeline) over fixture corpora."""

import re

import numpy as np
import pyarrow as pa

from tangent_ray.ops.dedup import apply_span_cuts, window_dedup

TOK = re.compile(r"[^a-z0-9]+")


def _tokens(text):
    return [t for t in TOK.split((text or "").lower()) if t]


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _spans(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "tok_start": pa.array([r[1] for r in rows], type=pa.int64()),
            "tok_end": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def _run(doc_tbl, span_tbl, shards=5):
    import ray
    import ray.data

    out = apply_span_cuts(
        ray.data.from_arrow(doc_tbl),
        ray.data.from_arrow(span_tbl),
        shards=shards,
    )
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(
        [x.select(["doc_id", "text", "n_cut_tokens"]) for x in tabs]
    )
    order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))


def _oracle(texts, spans):
    out = []
    for d, text in enumerate(texts):
        toks = _tokens(text)
        cut = np.zeros(len(toks), bool)
        touched = False
        for sd, lo, hi in spans:
            if sd == d:
                touched = True
                cut[max(0, lo) : min(len(toks), hi)] = True
        if not touched:
            out.append((d, text, 0))
        else:
            kept = [t for t, c in zip(toks, cut) if not c]
            out.append((d, " ".join(kept), int(cut.sum())))
    return out


def test_apply_span_cuts_fixtures(ray_session):
    texts = [
        "Alpha beta GAMMA delta epsilon zeta",  # cut middle
        "one two three",  # untouched -> byte-identical original
        "a b c d",  # fully cut
        "x y z w v",  # two disjoint spans
    ]
    spans = [(0, 2, 4), (2, 0, 4), (3, 0, 1), (3, 3, 9)]  # hi=9 clips
    got = _run(_docs(texts), _spans(spans))
    want = _oracle(texts, spans)
    assert list(
        zip(
            got["doc_id"].to_pylist(),
            got["text"].to_pylist(),
            got["n_cut_tokens"].to_pylist(),
        )
    ) == want
    # untouched doc keeps ORIGINAL bytes (case and all)
    assert got["text"].to_pylist()[1] == "one two three"
    # touched docs come back normalized-token-joined
    assert got["text"].to_pylist()[0] == "alpha beta epsilon zeta"
    assert got["text"].to_pylist()[2] == ""


def test_prefilter_output_identical(ray_session):
    """prefilter=True (Bloom split: untouched stream + shuffled rebuild)
    must produce exactly the same rows as the plain path."""
    import ray
    import ray.data

    texts = [f"unique{i} words here for doc {i} " * 3 for i in range(40)]
    texts[7] = "cut this span right here now"
    texts[23] = None
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(40), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    spans = _spans([(7, 1, 3), (12, 0, 2)])
    plain = _run(tbl, spans, shards=3)
    out = apply_span_cuts(
        ray.data.from_arrow(tbl), ray.data.from_arrow(spans),
        shards=3, prefilter=True,
    )
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    pre = pa.concat_tables(
        [x.select(["doc_id", "text", "n_cut_tokens"]) for x in tabs]
    )
    order = np.argsort(pre["doc_id"].to_numpy(zero_copy_only=False))
    pre = pre.take(pa.array(order))
    assert pre.to_pydict() == plain.to_pydict()


def test_untouched_docs_byte_identical_even_sharing_a_shard(ray_session):
    """shards=1 forces EVERY doc into the spanned doc's shard: docs with
    no spans must still come back byte-identical (case, punctuation,
    whitespace), and a NULL-text doc must pass through as a doc row."""
    texts = ["cut me now please", "Hello, World!  MIXED case\tkeep-me", None]
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = _run(tbl, _spans([(0, 1, 3)]), shards=1)
    assert got["text"].to_pylist() == [
        "cut please",
        "Hello, World!  MIXED case\tkeep-me",
        None,
    ]
    assert got["n_cut_tokens"].to_pylist() == [2, 0, 0]


def test_apply_span_cuts_unknown_doc_raises(ray_session):
    import pytest
    import ray

    with pytest.raises(Exception, match="unknown doc id"):
        _run(_docs(["a b"]), _spans([(99, 0, 1)]))
    _ = ray


def test_window_dedup_then_cut_roundtrip(ray_session):
    """The composed pipeline: after cutting, re-running window_dedup finds
    no remaining cross-doc duplicate windows (the fixture has no dup
    shorter than w that a cut could newly create)."""
    import ray
    import ray.data

    boiler = "the quick brown fox jumps over the lazy dog"
    texts = [
        f"u{i}a u{i}b " + boiler + f" t{i}c t{i}d t{i}e" for i in range(5)
    ]
    w = 5
    doc_tbl = _docs(texts)
    spans_ds = window_dedup(ray.data.from_arrow(doc_tbl), w=w, shards=3)
    spans_tab = pa.concat_tables(
        [t for t in ray.get(spans_ds.to_arrow_refs()) if t.num_rows]
    )
    got = _run(doc_tbl, spans_tab)
    # doc 0 keeps its boilerplate; docs 1..4 lose exactly the dup span
    assert got["n_cut_tokens"].to_pylist()[0] == 0
    assert all(n > 0 for n in got["n_cut_tokens"].to_pylist()[1:])
    # oracle agreement
    spans_rows = list(
        zip(
            spans_tab["doc_id"].to_pylist(),
            spans_tab["tok_start"].to_pylist(),
            spans_tab["tok_end"].to_pylist(),
        )
    )
    want = _oracle(texts, spans_rows)
    assert list(
        zip(
            got["doc_id"].to_pylist(),
            got["text"].to_pylist(),
            got["n_cut_tokens"].to_pylist(),
        )
    ) == want
    # second pass over the cut corpus is dup-free
    again = window_dedup(
        ray.data.from_arrow(got.select(["doc_id", "text"])), w=w, shards=3
    )
    remaining = sum(
        t.num_rows for t in ray.get(again.to_arrow_refs())
    )
    assert remaining == 0
