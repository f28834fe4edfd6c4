"""Exact substring-window dedup (ops/dedup.window_dedup): rolling-hash
identities, boundary/stride handling, and end-to-end spans vs a
brute-force Python oracle over window token-tuples (the repo's convention
for non-SQL-expressible ops, like jaccard_pairs)."""

import re

import numpy as np
import pyarrow as pa

from tangent_ray.ops.dedup import (
    _ROLL_R2,
    _rolling_window_keys,
    _winnow_select,
    merge_window_spans,
    window_dedup,
    window_hash_batch,
)

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


def _ref_winnow(keys, s):
    """Reference winnow, quadratic and per-doc: i selected iff keys[i] is
    the min of SOME s-window of consecutive positions containing i, with
    s - 1 +inf sentinels padding both ends (truncated edge windows)."""
    m = len(keys)
    if s <= 1:
        return set(range(m))
    INF = (1 << 64) - 1
    kp = [INF] * (s - 1) + [int(k) for k in keys] + [INF] * (s - 1)
    sel = set()
    for t in range(m + s - 1):
        wmin = min(kp[t : t + s])
        for j in range(t, t + s):
            if kp[j] == wmin and 0 <= j - (s - 1) < m:
                sel.add(j - (s - 1))
    return sel


def _brute_spans(texts, w, stride=1):
    """Oracle: first (doc, pos) per window TOKEN TUPLE wins among the
    winnow-selected positions; later occurrences' positions merge into
    per-doc spans (gap > w splits). Selection uses the engine's hash via
    the reference winnow (the selection is hash-defined by design); dup
    DETECTION is on raw token tuples, independent of the engine."""
    from tangent_ray.tokenize.text import md5_u64

    seen = {}
    flagged = []  # (doc, pos)
    for d, text in enumerate(texts):
        toks = _tokens(text)
        if len(toks) < w:
            continue
        keys = _rolling_window_keys(
            md5_u64(pa.array(toks, type=pa.string())), w
        )
        sel = _ref_winnow(keys, stride)
        for p in range(len(toks) - w + 1):
            if p not in sel:
                continue
            key = tuple(toks[p : p + w])
            if key in seen:
                flagged.append((d, p))
            else:
                seen[key] = (d, p)
    spans = []
    prev = None
    for d, p in sorted(flagged):
        if prev is not None and prev[0] == d and p <= prev[1] + w:
            spans[-1][2] = p + w  # chain on the previous flagged pos
        else:
            spans.append([d, p, p + w])
        prev = (d, p)
    return [(d, s, e) for d, s, e in spans]


def test_rolling_hash_equals_direct_polynomial():
    rng = np.random.default_rng(7)
    th = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    w = 13
    keys = _rolling_window_keys(th, w)
    assert len(keys) == 200 - w + 1
    # direct per-window recomputation must agree (rolling identity)
    for i in [0, 1, 57, 186, 187]:
        direct = _rolling_window_keys(th[i : i + w], w)
        assert direct[0] == keys[i]
    # second key family is independent of the first
    keys2 = _rolling_window_keys(th, w, _ROLL_R2)
    assert not np.array_equal(keys, keys2)
    # equal windows -> equal keys; one token changed -> different key
    th2 = th.copy()
    th2[60] ^= np.uint64(1)
    keys_m = _rolling_window_keys(th2, w)
    diff = keys_m != keys
    assert diff[60 - w + 1 : 61].all() and not diff[:40].any()


def test_window_hash_batch_positions_and_boundaries():
    b = _docs(["a b c d e", "c d e f", "x"])
    out = window_hash_batch(b, w=3)
    assert out["doc_id"].to_pylist() == [0, 0, 0, 1, 1]
    assert out["pos"].to_pylist() == [0, 1, 2, 0, 1]
    # shared trigram "c d e" (doc0 pos2, doc1 pos0) hashes equal across docs
    k = out["whash"].to_pylist()
    assert k[2] == k[3] and len({k[0], k[1], k[2], k[4]}) == 4
    # stride: winnowed selection matches the reference winnow per doc
    s2 = window_hash_batch(b, w=3, stride=2)
    from tangent_ray.tokenize.text import md5_u64

    want_rows = []
    for d, text in enumerate(["a b c d e", "c d e f", "x"]):
        toks = _tokens(text)
        if len(toks) < 3:
            continue
        keys = _rolling_window_keys(md5_u64(pa.array(toks)), 3)
        want_rows += [(d, p) for p in sorted(_ref_winnow(keys, 2))]
    got_rows = list(zip(s2["doc_id"].to_pylist(), s2["pos"].to_pylist()))
    assert got_rows == want_rows
    # winnow selects >= 1 of every 2 consecutive positions
    assert (0, 0) in got_rows or (0, 1) in got_rows


def test_merge_window_spans_chaining():
    flags = pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "pos": pa.array([0, 2, 9, 30, 5], type=pa.int64()),
        }
    )
    out = merge_window_spans(flags, w=5)
    assert out.to_pydict() == {
        "doc_id": [1, 1, 1, 2],
        "tok_start": [0, 9, 30, 5],
        "tok_end": [7, 14, 35, 10],
    }


def _run(texts, w, stride=1, shards=5):
    import ray
    import ray.data

    ds = ray.data.from_arrow(_docs(texts))
    refs = window_dedup(ds, w=w, stride=stride, shards=shards).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    got = []
    for t in tabs:
        got += list(
            zip(
                t["doc_id"].to_pylist(),
                t["tok_start"].to_pylist(),
                t["tok_end"].to_pylist(),
            )
        )
    return sorted(got)


def test_window_dedup_matches_bruteforce(ray_session):
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    texts = [
        f"intro{i} " + boiler + f" outro{i} unique{i} tail{i} pad{i}"
        for i in range(6)
    ]
    texts.append("completely unrelated document with no repeats at all here")
    texts.append(boiler + " " + boiler)  # self-repeat within one doc
    w = 6
    got = _run(texts, w)
    want = sorted(_brute_spans(texts, w))
    assert got == want
    # the boilerplate is flagged in docs 1..5 but never doc 0 (first owner)
    flagged_docs = {d for d, _, _ in got}
    assert 0 not in flagged_docs and {1, 2, 3, 4, 5} <= flagged_docs


def test_window_dedup_stride_detects_long_dups(ray_session):
    # dup block of length w + stride - 1 = 9 tokens is guaranteed caught
    blk = " ".join(f"b{i}" for i in range(9))
    texts = [
        "p1 p2 p3 " + blk + " q1 q2",
        "r1 " + blk + " s1 s2 s3 s4",
        "no duplicates here at all whatsoever in this one",
    ]
    got = _run(texts, w=7, stride=3)
    want = sorted(_brute_spans(texts, w=7, stride=3))
    assert got == want
    assert any(d == 1 for d, _, _ in got)  # the second copy is flagged


def test_window_dedup_randomized_vs_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(40):
        n = int(rng.integers(0, 25))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # small vocab + short windows => plenty of accidental exact window dups
    for w, stride in [(3, 1), (4, 2)]:
        got = _run(texts, w, stride)
        want = sorted(_brute_spans(texts, w, stride))
        assert got == want, f"w={w} stride={stride}"
