import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.text import split_tokens, tokenize_text


def test_split_tokens_basic():
    texts = pa.array(["Hello, World 42", "", "a b a", None])
    parents, tokens, pos = split_tokens(texts)
    assert tokens.to_pylist() == ["hello", "world", "42", "a", "b", "a"]
    assert parents.tolist() == [0, 0, 0, 2, 2, 2]
    assert pos.tolist() == [1, 2, 3, 1, 2, 3]


def test_tokenize_text_agg():
    texts = pa.array(["the cat and the hat", "cat!"])
    rows, terms, tf, pos1, dl = tokenize_text(texts, stem=False)
    assert dl.tolist() == [5, 1]
    got = {(int(r), t): (int(c), int(p)) for r, t, c, p in
           zip(rows, terms.to_pylist(), tf, pos1)}
    assert got[(0, "the")] == (2, 1)
    assert got[(0, "cat")] == (1, 2)
    assert got[(0, "and")] == (1, 3)
    assert got[(0, "hat")] == (1, 5)
    assert got[(1, "cat")] == (1, 1)


def test_tokenize_text_stemmed():
    texts = pa.array(["running queries faster"])
    _, terms, _, _, _ = tokenize_text(texts, stem=True)
    assert sorted(terms.to_pylist()) == ["faster", "queri", "run"]


def test_empty_batch():
    rows, terms, tf, pos1, dl = tokenize_text(pa.array([], type=pa.string()))
    assert len(rows) == 0 and len(dl) == 0


def test_fingerprint_vectorized_matches_sequential_horner():
    import hashlib
    import re

    import numpy as np
    import pyarrow as pa

    from tangent_ray.ops.textstats import fingerprint_batch

    texts = ["hello world foo bar", "a b c", "", "single", "x y " * 2000]
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    got = fingerprint_batch(b)["fingerprint"].to_pylist()
    B = np.uint64(1000003)
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for w in toks:
                # the op's token hash: md5 bytes [8:16], little-endian
                # (= DuckDB md5_number_lower)
                th = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
                h = h * B + np.uint64(th)
        assert np.int64(h) == got[i]


def test_md5_u64_matches_hashlib():
    import hashlib

    import pyarrow as pa

    from tangent_ray.tokenize.text import md5_u64

    strs = ["", "a", "hello world", "日本語", "x" * 500, "a"]
    got = md5_u64(pa.chunked_array([pa.array(strs[:3]), pa.array(strs[3:])]))
    for s, g in zip(strs, got):
        assert int(g) == int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
    assert len(md5_u64(pa.array([], type=pa.string()))) == 0


def test_bpe_token_count_partial():
    import pyarrow as pa

    from tangent_ray.ops.textstats import bpe_token_count_partial

    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "source": ["a", "a", "b"],
            "text": ["it's 42 fast-paths", "", "hello   world"],
        }
    )
    out = bpe_token_count_partial(batch)
    got = {r["source"]: (r["total_tokens"], r["n_docs"]) for r in out.to_pylist()}
    # "it's 42 fast-paths" -> it, 's, " 42", " fast", "-", paths  = 6
    # ""                    -> 0
    # "hello   world"       -> hello, "  ", " world" = 3
    assert got == {"a": (6, 2), "b": (3, 1)}


def test_lexical_stats_batch():
    import pyarrow as pa

    from tangent_ray.ops.textstats import lexical_stats_batch

    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["the the the cat", "", "a b c d"],
        }
    )
    out = {r["doc_id"]: r for r in lexical_stats_batch(batch).to_pylist()}
    assert set(out) == {1, 3}  # empty doc dropped (undefined ratios)
    assert out[1]["n_words"] == 4 and out[1]["distinct_words"] == 2
    assert out[1]["top_word_fraction"] == 0.75  # "the" 3 of 4
    assert out[1]["type_token_ratio"] == 0.5
    assert out[3]["type_token_ratio"] == 1.0 and out[3]["top_word_fraction"] == 0.25
