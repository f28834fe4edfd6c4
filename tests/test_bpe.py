"""BPE tokenizer training: differential oracle (incremental trainer vs the
recount-from-scratch reference), distributed word_counts vs a DuckDB twin,
top_m cap exactness, and encode consistency."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pytest

from tangent_ray.ops.bpe import (
    EOW,
    BPEEncode,
    bpe_encode_stats,
    encode_word,
    train_bpe,
    train_bpe_naive,
    train_bpe_pipeline,
    word_counts,
)


def _wf(pairs) -> pa.Table:
    return pa.table(
        {
            "word": pa.array([w for w, _ in pairs], pa.string()),
            "cnt": pa.array([c for _, c in pairs], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# trainer: differential vs the naive reference
# ---------------------------------------------------------------------------


def test_train_matches_naive_textbook_example():
    # the Sennrich paper's flavor of example: low/lower/newest/widest
    wf = _wf([("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    m_inc, v_inc = train_bpe(wf, 10)
    m_ref, v_ref = train_bpe_naive(wf, 10)
    assert m_inc == m_ref
    assert v_inc == v_ref
    # "est</w>" must be learned: newest+widest share the suffix 9 times
    joined = {a + b for a, b in m_inc}
    assert "est" + EOW in joined or ("es" in joined and "t" + EOW in joined)


@pytest.mark.parametrize("seed", range(8))
def test_train_matches_naive_random(seed):
    rng = random.Random(seed)
    alphabet = "abcdef"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(
            1, 50
        )
        for _ in range(rng.randint(5, 60))
    }
    wf = _wf(sorted(words.items()))
    n = rng.randint(1, 40)
    assert train_bpe(wf, n) == train_bpe_naive(wf, n)


def test_train_deterministic_tie_break():
    # two pairs with identical counts: lexicographically smaller pair wins
    wf = _wf([("ab", 3), ("cd", 3)])
    merges, _ = train_bpe(wf, 1, min_pair_freq=2)
    assert merges == [("a", "b")]


def test_train_stops_below_min_pair_freq():
    wf = _wf([("abc", 1), ("xyz", 1)])
    merges, vocab = train_bpe(wf, 10, min_pair_freq=2)
    assert merges == []
    assert set("abcxyz") | {EOW} == set(vocab)


def test_empty_and_null_words_ignored():
    wf = _wf([("", 9), ("aa", 4)])
    merges, _ = train_bpe(wf, 2)
    # ("a","</w>") and ("a","a") tie at 4; "</w>" sorts before "a"
    assert merges[0] == ("a", EOW)
    assert train_bpe(wf, 2) == train_bpe(_wf([("aa", 4)]), 2)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def test_encode_word_reproduces_training_segmentation():
    # after training, re-encoding each training word with the learned ranks
    # must reproduce the trained symbol sequence (greedy-by-rank == the
    # merge history, a published BPE property)
    wf = _wf([("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges, _ = train_bpe(wf, 10, min_pair_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    # independently replay the merge history on each word
    for word in ["low", "lower", "newest", "widest"]:
        sym = list(word) + [EOW]
        for a, b in merges:
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            sym = out
        assert encode_word(word, ranks) == tuple(sym)


def test_encode_unseen_word_falls_back_to_chars():
    ranks = {("a", "b"): 0}
    assert encode_word("zq", ranks) == ("z", "q", EOW)
    assert encode_word("ab", ranks) == ("ab", EOW)


# ---------------------------------------------------------------------------
# distributed stages
# ---------------------------------------------------------------------------


def _corpus_table():
    docs = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "low lower lowest",
        "newest widest the the the",
        "",
        # underscore + digits: exercises the shared [^a-z0-9]+ splitter
        # (underscore is a SEPARATOR — snake_case splits into two words)
        "snake_case ids like user_42 split_apart",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


def test_word_counts_duckdb_twin(ray_session):
    import ray.data

    tab = _corpus_table()
    ds = ray.data.from_arrow(tab).repartition(3)
    got = pa.concat_tables(
        [t for t in __import__("ray").get(
            word_counts(ds).to_arrow_refs()) if t.num_rows]
    )
    got = got.sort_by([("word", "ascending")])
    con = duckdb.connect()
    con.register("docs", tab)
    want = con.execute(
        """
        SELECT tok AS word, count(*)::BIGINT AS cnt
        FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                 AS tok FROM docs
        ) WHERE tok <> '' GROUP BY 1 ORDER BY 1
        """
    ).arrow()
    assert got.equals(want.cast(got.schema))


def test_word_counts_min_freq_and_top_m_exact(ray_session):
    import ray.data

    tab = _corpus_table()
    ds = ray.data.from_arrow(tab).repartition(4)
    capped = word_counts(ds, min_freq=2, top_m=3)
    assert isinstance(capped, pa.Table)
    # independent full sort
    full = pa.concat_tables(
        [t for t in __import__("ray").get(
            word_counts(ds, min_freq=2).to_arrow_refs()) if t.num_rows]
    )
    rows = sorted(
        zip(full["word"].to_pylist(), full["cnt"].to_pylist()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    assert list(zip(capped["word"].to_pylist(), capped["cnt"].to_pylist())) == rows
    assert all(c >= 2 for c in capped["cnt"].to_pylist())


def test_pipeline_and_encode_stats(ray_session):
    import ray
    import ray.data

    tab = _corpus_table()
    ds = ray.data.from_arrow(tab).repartition(2)
    merges, vocab = train_bpe_pipeline(ds, num_merges=16, min_pair_freq=2)
    assert merges and EOW in vocab
    # distributed result == training the same dictionary on the driver
    wc_full = pa.concat_tables(
        [t for t in ray.get(word_counts(ds).to_arrow_refs()) if t.num_rows]
    )
    assert (merges, vocab) == train_bpe(wc_full, 16, min_pair_freq=2)

    stats = (
        bpe_encode_stats(ds, merges, concurrency=(1, 2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    ranks = {p: i for i, p in enumerate(merges)}
    texts = tab["text"].to_pylist()
    for doc_id, text in enumerate(texts):
        import re

        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        want_pieces = sum(len(encode_word(w, ranks)) for w in words)
        assert stats.loc[doc_id, "n_words"] == len(words)
        assert stats.loc[doc_id, "n_pieces"] == want_pieces
    # empty doc: zero words, ratio 0
    assert stats.loc[4, "pieces_per_word"] == 0.0


def test_encode_actor_cache_consistency():
    # same batch twice through one actor instance: cache must not change
    # results
    merges = [("t", "h"), ("th", "e"), ("the", EOW)]
    import ray

    enc = BPEEncode.__new__(BPEEncode)
    enc.ranks = {p: i for i, p in enumerate(merges)}
    enc.id_col, enc.text_col = "doc_id", "text"
    enc._cache = {}
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the the them", "theory"], pa.string()),
        }
    )
    first = enc(batch)
    second = enc(batch)
    assert first.equals(second)
    # "the" -> 1 piece; "them" -> the+m+</w> = 3; "theory" -> the+o+r+y+</w>
    assert first["n_pieces"].to_pylist() == [1 + 1 + 3, 5]
