"""Seeded differential fuzz for the round-3 curation ops: random
adversarial corpora (unicode, CRLF, blank-line runs, bullets, ellipses,
repeated lines/paragraphs, nulls, numbers-only docs) checked against the
exact DuckDB twins — the same hardening pattern as the hash_join fuzz."""

import duckdb
import numpy as np
import pyarrow as pa

from tangent_ray.ops.textstats import gopher_filter_batch, repetition_batch
from tangent_ray.ops.dedup import paragraph_hash_batch
from tests.test_gopher import _gopher_sql
from tests.test_repetition import COLS as REP_COLS
from tests.test_repetition import REPETITION_SQL

WORDS = [
    "the", "and", "to", "of", "with", "data", "pipeline", "ray", "über",
    "naïve", "tokyo", "東京", "x", "42", "3.14", "a-b", "it's", "#tag",
    "...", "…", "-", "*", "•", "", " ", "\t",
]


def _gen_doc(rng):
    kind = rng.integers(0, 8)
    if kind == 0:
        return None
    if kind == 1:
        return ""
    n_lines = int(rng.integers(1, 8))
    lines = []
    for _ in range(n_lines):
        n = int(rng.integers(0, 15))
        line = " ".join(rng.choice(WORDS, size=n)) if n else ""
        if rng.random() < 0.2:
            line = "- " + line
        if rng.random() < 0.2:
            line = line + "..."
        lines.append(line)
    if rng.random() < 0.3 and lines:
        lines.append(lines[0])  # duplicate line
    sep = "\n\n" if rng.random() < 0.4 else "\n"
    doc = sep.join(lines)
    if rng.random() < 0.15:
        doc = doc + "\n\n" + doc  # duplicate paragraph block
    if rng.random() < 0.1:
        doc = doc.replace("\n", "\r\n")
    return doc


def _corpus(seed, n=120):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array([_gen_doc(rng) for _ in range(n)],
                             type=pa.string()),
        }
    )


def _duck(tbl, sql):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql).arrow()


def test_repetition_fuzz_vs_twin():
    for seed in range(6):
        tbl = _corpus(seed)
        got = repetition_batch(tbl).select(REP_COLS)
        want = _duck(tbl, REPETITION_SQL).select(REP_COLS)
        assert got.to_pydict() == want.to_pydict(), f"seed {seed}"


def test_gopher_fuzz_vs_twin():
    for seed in range(6):
        tbl = _corpus(seed + 100)
        got = gopher_filter_batch(tbl)
        want = _duck(tbl, _gopher_sql())
        assert got["fail_mask"].to_pylist() == want["fail_mask"].to_pylist(), (
            f"seed {seed}"
        )
        assert got["n_words"].to_pylist() == want["n_words"].to_pylist()


PARA_SQL = """
WITH p0 AS (
  SELECT doc_id, ps[i] AS para, i AS para_idx
  FROM (SELECT doc_id,
               string_split(coalesce(text, ''), chr(10) || chr(10)) AS ps
        FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(ps))) AS i) gi
  WHERE ps[i] <> ''
)
SELECT doc_id, para_idx FROM p0 ORDER BY doc_id, para_idx
"""


def test_paragraph_explode_fuzz_vs_twin():
    """paragraph_hash_batch's explode (ids + indices) matches SQL exactly;
    hash equality is checked structurally: same text <=> same 128-bit key
    within the sample."""
    for seed in range(6):
        tbl = _corpus(seed + 200)
        out = paragraph_hash_batch(tbl)
        want = _duck(tbl, PARA_SQL)
        assert out["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert out["para_idx"].to_pylist() == [
            int(x) for x in want["para_idx"].to_pylist()
        ]
        # structural hash check against the actual paragraph strings
        texts = tbl["text"].to_pylist()
        paras = []
        for d, i in zip(out["doc_id"].to_pylist(),
                        out["para_idx"].to_pylist()):
            paras.append((texts[d] or "").split("\n\n")[i - 1])
        key = list(zip(out["phash"].to_pylist(), out["phash2"].to_pylist()))
        by_text = {}
        for p, k in zip(paras, key):
            by_text.setdefault(p, set()).add(k)
        # same text -> one key
        assert all(len(v) == 1 for v in by_text.values())
        # distinct texts -> distinct keys (128-bit: collision ~ impossible)
        all_keys = [next(iter(v)) for v in by_text.values()]
        assert len(set(all_keys)) == len(all_keys)


def test_mix_resample_fuzz_vs_twin(ray_session):
    import ray
    import ray.data

    from tests.test_mix_resample import COLS, _twin

    from tangent_ray.ops.curation import source_mix_resample

    rng = np.random.default_rng(31)
    for seed in range(4):
        n = 80
        srcs = [f"s{int(x)}" for x in rng.integers(0, 5, n)]
        texts = [
            " ".join(rng.choice(WORDS, size=int(rng.integers(0, 20))))
            for _ in range(n)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "source": pa.array(srcs, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        weights = {f"s{i}": float(w) for i, w in
                   enumerate(rng.integers(0, 4, 5))}
        if sum(weights.values()) == 0:
            weights["s0"] = 1.0
        ds = ray.data.from_arrow(tbl)
        refs = source_mix_resample(ds, weights, max_epochs=7.0).to_arrow_refs()
        import ray as _r

        tabs = [t for t in _r.get(refs) if t.num_rows]
        if tabs:
            got = pa.concat_tables([t.select(COLS) for t in tabs])
            order = np.lexsort(
                (
                    got["epoch"].to_numpy(zero_copy_only=False),
                    got["doc_id"].to_numpy(zero_copy_only=False),
                )
            )
            got = got.take(pa.array(order)).to_pydict()
        else:
            got = {c: [] for c in COLS}
        want = _twin(tbl, weights, max_epochs=7.0).to_pydict()
        assert got == want, f"seed {seed} weights {weights}"
        rng = np.random.default_rng(31 + seed + 1)
