"""The driver-contract pipelines: ``queries()`` callables + oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2 (or the training-data
extension set) run over the driver's Parquet tables at ``sf_dir``; the paired
SQL in ``ORACLE_SQL`` computes the same result in DuckDB over the same tables
(views pre-registered by the driver). Column names/types match exactly; float
columns are rounded identically on both sides.

Tokenizer parity: every oracle-checked pipeline uses ``SQL_PARITY_CONFIG``
(lowercase + split on ``[^a-z0-9]+``, no stemming, no math) — the SQL twin is
``unnest(string_split_regex(lower(text), '[^a-z0-9]+')) ... <> ''``.

Engine-only pipelines (math tuple extraction, formula top-k, the transcripts
flagship) have no SQL twin — the driver records a rows-only check and pytest
holds them to the pure-Python oracle instead (tests/test_build_query.py).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.config import EngineConfig, SQL_PARITY_CONFIG
from tangent_ray.util import round_half_away

# fixed parameters shared by Ray pipelines and their SQL twins
BM25_QUERY_TERMS = ["spark", "hash", "join"]
BM25_K = 20
BOOL_TERMS = ["window", "stream", "merge"]
SHINGLE_N = 5
KNN_QUERY_VEC_ID = 0
KNN_K = 10

_TMP_ROOT = "/tmp/tangent_ray_cache"


def _collect(ds) -> pa.Table:
    """Materialize a (small) Dataset result into one Arrow table.

    Blocks may surface as pandas DataFrames on some Ray versions (e.g. after
    a ``map_groups(..., batch_format="pandas")`` stage); normalize them."""
    import pandas as pd

    import ray

    tables = [
        pa.Table.from_pandas(t, preserve_index=False)
        if isinstance(t, pd.DataFrame)
        else t
        for t in ray.get(ds.to_arrow_refs())
    ]
    tables = [t for t in tables if t.num_rows > 0] or tables[:1]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")



def _pool() -> tuple[int, int]:
    """Cluster-sized actor-pool bound (see util.actor_pool)."""
    from tangent_ray.util import actor_pool

    return actor_pool()


def _doc_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _triples(sf_dir: str):
    """(term, doc_id, tf, dl, pos1) rows via the real tokenizer stage."""
    import ray.data

    from tangent_ray.sources.corpus import DocumentsCorpus
    from tangent_ray.tokenize.batch import TokenizeBatch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(
        TokenizeBatch,
        fn_constructor_args=(SQL_PARITY_CONFIG, DocumentsCorpus()),
        batch_format="pyarrow",
        concurrency=_pool(),
        zero_copy_batch=True,
    )


def _cast64(t: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        i = t.column_names.index(c)
        t = t.set_column(i, c, pc.cast(t[c], pa.int64()))
    return t


def _lineage_token(*paths: str) -> str:
    """Short content-lineage token (name, size, mtime of every file) so
    /tmp index caches key on the DATA, not just the path — a regenerated
    corpus at the same path must not serve a stale index."""
    import glob as _glob

    h = hashlib.blake2b(digest_size=6)
    for p in paths:
        files = (
            sorted(_glob.glob(os.path.join(p, "*")))
            if os.path.isdir(p)
            else [p]
        )
        for f in files:
            st = os.stat(f)
            # nanosecond mtime: whole-second truncation let a same-second
            # regeneration with identical sizes serve a stale cached index
            h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def _build_locked(out: str, build_fn) -> str:
    """Run ``build_fn`` once per cache dir under an exclusive file lock —
    two concurrent processes (check_oracle + bench) must not both
    build_index into the same /tmp directory."""
    import fcntl

    os.makedirs(_TMP_ROOT, exist_ok=True)
    with open(out + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if not os.path.exists(os.path.join(out, "manifest.json")):
            build_fn()
    return out


def _docs_index(sf_dir: str) -> str:
    """Build (once, cached per corpus lineage) the documents BM25 index."""
    import dataclasses

    from tangent_ray.index.build import build_index
    from tangent_ray.sources.corpus import DocumentsCorpus

    src = _doc_path(sf_dir)
    out = os.path.join(_TMP_ROOT, f"docs2-{_lineage_token(src)}")
    return _build_locked(
        out,
        lambda: build_index(
            src, out,
            dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
            DocumentsCorpus(),
        ),
    )


# ---------------------------------------------------------------------------
# oracle-checked pipelines


def q_term_doc_tf(sf_dir: str):
    t = _collect(_triples(sf_dir).select_columns(["term", "docid", "tf"]))
    t = t.rename_columns(["term", "doc_id", "tf"])
    return _cast64(t, ["doc_id", "tf"])


def q_term_stats(sf_dir: str):
    """Per-term df/cf aggregated from the BUILT index segments — validates
    the shuffle+encode path against SQL ground truth, not just the
    tokenizer."""
    import ray.data
    from ray.data.aggregate import Sum

    idx = _docs_index(sf_dir)
    import glob

    files = sorted(glob.glob(os.path.join(idx, "partials", "*", "terms", "*.parquet")))
    seg = ray.data.read_parquet(files, columns=["term", "kind", "df", "cf"])
    seg = seg.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)), batch_format="pyarrow"
    )
    out = seg.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
    )
    return _cast64(_collect(out), ["df", "cf"])


def q_doc_stats(sf_dir: str):
    from ray.data.aggregate import Sum

    tr = _triples(sf_dir)
    out = tr.groupby("docid").aggregate(Sum("tf", alias_name="dl"))
    t = _collect(out).rename_columns(["doc_id", "dl"])
    return _cast64(t, ["doc_id", "dl"])


def q_first_positions(sf_dir: str):
    t = _collect(_triples(sf_dir).select_columns(["term", "docid", "pos1"]))
    t = t.rename_columns(["term", "doc_id", "first_pos"])
    return _cast64(t, ["doc_id", "first_pos"])


def q_bm25_topk(sf_dir: str):
    """BM25 through BOTH engine paths — the per-call actor pool AND the
    resident 2-shard ``ShardedEngine`` (query/engine.py) — raising if they
    ever diverge, so the one driver slot oracle-checks the pool's values
    and the resident engine's identity with it in the same breath."""
    from tangent_ray.query.engine import ShardedEngine
    from tangent_ray.query.scorer import search

    idx = _docs_index(sf_dir)
    res = _collect(search(
        [{"query_id": "q", "kind": "text", "text": " ".join(BM25_QUERY_TERMS)}],
        idx,
        topk=BM25_K,
    ))
    eng = ShardedEngine(idx, n_shards=2)
    try:
        res2 = eng.search(
            [{"query_id": "q", "kind": "text",
              "text": " ".join(BM25_QUERY_TERMS), "topk": BM25_K}]
        )
    finally:
        eng.shutdown()
    cols = ["docid", "score"]
    if not res.select(cols).cast(res2.select(cols).schema).equals(
        res2.select(cols)
    ):
        raise AssertionError("ShardedEngine diverged from actor-pool search")
    return pa.table(
        {
            "doc_id": res["docid"],
            "score": pa.array(
                round_half_away(res["score"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


def q_boolean_and(sf_dir: str):
    """Conjunctive match: docs containing ALL of BOOL_TERMS."""
    tr = _triples(sf_dir)
    want = set(BOOL_TERMS)

    def per_batch(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b["term"], value_set=pa.array(sorted(want)))
        return b.filter(mask).select(["docid", "term"])

    from ray.data.aggregate import Count

    hits = tr.map_batches(per_batch, batch_format="pyarrow")
    # (docid, term) pairs are distinct already (tokenizer aggregates per doc)
    cnt = hits.groupby("docid").aggregate(Count(alias_name="nterms"))
    t = _collect(cnt)
    t = t.filter(pc.equal(t["nterms"], len(want))).select(["docid"])
    return _cast64(t.rename_columns(["doc_id"]), ["doc_id"])


def q_dedup_exact(sf_dir: str):
    """Exact dedup — and the JSONL-ingestion front door rides the same
    oracle row: the corpus is round-tripped documents -> JSONL shards ->
    ``ingest_corpus`` -> canonical Parquet (``_jsonl_roundtrip``), the
    round-trip is asserted row-identical to the source, and dedup runs
    over the INGESTED copy — so the gate's hash pins ingestion losing
    nothing and keying deterministically, without spending a second
    driver slot."""
    import ray.data

    from tangent_ray.ops.dedup import exact_dedup

    ingested = _jsonl_roundtrip(sf_dir)
    ds = ray.data.read_parquet(ingested, columns=["doc_id", "text"])
    t = _collect(exact_dedup(ds)).select(["doc_id", "dups"])
    return _cast64(t, ["doc_id", "dups"])


def q_quality_scores(sf_dir: str):
    import ray.data

    from tangent_ray.ops.textstats import quality_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(quality_batch, batch_format="pyarrow"))


def q_token_count_by_source(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Sum

    from tangent_ray.ops.textstats import token_count_partial

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text", "source"])
    partial = ds.map_batches(token_count_partial, batch_format="pyarrow")
    out = partial.groupby("source").aggregate(
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("n_docs", alias_name="n_docs"),
    )
    return _cast64(_collect(out), ["total_tokens", "n_docs"])


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test holdout split by md5 id hash — same
    bucket arithmetic as the DuckDB twin, stable across engines."""
    import ray.data

    from tangent_ray.ops.textstats import split_assign_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    return _collect(ds.map_batches(split_assign_batch, batch_format="pyarrow"))


CLEAN_MIN_WORDS, CLEAN_MIN_ALPHA = 5, 0.5


def q_clean_corpus(sf_dir: str):
    """Flagship training-data composition, one streaming pipeline:
    quality gate (vectorized filter, BEFORE the shuffle so junk never
    moves) -> exact dedup keeping the min-doc_id row per content hash
    (narrow shuffle: text hashes, not text, key the groupby) -> token
    totals per source. Shows the ops compose end-to-end."""
    import pandas as pd

    import ray.data
    from ray.data.aggregate import Sum

    from tangent_ray.ops.textstats import quality_batch, token_count_partial

    ds = ray.data.read_parquet(
        _doc_path(sf_dir), columns=["doc_id", "text", "source"]
    )

    def gate(batch: pa.Table) -> pa.Table:
        import numpy as np

        from tangent_ray.ops.dedup import content_hash_batch

        q = quality_batch(batch)
        keep = (
            q["n_words"].to_numpy(zero_copy_only=False) >= CLEAN_MIN_WORDS
        ) & (q["alpha_ratio"].to_numpy(zero_copy_only=False) >= CLEAN_MIN_ALPHA)
        out = batch.filter(pa.array(keep))
        # 128-bit key via the shared dedup hasher (the 64-bit single hash
        # reaches birthday-collision odds the ops module documents; the
        # SQL twin groups on the full text, so a collision = gate failure)
        h = content_hash_batch(out, "text", "doc_id")
        return out.append_column(
            "content_hash", h["content_hash"]
        ).append_column("content_hash2", h["content_hash2"])

    def shard_of(batch: pa.Table) -> pa.Table:
        from tangent_ray.util import DEFAULT_SHARDS, shard_column

        return shard_column(batch, ["content_hash"], DEFAULT_SHARDS)

    def first_rows(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a content hash land in one shard; one vectorized
        # sort + drop_duplicates picks every hash's min-doc_id row (content
        # groups are O(corpus) — never one Python call per group)
        return (
            g.sort_values(["content_hash", "content_hash2", "doc_id"],
                          kind="stable")
            .drop_duplicates(["content_hash", "content_hash2"])
            .drop(columns=["shard"])
        )

    kept = (
        ds.map_batches(gate, batch_format="pyarrow")
        .map_batches(shard_of, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(first_rows, batch_format="pandas")
    )
    partial = kept.map_batches(token_count_partial, batch_format="pyarrow")
    out = partial.groupby("source").aggregate(
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("n_docs", alias_name="n_docs"),
    )
    return _cast64(_collect(out), ["total_tokens", "n_docs"])


def q_lexical_stats(sf_dir: str):
    """Repetition quality signals (type-token ratio, top-word fraction) —
    Gopher/C4-style filter inputs, vectorized per batch, no shuffle."""
    import ray.data

    from tangent_ray.ops.textstats import lexical_stats_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(lexical_stats_batch, batch_format="pyarrow"))


def q_lm_perplexity(sf_dir: str):
    """Bigram-LM perplexity scoring (train on the corpus, score every doc):
    ONE model-sized groupby to train, broadcast model, vectorized scoring.
    Fixed-point integer log-probs make the DuckDB twin exact (float sums
    would be summation-order-dependent across engines)."""
    import ray.data

    from tangent_ray.ops.lm import lm_score, train_bigram_lm

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    model = train_bigram_lm(ds)
    return _collect(lm_score(ds, model))


def q_tfidf_keywords(sf_dir: str):
    """Top-5 TF-IDF keywords per doc: one hash-keyed df groupby + broadcast,
    vectorized per-doc top-k with a deterministic term tie-break."""
    import ray.data

    from tangent_ray.ops.textstats import tfidf_keywords

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(tfidf_keywords(ds, k=5))


def q_bpe_token_count(sf_dir: str):
    """BPE-ish regex token counts per source (one vectorized RE2 pass per
    batch + a tiny groupby; the DuckDB twin uses the same RE2 engine)."""
    import ray.data
    from ray.data.aggregate import Sum

    from tangent_ray.ops.textstats import bpe_token_count_partial

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text", "source"])
    partial = ds.map_batches(bpe_token_count_partial, batch_format="pyarrow")
    out = partial.groupby("source").aggregate(
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("n_docs", alias_name="n_docs"),
    )
    return _cast64(_collect(out), ["total_tokens", "n_docs"])


def q_token_counts(sf_dir: str):
    """Word-split AND BPE-regex token totals per source in ONE gate slot
    (tagged union on ``method``): the two counting contracts share one
    pruned read; each is the identical pre-aggregated partial + tiny
    groupby that held its own slot in round 2."""
    import ray.data
    from ray.data.aggregate import Sum

    from tangent_ray.ops.textstats import (
        bpe_token_count_partial,
        token_count_partial,
    )

    ds = ray.data.read_parquet(
        _doc_path(sf_dir), columns=["doc_id", "text", "source"]
    )

    def both(batch: pa.Table) -> pa.Table:
        # ONE read/tokenize pass emits both methods' partials, tagged
        outs = []
        for method, fn in (
            ("word", token_count_partial),
            ("bpe", bpe_token_count_partial),
        ):
            t = fn(batch)
            outs.append(
                t.add_column(
                    0, "method",
                    pa.array([method] * t.num_rows, type=pa.string()),
                )
            )
        return pa.concat_tables(outs)

    agg = ds.map_batches(both, batch_format="pyarrow").groupby(
        ["method", "source"]
    ).aggregate(
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("n_docs", alias_name="n_docs"),
    )
    return _cast64(
        _collect(agg).select(["method", "source", "total_tokens", "n_docs"]),
        ["total_tokens", "n_docs"],
    )


def q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq

    import ray.data

    from tangent_ray.ops.ann import knn_cosine

    path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"])
    qrow = qt.filter(pc.equal(qt["vec_id"], KNN_QUERY_VEC_ID))
    qvec = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)[None, :]
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    out = _collect(knn_cosine(ds, qvec, k=KNN_K))
    return pa.table(
        {
            "vec_id": pc.cast(out["vec_id"], pa.int64()),
            "score": pa.array(
                round_half_away(out["score"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


JACCARD_N = 4


def q_jaccard_pairs(sf_dir: str):
    """Exact token n-gram Jaccard per candidate pair (candidates = pairs
    sharing >= 1 shingle) — the exact counterpart of minhash_candidates."""
    import ray.data

    from tangent_ray.ops.dedup import jaccard_pairs

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    out = _collect(jaccard_pairs(ds, n=JACCARD_N))
    return pa.table(
        {
            "doc_a": pc.cast(out["doc_a"], pa.int64()),
            "doc_b": pc.cast(out["doc_b"], pa.int64()),
            "jaccard": pa.array(
                round_half_away(out["jaccard"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


NEAR_DUP_TAU = 0.4


def q_embed_near_dup(sf_dir: str):
    """Exact embedding-cosine near-duplicate pairs (cosine >= tau, a < b) —
    the brute-force baseline; LSH/IVF are the approximate scale path."""
    import ray.data

    from tangent_ray.ops.ann import near_dup_pairs

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    out = _collect(near_dup_pairs(ds, threshold=NEAR_DUP_TAU))
    return pa.table(
        {
            "doc_a": pc.cast(out["doc_a"], pa.int64()),
            "doc_b": pc.cast(out["doc_b"], pa.int64()),
            "score": pa.array(
                round_half_away(out["score"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


#: driver-gated phrase (present at every sf of the synthetic corpus)
PHRASE_QUERY = "table hash"
PHRASE_K = 20


def _positions_sidecar(sf_dir: str) -> str:
    """Build (once, cached per corpus lineage) the positional sidecar."""
    import json

    import ray.data

    from tangent_ray.index.positions import build_position_index

    src = _doc_path(sf_dir)
    # "pos3": layout version in the cache name — v3 adds the
    # doc-partitioned serving twin dir (data_dpart/) next to the
    # term-sharded one; stale v1 (doc-sharded) / v2 caches must not be
    # reused
    out = os.path.join(_TMP_ROOT, f"pos3-{_lineage_token(src)}")

    def build():
        import shutil

        # crash-safe: a build that died after writing some parquet but
        # before the manifest done-marker would otherwise have its partial
        # files APPENDED to on retry (write_parquet adds uniquely-named
        # files), doubling phrase counts
        data_dir = os.path.join(out, "data")
        dpart_dir = os.path.join(out, "data_dpart")
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(dpart_dir, ignore_errors=True)
        ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
        # parquet under data/ so the done-marker manifest.json is not
        # swept up by the sidecar's own read_parquet
        build_position_index(ds, data_dir, num_shards=16)
        build_position_index(ds, dpart_dir, num_shards=16,
                             doc_partitions=4)
        with open(os.path.join(out, "manifest.json"), "w") as f:
            json.dump({"src": src, "num_shards": 16,
                       "doc_partitions": 4}, f)

    return os.path.join(_build_locked(out, build), "data")


def q_phrase_topk(sf_dir: str):
    """Exact phrase top-k from the positional postings (term-sharded,
    O(df) resident-reader decode; see index/positions.py). Integer
    occurrence counts, so the DuckDB positions-self-join twin matches
    bit-for-bit. (Folded into the ``search_features`` gate entry, which
    also pins the doc-partitioned engine's identity on the same query.)"""
    from tangent_ray.index.positions import phrase_search

    t = phrase_search(_positions_sidecar(sf_dir), PHRASE_QUERY, k=PHRASE_K)
    t = t.rename_columns(["doc_id", "n_occurrences"])
    return _cast64(t, ["doc_id", "n_occurrences"])


def q_shingle_candidates(sf_dir: str):
    import ray.data

    from tangent_ray.ops.dedup import shingle_candidates

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    t = _collect(shingle_candidates(ds, n=SHINGLE_N))
    return _cast64(t.select(["doc_a", "doc_b"]), ["doc_a", "doc_b"])


def q_dedup_clusters(sf_dir: str):
    """Duplicate clusters: connected components over the shingle candidate
    graph (min-label propagation; one hash join + one aggregate per round,
    fully vectorized); every document gets a cluster id (the component's
    min doc_id)."""
    import ray.data

    from tangent_ray.ops.dedup import connected_components, shingle_candidates

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    pairs = shingle_candidates(ds, n=SHINGLE_N)
    nodes = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    t = _collect(connected_components(pairs, nodes))
    return _cast64(t, ["doc_id", "cluster"])


HOP_SIZE_H, HOP_H = 2, 1


def q_events_windows(sf_dir: str):
    """Tumbling (1h) AND hopping (2h advancing by 1h) window aggregates in
    one UNION'd entry, tagged by ``wkind`` — both window shapes of
    streaming §2.9 under a single oracle twin (the driver gate caps at 50
    entries, so the two formerly-separate green rows share one)."""
    import ray.data

    from tangent_ray.ops.streaming import hopping_window, tumbling_window

    def norm(t: pa.Table, wkind: str) -> pa.Table:
        i = t.column_names.index("window_start")
        t = t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )
        t = _cast64(t, ["n"])
        return t.append_column(
            "wkind", pa.array([wkind] * t.num_rows, type=pa.string())
        )

    def read():
        return ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )

    tumb = norm(_collect(tumbling_window(read())), "tumbling")
    hop = norm(
        _collect(hopping_window(read(), size_hours=HOP_SIZE_H, hop_hours=HOP_H)),
        "hopping",
    )
    return pa.concat_tables([tumb, hop])


SESSION_GAP_MIN = 30


def q_sessions(sf_dir: str):
    """Gap-based sessionization of the events stream per user."""
    import ray.data

    from tangent_ray.ops.streaming import sessionize

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    t = _collect(sessionize(ds, gap_minutes=SESSION_GAP_MIN))
    for c in ("session_start", "session_end"):
        i = t.column_names.index(c)
        t = t.set_column(i, c, pc.cast(t[c], pa.timestamp("us")))
    return _cast64(t, ["user_id", "session_idx", "n_events"])


def q_top_revenue_nations(sf_dir: str):
    """Scale-safe star join: only TRUE dimensions (customer->nation, a few
    rows per customer key; nation names) are broadcast via ray.put. The
    fact tables stream: lineitem pre-aggregates revenue per orderkey inside
    map_batches (combiner), then hash-joins the (orderkey, rev) stream
    against the orders (orderkey, nationkey) stream — a distributed
    ``Dataset.join``, no O(orders) driver dict — and a tiny nation groupby
    finishes."""
    import pyarrow.parquet as pq

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    nk2name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    c2n_ref = ray.put(c2n)

    class OrderNation:
        def __init__(self, ref):
            self.c2n = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nk = np.fromiter(
                (self.c2n[k] for k in b["o_custkey"].to_pylist()),
                count=b.num_rows,
                dtype=np.int32,
            )
            return pa.table(
                {
                    "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                    "nationkey": pa.array(nk, type=pa.int32()),
                }
            )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(OrderNation, fn_constructor_args=(c2n_ref,),
                  batch_format="pyarrow", concurrency=_pool())

    def rev_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        # exact integer arithmetic: price/discount live on a 0.01 grid, so
        # revenue*10000 is an exact int64 -> no fp summation-order
        # sensitivity vs the SQL oracle
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "rev": price_c * (100 - disc_c),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(rev_partial, batch_format="pyarrow")

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = joined.groupby("nationkey").aggregate(
        Sum("rev", alias_name="revenue_x10000")
    )
    t = _collect(out)
    names = pa.array(
        [nk2name[k] for k in t["nationkey"].to_pylist()], type=pa.string()
    )
    t = pa.table({"n_name": names, "revenue_x10000": t["revenue_x10000"]})
    return _cast64(t, ["revenue_x10000"])


# ---------------------------------------------------------------------------
# engine-only pipelines (no SQL twin -> rows-only driver check + pytest golden)

_SF_CONVS = {"0.001": 50, "0.01": 120, "0.1": 400}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.01"


def _transcripts_index(sf_dir: str) -> str:
    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.build import build_index
    from tangent_ray.sources.corpus import TranscriptsCorpus

    sf = _sf_of(sf_dir)
    n_convs = _SF_CONVS.get(sf, 120)
    data_dir = os.path.join(_TMP_ROOT, f"transcripts-{sf}")
    write_transcripts(data_dir, n_convs, files=4)
    # keyed on the generated corpus lineage: a regenerated/resized corpus
    # at the same path gets a fresh index
    out = os.path.join(_TMP_ROOT, f"tidx-{sf}-{_lineage_token(data_dir)}")

    def build():
        cfg = EngineConfig(
            window=2, eol="small", stem=True, math=True, salt_buckets=4,
            partitions=2,
        )
        build_index(data_dir, out, cfg, TranscriptsCorpus())

    return _build_locked(out, build)


def q_transcript_bm25(sf_dir: str):
    """Flagship serving path AND its sharded twin in one entry: full search
    (resident actor-pool scorer) plus the sharded path (actors hold partial
    subsets, global idf from the term-stats sidecar, driver top-k merge) —
    asserted result-identical here, surfaced as the full result rows."""
    from tangent_ray.fixtures import query_set
    from tangent_ray.query.scorer import search, search_sharded

    idx = _transcripts_index(sf_dir)
    full = _collect(search(query_set(), idx, concurrency=2))
    sharded = search_sharded(query_set(), idx, n_shards=2)
    a = sharded.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    b = full.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    assert a.equals(b.select(a.column_names).cast(a.schema)), (
        "sharded result differs from unsharded"
    )
    return full


def q_transcript_rerank(sf_dir: str):
    """Two-stage retrieval: core tuple-f-measure top-k, then MSS rerank of
    the candidates' formulas (reference rerank flow, rerank_results.py +
    paper §7 Maximum Subtree Similarity)."""
    from tangent_ray.fixtures import query_set
    from tangent_ray.index.build import list_input_files
    from tangent_ray.rerank.pipeline import rerank_search

    idx = _transcripts_index(sf_dir)
    sf = _sf_of(sf_dir)
    data_dir = os.path.join(_TMP_ROOT, f"transcripts-{sf}")
    qs = query_set().filter(pc.field("kind") == "math")
    return rerank_search(qs, idx, list_input_files(data_dir), topk=20)


def q_index_verify(sf_dir: str):
    """Build -> tiered-compact -> verifyIndex: recomputed postings/token
    totals per kind (must equal the manifest counts; mathindex.cpp:62-66).
    Exercises the full resume/merge surface in the driver gate."""
    import shutil

    from tangent_ray.index.merge import compact_index, verify_index

    idx = _transcripts_index(sf_dir)
    compacted = os.path.join(_TMP_ROOT, f"verify-{os.path.basename(idx)}")

    def build():
        # copy + compact into a scratch dir, then RENAME into place: the
        # copied manifest.json must not double as the done-sentinel (a
        # crash between copy and compaction would skip compaction forever)
        tmp = compacted + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(idx, tmp)
        # compact_index re-finalizes the global manifest itself
        compact_index(tmp, max_partials=1)
        shutil.rmtree(compacted, ignore_errors=True)
        os.replace(tmp, compacted)

    _build_locked(compacted, build)
    totals = verify_index(compacted)
    rows = [{"stat": k, "value": int(v)} for k, v in sorted(totals.items())]
    return pa.Table.from_pylist(rows)


def q_math_corpus_stats(sf_dir: str):
    """Two math-corpus statistics surfaces, one long-format entry (the
    driver gate caps at 50 entries):

    - section='lexicon': symbol-pair tuple vocabulary of the transcripts
      index (df/cf per tuple term) — the Lexicon analogue
      (mathindexbase.h:200-240); name=term, v1=df, v2=cf.
    - section='reorder': A10 tuple-count quartiles + 20-bucket
      order-statistic distribution over the unique math expressions
      (``mathindex.cpp:87-99``), from a distributed count histogram (no
      global sort); name=bucket, v1=expr_rank, v2=tc — plus one
      section='reorder_q' row per scalar (q1, q2, n_exprs)."""
    import glob

    import ray.data
    from ray.data.aggregate import Sum

    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.reorder import (
        expr_tuple_counts,
        reorder_stats,
        tc_histogram,
    )

    idx = _transcripts_index(sf_dir)
    files = sorted(glob.glob(os.path.join(idx, "partials", "*", "terms", "*.parquet")))
    seg = ray.data.read_parquet(files, columns=["term", "kind", "df", "cf"])
    seg = seg.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 1)), batch_format="pyarrow"
    )
    lex = _cast64(
        _collect(
            seg.groupby("term").aggregate(
                Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
            )
        ),
        ["df", "cf"],
    )

    sf = _sf_of(sf_dir)
    n_convs = _SF_CONVS.get(sf, 120)
    data_dir = os.path.join(_TMP_ROOT, f"transcripts-{sf}")
    write_transcripts(data_dir, n_convs, files=4)
    cfg = EngineConfig(window=2, eol="small")
    ds = ray.data.read_parquet(data_dir, columns=["text"])
    counts = expr_tuple_counts(ds, cfg).materialize()
    stats = reorder_stats(tc_histogram(counts))

    sections = ["lexicon"] * lex.num_rows
    names = lex["term"].to_pylist()
    v1 = lex["df"].to_pylist()
    v2 = lex["cf"].to_pylist()
    for b, (er, tc) in enumerate(zip(stats["distexpr"], stats["disttc"])):
        sections.append("reorder")
        names.append(str(b))
        v1.append(int(er))
        v2.append(int(tc))
    for k in ("q1", "q2", "n_exprs"):
        sections.append("reorder_q")
        names.append(k)
        v1.append(int(stats[k]))
        v2.append(0)
    return pa.table(
        {
            "section": pa.array(sections, type=pa.string()),
            "name": pa.array(names, type=pa.string()),
            "v1": pa.array(v1, type=pa.int64()),
            "v2": pa.array(v2, type=pa.int64()),
        }
    )


def q_lang_id(sf_dir: str):
    import ray.data

    from tangent_ray.ops.textstats import LangId

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(LangId, batch_format="pyarrow", concurrency=_pool()))


def q_minhash_candidates(sf_dir: str):
    import ray.data

    from tangent_ray.ops.dedup import minhash_candidates

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(minhash_candidates(ds)).select(["doc_a", "doc_b"])


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= 3): banding pigeonhole makes the
    single band-bucket shuffle exact; XOR-popcount verification in-group."""
    import ray.data

    from tangent_ray.ops.dedup import simhash_pairs

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _cast64(_collect(simhash_pairs(ds)), ["doc_a", "doc_b"])


def q_simhash(sf_dir: str):
    import ray.data

    from tangent_ray.ops.dedup import simhash_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(simhash_batch, batch_format="pyarrow"))


def q_fingerprints(sf_dir: str):
    import ray.data

    from tangent_ray.ops.textstats import fingerprint_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(fingerprint_batch, batch_format="pyarrow"))


def content_hash_column(t: pa.Table, ndigits: int = 6) -> pa.Table:
    """Append a deterministic per-row ``content_hash`` (blake2b-64 of the
    canonical ``|``-joined cell string, floats rounded to ``ndigits``).

    The driver records only row counts for ``no_oracle`` entries, so
    without this a scoring regression that kept counts stable would pass
    silently; with it, pytest pins the digest of the whole result (and
    any row-hashing the driver does flips too)."""
    import hashlib as _hl

    cols = [c for c in t.column_names]
    parts: list[list[str]] = []
    for c in cols:
        col = t[c]
        if pa.types.is_floating(col.type):
            vals = [
                "" if v is None else repr(round(v, ndigits))
                for v in col.to_pylist()
            ]
        else:
            vals = ["" if v is None else str(v) for v in col.to_pylist()]
        parts.append(vals)
    hashes = [
        int.from_bytes(
            _hl.blake2b("|".join(row).encode(), digest_size=8).digest(), "big"
        ) >> 1
        for row in zip(*parts)
    ]
    return t.append_column("content_hash", pa.array(hashes, pa.int64()))


def q_formula_topk(sf_dir: str):
    """Formula-browsing output layer: one row per matched expression
    INSTANCE (docid, pos, expr, score) with the golden-validated core score
    — the reference's Task_FormulaBrowsing R-row shape (mathindex.cpp:161)
    that the doc-level transcript serving path doesn't produce. Carries a
    ``content_hash`` column pinned by tests/test_gate_entries.py."""
    from tangent_ray.index.build import list_input_files
    from tangent_ray.query.formula import formula_search

    _transcripts_index(sf_dir)  # ensures the transcripts corpus exists
    sf = _sf_of(sf_dir)
    data_dir = os.path.join(_TMP_ROOT, f"transcripts-{sf}")
    queries = {
        "fq1": "[V!x[=[F!,o[N!1],u[V!p]]]]",
        "fq2": "[?v[=[F!,o[N!1],u[V!p]]]]",
        "fq3": "[R!,w[V!z]]",
    }
    return content_hash_column(
        formula_search(
            queries, list_input_files(data_dir), window=2, eol="small",
            topk=10,
        )
    )


def q_golden_replay(sf_dir: str):
    """Replay the reference's published golden core-output scores
    (results/Wikipedia/Task_FormulaBrowing) from the (query, result
    expression) pairs alone — F = 2*cc/(exprtc+querytc), mathindex.cpp:240.
    One row per (window, EOL) condition file; concrete_ok == concrete_rows
    is asserted (exact reproduction), wildcard is near-exact (see
    tangent_ray/eval/golden.py docstring). Independent of sf_dir."""
    import glob as _glob

    from tangent_ray.eval.golden import GOLDEN_DIR, replay_file

    files = sorted(_glob.glob(os.path.join(GOLDEN_DIR, "core_w*_e*.tsv")))
    rows = []
    for f in files:
        s = replay_file(f)
        assert s["concrete_ok"] == s["concrete_rows"], f
        rows.append(s)

    # the published RERANKED m4 file (paper MSS = v06 matching + v04
    # scores) replays exactly, wildcards included
    from tangent_ray.eval.golden import parse_golden
    from tangent_ray.rerank.subtree import mss_subtree_score

    m4 = os.path.join(
        os.path.dirname(GOLDEN_DIR), "reranked_output",
        "reranked_paper_m4_w0_e2.tsv",
    )
    if os.path.exists(m4):
        tot = ok = 0
        golden_qs = parse_golden(m4)
        for q in golden_qs:
            for expr, want in q.results:
                got = mss_subtree_score(q.expr, expr)[0]
                tot += 1
                ok += abs(got - want) <= max(1e-6, abs(want)) * 1e-4
        assert ok == tot, f"reranked m4 replay: {ok}/{tot}"
        rows.append(
            {
                "file": "reranked_paper_m4_w0_e2.tsv",
                "queries": len(golden_qs),
                "concrete_rows": tot,
                "concrete_ok": ok,
                "wildcard_rows": 0,
                "wildcard_ok": 0,
                "wildcard_drift_queries": 0,
                "wildcard_max_delta": 0.0,
            }
        )
    return content_hash_column(pa.Table.from_pylist(rows))


MM_N = 60


def q_multimodal_meta(sf_dir: str):
    """REAL (dependency-free) multimodal kernels, one oracle-twinned entry:
    dims + bit depth (PNG IHDR), dims (GIF descriptor), dims + EXIF
    orientation (JPEG marker/TIFF-IFD walk), duration + sample rate (WAV
    RIFF), duration + track count + first codec fourcc (MP4 moov/trak/stsd
    walk), plus payload byte size. Every fact is a pure function of the row
    index (see ``synth_multimodal_table``), so the DuckDB twin recomputes
    the expected metadata from ``range(n)`` alone — parser vs generator."""
    import ray.data

    from tangent_ray.ops.multimodal import media_meta_batch, synth_multimodal_table

    ds = ray.data.from_arrow(synth_multimodal_table(MM_N))
    return _collect(
        ds.map_batches(media_meta_batch, batch_format="pyarrow", batch_size=16)
    )


# ---------------------------------------------------------------------------
# Corpus-curation queries (ops/curation.py)

SAMPLE_RATES = {"src0": 0.1, "src1": 0.9}
SAMPLE_DEFAULT_RATE = 0.5


def q_pii_redact(sf_dir: str):
    """Sequential RE2 redaction passes (email -> phone -> IPv4) with
    per-category match counts."""
    import ray.data

    from tangent_ray.ops.curation import pii_redact_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(pii_redact_batch, batch_format="pyarrow"))


def q_decontam(sf_dir: str):
    """Benchmark decontamination: train docs (holdout split 'train') flagged
    by DISTINCT 5-gram overlap with the 'test' split, holdout side broadcast
    as a sorted hash array."""
    import pyarrow.compute as pc
    import ray.data

    from tangent_ray.ops.curation import decontaminate
    from tangent_ray.ops.textstats import SPLIT_TEST, SPLIT_VAL, split_assign_batch

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", split_assign_batch(batch)["bucket"]
        )

    def keep(lo: int | None, hi: int | None):
        def f(batch: pa.Table) -> pa.Table:
            b = batch["bucket"]
            mask = pc.less(b, hi) if lo is None else pc.greater_equal(b, lo)
            return batch.filter(mask).drop_columns(["bucket"])

        return f

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    # each branch re-executes read->tag over the corpus (two streaming
    # passes total: one to derive the holdout hash set, one to flag the
    # train side) — the minimum without pinning the whole tagged corpus in
    # the object store, which is the worse trade at scale
    tagged = ds.map_batches(tag, batch_format="pyarrow")
    train = tagged.map_batches(keep(SPLIT_VAL, None), batch_format="pyarrow")
    holdout = tagged.map_batches(keep(None, SPLIT_TEST), batch_format="pyarrow")
    return _collect(decontaminate(train, holdout))


def q_stratified_sample(sf_dir: str):
    """Deterministic per-source Bernoulli sample (subset property holds
    across rates); fixed per-source rates shared with the SQL twin."""
    import functools

    import ray.data

    from tangent_ray.ops.curation import stratified_sample_batch

    fn = functools.partial(
        stratified_sample_batch,
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
    )
    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "source"])
    return _collect(ds.map_batches(fn, batch_format="pyarrow"))


def q_pack_sequences(sf_dir: str):
    """Concatenation-style sequence packing per source stream (seq_len=256):
    each doc's (seq_first, seq_last, seq_offset) in the packed token grid."""
    import ray.data

    from tangent_ray.ops.curation import pack_sequences

    ds = ray.data.read_parquet(
        _doc_path(sf_dir), columns=["doc_id", "text", "source"]
    )
    return _collect(pack_sequences(ds))


def q_curated_corpus(sf_dir: str):
    """Full curated-pretraining-corpus flagship, ONE streaming composition
    of the curation ops in production order: PII redact -> quality gate ->
    train-split selection -> decontamination filter (holdout 5-gram hashes
    broadcast) -> exact dedup (min doc per text, hash-keyed shuffle) ->
    stratified sample -> sequence packing -> per-source summary
    (docs, tokens, packed sequences). The only shuffles are the dedup
    hash-shard groupby and the packing stream groupby."""
    import functools

    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data

    from tangent_ray.ops.curation import (
        DropContaminated,
        holdout_shingle_hashes,
        pack_sequences,
        pii_redact_batch,
        stratified_sample_batch,
    )
    from tangent_ray.ops.textstats import (
        SPLIT_TEST,
        SPLIT_VAL,
        quality_batch,
        split_assign_batch,
    )

    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    def prep(batch: pa.Table) -> pa.Table:
        """Redact PII, quality-gate on the redacted text, tag split bucket."""
        red = pii_redact_batch(batch)["redacted"]
        batch = batch.set_column(
            batch.schema.get_field_index("text"), "text", red
        )
        q = quality_batch(batch)
        keep = (
            q["n_words"].to_numpy(zero_copy_only=False) >= CLEAN_MIN_WORDS
        ) & (q["alpha_ratio"].to_numpy(zero_copy_only=False) >= CLEAN_MIN_ALPHA)
        batch = batch.filter(pa.array(keep))
        return batch.append_column("bucket", split_assign_batch(batch)["bucket"])

    def keep_range(lo: int | None, hi: int | None):
        def f(batch: pa.Table) -> pa.Table:
            b = batch["bucket"]
            mask = pc.less(b, hi) if lo is None else pc.greater_equal(b, lo)
            return batch.filter(mask).drop_columns(["bucket"])

        return f

    def src():
        ds = ray.data.read_parquet(
            _doc_path(sf_dir), columns=["doc_id", "text", "source"]
        )
        return ds.map_batches(prep, batch_format="pyarrow")

    holdout = src().map_batches(keep_range(None, SPLIT_TEST), batch_format="pyarrow")
    ref = ray.put(holdout_shingle_hashes(holdout))
    clean = (
        src()
        .map_batches(keep_range(SPLIT_VAL, None), batch_format="pyarrow")
        .map_batches(
            DropContaminated,
            fn_constructor_kwargs=dict(holdout_ref=ref),
            batch_format="pyarrow",
            concurrency=_pool(),
        )
    )

    # exact dedup keeping the min-doc_id row per text: hash-keyed shuffle
    # on the shared 128-bit content key (the twin groups by the FULL text,
    # so a 64-bit engine collision would be a gate failure at scale)
    def add_hash(batch: pa.Table) -> pa.Table:
        from tangent_ray.ops.dedup import content_hash_batch

        h = content_hash_batch(batch, "text", "doc_id")
        batch = batch.append_column(
            "content_hash", h["content_hash"]
        ).append_column("content_hash2", h["content_hash2"])
        return shard_column(batch, ["content_hash"], DEFAULT_SHARDS)

    def first_per_hash(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["content_hash", "content_hash2", "shard"])
        h = g["content_hash"].to_numpy(zero_copy_only=False)
        h2 = g["content_hash2"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h2, h))
        keep = np.concatenate(
            [[True],
             (h[order][1:] != h[order][:-1]) | (h2[order][1:] != h2[order][:-1])]
        )
        return g.take(pa.array(order[keep])).drop_columns(
            ["content_hash", "content_hash2", "shard"]
        )

    deduped = (
        clean.map_batches(add_hash, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(first_per_hash, batch_format="pyarrow")
    )

    sample_fn = functools.partial(
        stratified_sample_batch,
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
    )
    sampled = deduped.map_batches(sample_fn, batch_format="pyarrow").drop_columns(
        ["bucket"]
    )

    packed = pack_sequences(sampled)

    def summarize(g: pa.Table) -> pa.Table:
        last = g["seq_last"].to_numpy(zero_copy_only=False)
        toks = g["n_tok"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": g["source"].slice(0, 1),
                "n_docs": pa.array([g.num_rows], type=pa.int64()),
                "total_tokens": pa.array([int(toks.sum())], type=pa.int64()),
                "n_seqs": pa.array([int(last.max()) + 1], type=pa.int64()),
            }
        )

    return _collect(packed.groupby("source").map_groups(summarize, batch_format="pyarrow"))


def q_asof_attribution(sf_dir: str):
    """Keyed as-of join: each purchase event matched to the latest click by
    the same user at or before it (classic attribution)."""
    import pyarrow.compute as pc
    import ray.data

    from tangent_ray.ops.joins import asof_join

    def only(kind: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["event_type"], kind))

        return f

    def ev():
        return ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"],
        )

    purchases = ev().map_batches(only("purchase"), batch_format="pyarrow")
    clicks = ev().map_batches(only("click"), batch_format="pyarrow")
    return _collect(asof_join(purchases, clicks))


def q_range_active_sessions(sf_dir: str):
    """Interval range join: for every event, how many session windows (any
    user) contain its timestamp — sessions from the sessionize op itself."""
    import ray.data

    from tangent_ray.ops.joins import range_count
    from tangent_ray.ops.streaming import sessionize

    def ev():
        return ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id"],
        )

    sessions = sessionize(ev(), gap_minutes=SESSION_GAP_MIN)
    return _collect(
        range_count(
            ev(), sessions,
            lo_col="session_start", hi_col="session_end",
        )
    )


def q_distinct_tokens(sf_dir: str):
    """Exact corpus vocabulary size (one vocabulary-sized hash groupby)
    next to the HLL estimate (one streaming pass, 16 KiB state) — the
    exact/approximate pair a 100 TB pipeline chooses between. Only the
    exact value is oracle-compared; the estimate is bound-checked by
    pytest (`test_sketch.py`)."""
    import ray.data
    from ray.data.aggregate import Count

    from tangent_ray.ops.textstats import df_count_partial

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    # distributed row count of the grouped result — the vocabulary never
    # materializes on the driver
    n = (
        ds.map_batches(df_count_partial, batch_format="pyarrow")
        .groupby(["kind", "th"])
        .aggregate(Count(alias_name="c"))
        .map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 0)), batch_format="pyarrow"
        )
        .count()
    )
    return pa.table({"distinct_tokens": pa.array([n], type=pa.int64())})


def _jsonl_roundtrip(sf_dir: str) -> str:
    """Round-trip the corpus through the JSONL ingestion front door
    (sources/ingest.py): documents -> JSONL shards (ray write_json) ->
    ``ingest_corpus`` -> canonical (doc_id, dockey, text) Parquet, with
    a row-identity assert against the source (integer ids pass through,
    dockey is their string form, text unchanged). Cached per corpus
    lineage; returns the ingested Parquet dir. Consumed by
    ``q_dedup_exact`` so the ingestion path sits under an oracle row
    without its own driver slot."""
    import ray.data

    from tangent_ray.sources.ingest import ingest_corpus

    src = _doc_path(sf_dir)
    base = os.path.join(_TMP_ROOT, f"jsonl-{_lineage_token(src)}")
    jdir = base + "-src"
    pdir = base + "-out"

    def build():
        import json as _json
        import shutil

        shutil.rmtree(jdir, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)
        (
            ray.data.read_parquet(src, columns=["doc_id", "text"])
            .write_json(jdir)
        )
        ingest_corpus(jdir, pdir, fmt="jsonl", id_col="doc_id")
        got = (
            _collect(ray.data.read_parquet(pdir))
            .sort_by("doc_id")
            .select(["doc_id", "dockey", "text"])
        )
        want = _collect(
            ray.data.read_parquet(src, columns=["doc_id", "text"])
        ).sort_by("doc_id")
        import pyarrow.compute as pc_

        same = (
            got["doc_id"].equals(pc_.cast(want["doc_id"], pa.int64()))
            and got["text"].equals(want["text"])
            and got["dockey"].to_pylist()
            == [str(i) for i in want["doc_id"].to_pylist()]
        )
        if not same:
            raise AssertionError(
                "JSONL ingestion round-trip diverged from the source corpus"
            )
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, "manifest.json"), "w") as f:
            _json.dump({"src": src}, f)

    _build_locked(base, build)
    return pdir


def q_chunk_spans(sf_dir: str):
    """Context-window chunking: overlapping token-range chunks per doc
    (stride = max - overlap, last chunk clamped to the doc end) — one
    vectorized per-batch explode, no shuffle."""
    import ray.data

    from tangent_ray.ops.curation import chunk_spans_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(chunk_spans_batch, batch_format="pyarrow"))


def q_top_tokens(sf_dir: str):
    """Certified shuffle-free heavy hitters: exact top-20 corpus tokens via
    per-batch candidate emission + residual bound + verification pass (the
    full token groupby only as a logged fallback)."""
    import ray.data

    from tangent_ray.ops.sketch import heavy_hitters

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["text"])
    return heavy_hitters(ds, k=20)


def q_top_events_per_type(sf_dir: str):
    """Per-group top-k primitive: the 3 highest-value events of every event
    type (ties on event id ascending) — one group-hash shard shuffle, all
    of a shard's groups ranked in one lexsort, row_number() twin."""
    import ray.data

    from tangent_ray.ops.streaming import top_n_per_group

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    return _collect(
        top_n_per_group(ev, "event_type", "value", 3, id_col="event_id")
    )


DOCLEN_QS = [0.5, 0.9, 0.99]


def q_doclen_quantiles(sf_dir: str):
    """Distributed EXACT order statistics without a global sort: word-count
    quantile thresholds of the corpus by iterative histogram refinement
    (every pass a streaming bincount — the 'keep the top decile by quality'
    primitive), rank rule k = ceil(q*n) shared with the SQL twin."""
    import ray.data

    from tangent_ray.ops.quantiles import quantile_values
    from tangent_ray.ops.textstats import quality_batch

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    words = ds.map_batches(
        lambda b: quality_batch(b).select(["doc_id", "n_words"]),
        batch_format="pyarrow",
    ).materialize()  # consumed once per refinement pass
    rows = quantile_values(words, "n_words", DOCLEN_QS)
    return pa.table(
        {
            "q": pa.array([r["q"] for r in rows], type=pa.float64()),
            "k": pa.array([r["k"] for r in rows], type=pa.int64()),
            "value": pa.array([r["value"] for r in rows], type=pa.int64()),
            "n_ge": pa.array([r["n_ge"] for r in rows], type=pa.int64()),
        }
    )


def q_orders_customers(sf_dir: str):
    """Generic distributed hash equi-join (shard-shuffle path): every order
    joined to its customer's name and nation — the fact-side never
    materializes, both sides meet on key-hash shards."""
    import ray.data

    from tangent_ray.ops.joins import hash_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).map_batches(
        lambda b: b.rename_columns(["custkey", "c_name", "c_nationkey"]),
        batch_format="pyarrow",
    )
    return _collect(hash_join(orders, cust, on="custkey", how="inner"))


def q_customer_nation_bc(sf_dir: str):
    """Broadcast-path equi-join: customers LEFT-joined to the (25-row)
    nation dimension — right side shipped once via ray.put, left streams."""
    import ray.data

    from tangent_ray.ops.joins import broadcast_join

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(
        lambda b: b.rename_columns(["c_custkey", "nationkey", "c_acctbal"]),
        batch_format="pyarrow",
    )
    nation = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).map_batches(
        lambda b: b.rename_columns(["nationkey", "n_name"]),
        batch_format="pyarrow",
    )
    return _collect(broadcast_join(cust, nation, on="nationkey", how="left"))


# ---------------------------------------------------------------------------

TOKS = (
    "(SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term "
    "FROM documents)"
)

ORACLE_SQL: dict[str, str] = {
    "term_doc_tf": f"""
        SELECT term, doc_id, count(*)::BIGINT AS tf
        FROM {TOKS} WHERE term <> '' GROUP BY term, doc_id
    """,
    "term_stats": f"""
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
        FROM {TOKS} WHERE term <> '' GROUP BY term
    """,
    "doc_stats": f"""
        SELECT doc_id, count(*)::BIGINT AS dl
        FROM {TOKS} WHERE term <> '' GROUP BY doc_id
    """,
    "first_positions": """
        WITH raw AS (
          SELECT doc_id, ts[i] AS term, i
          FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
                FROM documents),
               LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        ), tok AS (
          SELECT doc_id, term,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
          FROM raw WHERE term <> ''
        )
        SELECT term, doc_id, min(pos)::BIGINT AS first_pos
        FROM tok GROUP BY term, doc_id
    """,
    # exact phrase occurrences ("table hash") via positions self-join:
    # overlapping occurrences count, ties break by doc_id — the same
    # conventions as index/positions.py phrase_search
    "phrase_topk": """
        WITH raw AS (
          SELECT doc_id, ts[i] AS term, i
          FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
                FROM documents),
               LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        ), tok AS (
          SELECT doc_id, term,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
          FROM raw WHERE term <> ''
        )
        SELECT t0.doc_id, count(*)::BIGINT AS n_occurrences
        FROM tok t0
        JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        WHERE t0.term = 'table' AND t1.term = 'hash'
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20
    """,
    "bm25_topk": f"""
        WITH toks AS (SELECT * FROM {TOKS} WHERE term <> ''),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (
          SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl)::DOUBLE
                   / (SELECT count(*) FROM documents) AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        q AS (SELECT unnest({BM25_QUERY_TERMS!r}) AS term),
        scores AS (
          SELECT tf.doc_id,
                 sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                    ) AS score
          FROM tf
          JOIN df USING (term) JOIN dl USING (doc_id), stats
          WHERE tf.term IN (SELECT term FROM q)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 6) AS score
        FROM scores ORDER BY score DESC, doc_id LIMIT {BM25_K}
    """,
    "boolean_and": f"""
        SELECT doc_id FROM (
          SELECT doc_id, count(DISTINCT term) AS nt
          FROM {TOKS}
          WHERE term IN ({", ".join(repr(t) for t in BOOL_TERMS)})
          GROUP BY doc_id
        ) WHERE nt = {len(BOOL_TERMS)}
    """,
    "dedup_exact": """
        SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dups
        FROM documents GROUP BY text
    """,
    "quality_scores": """
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '[^a-z0-9]+'),
                               x -> x <> ''))::BIGINT AS n_words,
               round(CASE WHEN length(coalesce(text, '')) = 0 THEN 0
                          ELSE length(regexp_replace(coalesce(text, ''),
                                                     '[^A-Za-z]', '', 'g'))::DOUBLE
                               / length(text) END, 6) AS alpha_ratio
        FROM documents
    """,
    "token_count_by_source": f"""
        SELECT source, count(*) FILTER (WHERE term <> '')::BIGINT AS total_tokens,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM (SELECT doc_id, source,
                     unnest(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+')) AS term
              FROM documents)
        GROUP BY source
    """,
    "split_assign": """
        SELECT doc_id,
               CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
                   % 1000 AS bucket,
               CASE WHEN CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8))
                              AS BIGINT) % 1000 < 10 THEN 'test'
                    WHEN CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8))
                              AS BIGINT) % 1000 < 60 THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    """,
    "clean_corpus": f"""
        WITH q AS (
          SELECT doc_id, text, source,
                 len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '')) AS n_words,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / length(text) END AS alpha_ratio
          FROM documents
        ), f AS (
          SELECT * FROM q
          WHERE n_words >= {CLEAN_MIN_WORDS} AND alpha_ratio >= {CLEAN_MIN_ALPHA}
        ), d AS (
          SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source,
                 min(n_words) AS n_words
          FROM f GROUP BY text
        )
        SELECT source, sum(n_words)::BIGINT AS total_tokens,
               count(*)::BIGINT AS n_docs
        FROM d GROUP BY source
    """,
    "lexical_stats": """
        WITH w AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS word
          FROM documents
        ), c AS (
          SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2
        )
        SELECT doc_id, sum(n)::BIGINT AS n_words,
               count(*)::BIGINT AS distinct_words,
               round(count(*)::DOUBLE / sum(n), 6) AS type_token_ratio,
               round(max(n)::DOUBLE / sum(n), 6) AS top_word_fraction
        FROM c GROUP BY doc_id
    """,
    "bpe_token_count": """
        SELECT source,
               sum(len(regexp_extract_all(text, '__BPE_RE__')))::BIGINT
                   AS total_tokens,
               count(*)::BIGINT AS n_docs
        FROM documents GROUP BY source
    """,
    "knn_cosine": f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                   WHERE vec_id = {KNN_QUERY_VEC_ID})
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[],
                                            (SELECT qv FROM q)), 6) AS score
        FROM embeddings
        ORDER BY list_cosine_similarity(embedding::DOUBLE[],
                                        (SELECT qv FROM q)) DESC, vec_id
        LIMIT {KNN_K}
    """,
    "jaccard_pairs": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                       AS shingle
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - {JACCARD_N - 1}))
                        AS i) g
        ), sizes AS (
          SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(i / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        ORDER BY doc_a, doc_b
    """,
    "sessions": f"""
        WITH ordered AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events
        ), flagged AS (
          SELECT user_id, ts,
                 CASE WHEN prev_ts IS NULL
                           OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM ordered
        ), sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) - 1
                   AS session_idx
          FROM flagged
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """,
    "embed_near_dup": f"""
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS score
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= {NEAR_DUP_TAU}
        ORDER BY doc_a, doc_b
    """,
    "shingle_candidates": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                       || ' ' || ts[i+4] AS shingle
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - {SHINGLE_N - 1}))
                        AS i) g
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                       || ' ' || ts[i+4] AS shingle
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - {SHINGLE_N - 1}))
                        AS i) g
        ), e AS (
          SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        ), cc(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.v, cc.label FROM cc JOIN e ON cc.node = e.u
        )
        SELECT node AS doc_id, min(label)::BIGINT AS cluster
        FROM cc GROUP BY node
    """,
    "events_windows": f"""
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value,
               'tumbling' AS wkind
        FROM events GROUP BY 1, 2
        UNION ALL
        SELECT event_type,
               date_trunc('hour', ts) - j * INTERVAL 1 HOUR AS window_start,
               count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value,
               'hopping' AS wkind
        FROM events,
             LATERAL (SELECT unnest(generate_series(0, {HOP_SIZE_H // HOP_H - 1}))
                      AS j) g
        GROUP BY 1, 2
    """,
    "top_revenue_nations": """
        SELECT n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
                 AS revenue_x10000
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
}


def _bpe_sql_pattern() -> str:
    from tangent_ray.ops.textstats import BPE_TOKEN_RE

    # SQL-quote the apostrophes; backslash escapes pass through verbatim
    # (DuckDB standard strings) into the same RE2 engine Arrow uses
    return BPE_TOKEN_RE.replace("'", "''")


ORACLE_SQL["bpe_token_count"] = ORACLE_SQL["bpe_token_count"].replace(
    "__BPE_RE__", _bpe_sql_pattern()
)


def _langid_sql() -> str:
    """DuckDB twin of ops.textstats.LangId: per-token stopword-set votes,
    argmax language with (count desc, lang asc) tie-break, 'und' on zero."""
    from tangent_ray.ops.textstats import _STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH toks AS (SELECT * FROM {TOKS} WHERE term <> ''),
        sw(lang, term) AS (VALUES {rows}),
        cnt AS (
          SELECT toks.doc_id, sw.lang, count(*) AS c
          FROM toks JOIN sw USING (term) GROUP BY 1, 2
        ), best AS (
          SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, lang) AS rn
            FROM cnt) WHERE rn = 1
        )
        SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
        FROM documents d LEFT JOIN best b USING (doc_id)
    """


ORACLE_SQL["lang_id"] = _langid_sql()


# Signed reinterpretation of a [0, 2^64) HUGEINT as the ops' int64 output.
_I64 = (
    "(CASE WHEN {v} >= 9223372036854775808::HUGEINT"
    " THEN {v} - 18446744073709551616::HUGEINT ELSE {v} END)::BIGINT"
)

# Twin of ops.textstats.fingerprint_batch: Horner rolling hash mod 2^64 over
# md5_number_lower token hashes in document order (empty doc -> 0).
ORACLE_SQL["fingerprints"] = f"""
    WITH raw AS (
      SELECT doc_id, ts[i] AS term, i
      FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
    ), tok AS (
      SELECT doc_id, md5_number_lower(term)::HUGEINT AS th, i
      FROM raw WHERE term <> ''
    ), lists AS (
      SELECT doc_id, list(th ORDER BY i) AS ths FROM tok GROUP BY doc_id
    ), fp AS (
      SELECT doc_id,
             list_reduce(ths,
               (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT) AS h
      FROM lists
    )
    SELECT d.doc_id, {_I64.format(v="coalesce(fp.h, 0)")} AS fingerprint
    FROM documents d LEFT JOIN fp USING (doc_id)
"""

# Twin of ops.lm: add-one-smoothed bigram LM trained on the corpus itself,
# each doc scored as the sum of fixed-point log-probs round(ln((c12+1)/
# (c1+V))*1e6) over its adjacent in-doc token bigrams (c1 = bigram
# occurrences with that first token, V = distinct tokens). Integer sums are
# order-free, so the match is exact; docs with <2 tokens score (0, 0).
ORACLE_SQL["lm_perplexity"] = """
    WITH raw AS (
      SELECT doc_id, ts[i] AS term, i
      FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
    ), tok AS (
      SELECT doc_id, term,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r
      FROM raw WHERE term <> ''
    ), big AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.r = a.r + 1
    ), c12 AS (
      SELECT w1, w2, count(*)::BIGINT AS c FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(c)::BIGINT AS c FROM c12 GROUP BY w1
    ), v AS (
      SELECT count(DISTINCT term)::DOUBLE AS v FROM tok
    ), lp AS (
      SELECT c12.w1, c12.w2,
             round(ln((c12.c + 1.0) / (c1.c + v.v)) * 1e6)::BIGINT AS lp_e6
      FROM c12 JOIN c1 USING (w1), v
    ), per AS (
      SELECT big.doc_id, count(*)::BIGINT AS n_bigrams,
             sum(lp.lp_e6)::BIGINT AS sum_lp_e6
      FROM big JOIN lp ON big.w1 = lp.w1 AND big.w2 = lp.w2
      GROUP BY big.doc_id
    )
    SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
           coalesce(per.sum_lp_e6, 0) AS sum_lp_e6
    FROM documents d LEFT JOIN per USING (doc_id)
"""

# Twin of ops.textstats.tfidf_keywords: per-doc top-5 terms by
# tf * (ln((N+1)/(df+1)) + 1), ties broken on the term string ascending.
# Scores are emitted fixed-point (round(s*1e6)) but RANKED on the raw
# double, which both engines compute identically from (tf, df, N).
ORACLE_SQL["tfidf_keywords"] = """
    WITH tok AS (
      SELECT doc_id, term
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
            FROM documents)
      WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term
    ), n AS (
      SELECT count(*)::DOUBLE AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS s
      FROM tf JOIN df USING (term), n
    ), ranked AS (
      SELECT doc_id, term, tf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, term ASC) AS rank,
             round(s * 1e6)::BIGINT AS score_e6
      FROM scored
    )
    SELECT doc_id, term, tf, rank, score_e6 FROM ranked WHERE rank <= 5
"""

# Twin of ops.dedup.simhash_batch: tf-weighted per-bit votes over
# md5_number_lower token hashes, sign bit per position (empty doc -> 0).
_SIMHASH_CTE = """
    tok AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
            FROM documents)
      WHERE term <> '' GROUP BY doc_id, term
    ), votes AS (
      SELECT doc_id, b.b,
             sum(tf * (2 * ((md5_number_lower(term) >> b.b) & 1)::BIGINT - 1)) AS v
      FROM tok, (SELECT unnest(generate_series(0, 63)) AS b) b
      GROUP BY doc_id, b.b
    ), sim AS (
      SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0 END) AS s
      FROM votes GROUP BY doc_id
    ), allsim AS (
      SELECT d.doc_id, coalesce(sim.s, 0) AS s
      FROM documents d LEFT JOIN sim USING (doc_id)
    )
"""

ORACLE_SQL["simhash"] = f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, {_I64.format(v="s")} AS simhash FROM allsim
"""

def _minhash_sql() -> str:
    """DuckDB twin of ops.dedup.minhash_candidates (64 perms, 16 bands,
    3-token shingles): per-perm min of (a*md5+b mod 2^64) >> 1, FNV-1a band
    hash over each 4-perm row group, pairs sharing any (band, band_hash).
    The permutation constants come from the op itself so they cannot drift."""
    from tangent_ray.ops.dedup import MinHashLSH

    lsh = MinHashLSH()
    vals = ", ".join(
        f"({j}, {int(lsh.a[j])}::HUGEINT, {int(lsh.b[j])}::HUGEINT)"
        for j in range(lsh.num_perm)
    )
    r = lsh.rows_per_band
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g
        ), perms(j, a, b) AS (VALUES {vals}),
        sig AS (
          SELECT doc_id, j,
                 (min((a * md5_number_lower(shingle)::HUGEINT + b)
                      % 18446744073709551616::HUGEINT) >> 1) AS u
          FROM sh, perms GROUP BY doc_id, j
        ), bands AS (
          SELECT doc_id, j // {r} AS band,
                 list_reduce(
                   list_prepend(14695981039346656037::HUGEINT,
                                list(u ORDER BY j)),
                   (acc, x) -> (xor(acc::UBIGINT, x::UBIGINT)::HUGEINT
                                * 1099511628211)
                               % 18446744073709551616::HUGEINT) >> 1 AS band_hash
          FROM sig GROUP BY doc_id, j // {r}
        )
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.band_hash = y.band_hash
         AND x.doc_id < y.doc_id
    """


ORACLE_SQL["minhash_candidates"] = _minhash_sql()

# Twin of ops.dedup.simhash_pairs (banding is exact for hamming < n_bands,
# so the oracle is the plain all-pairs XOR-popcount definition).
ORACLE_SQL["simhash_pairs"] = f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM allsim a JOIN allsim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s::UBIGINT, b.s::UBIGINT)) <= 3
"""

def _pii_sql() -> str:
    """DuckDB twin of ops.curation.pii_redact_batch: the same RE2 patterns
    replayed as sequential regexp_replace passes, counting before each."""
    from tangent_ray.ops.curation import PII_PATTERNS

    sql = "WITH r0 AS (SELECT doc_id, text AS t FROM documents)"
    prev = "r0"
    counts = []
    for k, (name, pat, repl) in enumerate(PII_PATTERNS, start=1):
        counts.append(f"n_{name}")
        sql += f""",
        r{k} AS (
          SELECT doc_id, {", ".join(counts[:-1]) + "," if counts[:-1] else ""}
                 len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{name},
                 regexp_replace(t, '{pat}', '{repl}', 'g') AS t
          FROM {prev}
        )"""
        prev = f"r{k}"
    return sql + f"\nSELECT doc_id, {', '.join(counts)}, t AS redacted FROM {prev}"


ORACLE_SQL["pii_redact"] = _pii_sql()

def _decontam_sql() -> str:
    """Twin of q_decontam: same split buckets, DECONTAM_N-gram md5 hashes,
    distinct-per-doc semi-join of the train side against the holdout
    ('test') shingle set. Constants come from the ops so they cannot drift."""
    from tangent_ray.ops.curation import DECONTAM_N
    from tangent_ray.ops.textstats import SPLIT_BUCKETS, SPLIT_TEST, SPLIT_VAL

    gram = " || ' ' || ".join(
        f"ts[i+{j}]" if j else "ts[i]" for j in range(DECONTAM_N)
    )
    return f"""
        WITH split AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
                     % {SPLIT_BUCKETS} AS bucket
          FROM documents
        ), toks AS (
          SELECT d.doc_id, s.bucket,
                 list_filter(string_split_regex(lower(d.text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents d JOIN split s USING (doc_id)
        ), sh AS (
          SELECT doc_id, bucket, md5_number_lower({gram}) AS h
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - {DECONTAM_N - 1}))
                        AS i) g
        ), ho AS (SELECT DISTINCT h FROM sh WHERE bucket < {SPLIT_TEST}),
        tr AS (SELECT DISTINCT doc_id, h FROM sh WHERE bucket >= {SPLIT_VAL}),
        hits AS (
          SELECT doc_id, count(*)::BIGINT AS n_bad
          FROM tr JOIN ho USING (h) GROUP BY doc_id
        )
        SELECT t.doc_id, coalesce(n_bad, 0)::BIGINT AS n_bad,
               coalesce(n_bad, 0) > 0 AS contaminated
        FROM (SELECT doc_id FROM split WHERE bucket >= {SPLIT_VAL}) t
        LEFT JOIN hits USING (doc_id)
    """


ORACLE_SQL["decontam"] = _decontam_sql()


def _sample_sql() -> str:
    from tangent_ray.ops.curation import SAMPLE_BUCKETS, sample_threshold

    cases = " ".join(
        f"WHEN '{s}' THEN {sample_threshold(r)}"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
        WITH b AS (
          SELECT doc_id, source,
                 CAST(concat('0x', substr(md5('s:' || doc_id::VARCHAR), 1, 8))
                      AS BIGINT) % {SAMPLE_BUCKETS} AS bucket
          FROM documents
        )
        SELECT doc_id, source, bucket FROM b
        WHERE bucket < CASE source {cases}
                       ELSE {sample_threshold(SAMPLE_DEFAULT_RATE)} END
    """


ORACLE_SQL["stratified_sample"] = _sample_sql()

# Twin of q_pack_sequences: window cumsum of token counts per source stream
# ordered by doc_id, cut every 256 tokens (empty docs stay in seq_first).
def _pack_sql() -> str:
    """Twin of q_pack_sequences: seq_len pulled from the op (no drift);
    coalesce keeps null-text docs as 0-token rows, matching the engine."""
    from tangent_ray.ops.curation import PACK_SEQ_LEN as L

    return f"""
    WITH dl AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> ''))::BIGINT AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tok,
             coalesce(sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
      FROM dl
    )
    SELECT doc_id, source, n_tok,
           cum // {L} AS seq_first,
           (cum + greatest(n_tok, 1) - 1) // {L} AS seq_last,
           cum % {L} AS seq_offset
    FROM c
"""


ORACLE_SQL["pack_sequences"] = _pack_sql()

def _curated_sql() -> str:
    """Twin of q_curated_corpus: the curation-stage CTEs composed in the
    same order (redact -> gate -> split -> decontam -> dedup -> sample ->
    pack -> summary), every constant pulled from the ops."""
    from tangent_ray.ops.curation import (
        DECONTAM_N,
        PACK_SEQ_LEN,
        PII_PATTERNS,
        SAMPLE_BUCKETS,
        sample_threshold,
    )
    from tangent_ray.ops.textstats import SPLIT_BUCKETS, SPLIT_TEST, SPLIT_VAL

    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    gram = " || ' ' || ".join(
        f"ts[i+{j}]" if j else "ts[i]" for j in range(DECONTAM_N)
    )
    cases = " ".join(
        f"WHEN '{s}' THEN {sample_threshold(r)}"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
        WITH red AS (
          SELECT doc_id, source, {expr} AS text FROM documents
        ), q AS (
          SELECT doc_id, source, text,
                 len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '')) AS n_words,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / length(text) END AS alpha_ratio
          FROM red
        ), f AS (
          SELECT doc_id, source, text,
                 CAST(concat('0x', substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
                     % {SPLIT_BUCKETS} AS bucket
          FROM q
          WHERE n_words >= {CLEAN_MIN_WORDS} AND alpha_ratio >= {CLEAN_MIN_ALPHA}
        ), toks AS (
          SELECT doc_id, bucket,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM f
        ), sh AS (
          SELECT doc_id, bucket, md5_number_lower({gram}) AS h
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - {DECONTAM_N - 1}))
                        AS i) g
        ), bad AS (
          SELECT DISTINCT a.doc_id
          FROM (SELECT DISTINCT doc_id, h FROM sh WHERE bucket >= {SPLIT_VAL}) a
          JOIN (SELECT DISTINCT h FROM sh WHERE bucket < {SPLIT_TEST}) b USING (h)
        ), clean AS (
          SELECT doc_id, source, text FROM f
          WHERE bucket >= {SPLIT_VAL}
            AND doc_id NOT IN (SELECT doc_id FROM bad)
        ), d AS (
          SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source, text
          FROM clean GROUP BY text
        ), s AS (
          SELECT doc_id, source, text FROM d
          WHERE CAST(concat('0x', substr(md5('s:' || doc_id::VARCHAR), 1, 8))
                     AS BIGINT) % {SAMPLE_BUCKETS}
                < CASE source {cases}
                  ELSE {sample_threshold(SAMPLE_DEFAULT_RATE)} END
        ), dl AS (
          SELECT doc_id, source,
                 len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> ''))::BIGINT AS n_tok
          FROM s
        ), c AS (
          SELECT doc_id, source, n_tok,
                 coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0)::BIGINT AS cum
          FROM dl
        )
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(n_tok)::BIGINT AS total_tokens,
               (max((cum + greatest(n_tok, 1) - 1) // {PACK_SEQ_LEN}) + 1)::BIGINT
                   AS n_seqs
        FROM c GROUP BY source
    """


ORACLE_SQL["curated_corpus"] = _curated_sql()


def _multimodal_sql() -> str:
    """Twin of q_multimodal_meta: every header fact (and the exact payload
    byte size) is a pure function of the row index, so the oracle
    recomputes the generator's parameters from ``range(n)`` and the parsers
    must round-trip them from the actual bytes. The per-format byte-size
    constants are MEASURED from the makers here (not hard-coded) so a
    header-layout change keeps generator, parser and twin in lockstep."""
    from tangent_ray.ops.multimodal import (
        MM_CODECS,
        make_gif,
        make_jpeg,
        make_mp4,
        make_png,
        make_wav,
    )

    len_png = len(make_png(1, 1))
    len_gif = len(make_gif(1, 1))
    len_jpeg = len(make_jpeg(1, 1, orientation=1))
    len_wav = len(make_wav(250))
    mp4_1 = len(make_mp4(250, tracks=("avc1",)))
    mp4_per_track = len(make_mp4(250, tracks=("avc1", "hev1"))) - mp4_1
    mp4_base = mp4_1 - mp4_per_track
    codecs = ", ".join(f"'{c}'" for c in MM_CODECS)
    return f"""
        SELECT i AS media_id,
               CASE i%5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'jpeg'
                        WHEN 3 THEN 'wav' ELSE 'mp4' END AS format,
               (CASE WHEN i%5 <= 2 THEN (i*37)%1920+1 ELSE -1 END)::INT AS width,
               (CASE WHEN i%5 <= 2 THEN (i*53)%1080+1 ELSE -1 END)::INT AS height,
               (CASE WHEN i%5 >= 3 THEN (i+1)*250 ELSE -1 END)::BIGINT AS duration_ms,
               (CASE WHEN i%5 = 0 THEN 8 + 8*(i%2) ELSE -1 END)::INT AS bit_depth,
               (CASE WHEN i%5 = 2 THEN (i%8)+1 ELSE -1 END)::INT AS orientation,
               (CASE WHEN i%5 = 4 THEN (i%3)+1 ELSE -1 END)::INT AS n_tracks,
               CASE WHEN i%5 = 4 THEN list_value({codecs})[(i%3)+1]
                    ELSE '' END AS codec,
               (CASE WHEN i%5 = 3 THEN 8000*(1+i%3) ELSE -1 END)::INT AS sample_rate,
               (CASE i%5 WHEN 0 THEN {len_png} WHEN 1 THEN {len_gif}
                         WHEN 2 THEN {len_jpeg} WHEN 3 THEN {len_wav}
                         ELSE {mp4_base} + {mp4_per_track} * ((i%3)+1)
                END)::BIGINT AS payload_bytes
        FROM range({MM_N}) t(i)
    """


ORACLE_SQL["multimodal_meta"] = _multimodal_sql()

# Twin of q_asof_attribution via DuckDB's native ASOF JOIN; the right side
# is pre-deduped to max(event_id) per (user, ts) — same tie rule as the op.
ORACLE_SQL["asof_attribution"] = """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, max(event_id) AS cid
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.cid AS matched_id, c.ts AS matched_ts,
           (epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS lag_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# Twin of q_range_active_sessions: the sessions CTE (same as the sessions
# oracle) range-joined back to events with an inclusive BETWEEN.
ORACLE_SQL["range_active_sessions"] = f"""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL {{gap}} MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), sess AS (
      SELECT min(ts) AS session_start, max(ts) AS session_end
      FROM numbered GROUP BY user_id, session_idx
    )
    SELECT e.event_id, count(s.session_start)::BIGINT AS n_active
    FROM events e
    LEFT JOIN sess s ON e.ts BETWEEN s.session_start AND s.session_end
    GROUP BY e.event_id
""".replace("{gap}", str(SESSION_GAP_MIN))

ORACLE_SQL["distinct_tokens"] = f"""
    SELECT count(DISTINCT term)::BIGINT AS distinct_tokens
    FROM {TOKS} WHERE term <> ''
"""

def _chunk_sql() -> str:
    """Twin of q_chunk_spans: max/stride pulled from the op (no drift)."""
    from tangent_ray.ops.curation import CHUNK_OVERLAP, CHUNK_TOKENS

    M, S = CHUNK_TOKENS, CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
    WITH w AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> ''))::BIGINT AS n
      FROM documents
    ), c AS (
      SELECT doc_id, n,
             CASE WHEN n > 0
                  THEN 1 + (greatest(n - {M}, 0) + {S - 1}) // {S}
                  ELSE 0 END AS nc
      FROM w
    )
    SELECT doc_id, i AS chunk_idx, (i * {S})::BIGINT AS tok_start,
           least(i * {S} + {M}, n)::BIGINT AS tok_end, n AS n_tok
    FROM c, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i) g
"""


ORACLE_SQL["chunk_spans"] = _chunk_sql()

ORACLE_SQL["top_tokens"] = f"""
    SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term)::BIGINT AS rank
    FROM (
      SELECT term, count(*)::BIGINT AS cnt
      FROM {TOKS} WHERE term <> '' GROUP BY term
    )
    ORDER BY cnt DESC, term LIMIT 20
"""

ORACLE_SQL["top_events_per_type"] = """
    SELECT event_type, event_id, value, rank FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id
             )::BIGINT AS rank
      FROM events
    ) WHERE rank <= 3
"""

# Twin of q_doclen_quantiles: same k = ceil(q*n) rank rule; the threshold
# is the smallest n_words whose cumulative count reaches k.
ORACLE_SQL["doclen_quantiles"] = """
    WITH w AS (
      SELECT len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> ''))::BIGINT AS n_words
      FROM documents
    ), n AS (SELECT count(*)::BIGINT AS c FROM w),
    cum AS (
      SELECT n_words, sum(count(*)) OVER (ORDER BY n_words)::BIGINT AS cr
      FROM w GROUP BY n_words
    ),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q)
    SELECT qs.q,
           CAST(ceil(qs.q * n.c) AS BIGINT) AS k,
           (SELECT min(n_words) FROM cum
             WHERE cr >= CAST(ceil(qs.q * n.c) AS BIGINT)) AS value,
           (SELECT count(*)::BIGINT FROM w
             WHERE n_words >= (SELECT min(n_words) FROM cum
                                WHERE cr >= CAST(ceil(qs.q * n.c) AS BIGINT))
           ) AS n_ge
    FROM qs, n
"""

ORACLE_SQL["orders_customers"] = """
    SELECT o.o_orderkey, o.o_custkey AS custkey, o.o_totalprice,
           c.c_name, c.c_nationkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""

ORACLE_SQL["customer_nation_bc"] = """
    SELECT c.c_custkey, c.c_nationkey AS nationkey, c.c_acctbal, n.n_name
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""

# ---------------------------------------------------------------------------
# Round-3 gate consolidation: the driver grades at most 50 entries, so
# related per-doc signal ops share one slot each (the events_windows
# precedent) and the freed slots carry the round-3 curation wave (Gopher
# gate, C4 cleaning, paragraph dedup+rebuild, source-mix resampling) under
# the exact-oracle gate. Every merged constituent keeps its own pytest
# DuckDB twin; the merged entry re-verifies the same values end to end.

#: repetition twin (tests/test_repetition.py), embeddable as a CTE body
REPETITION_TWIN_SQL = """
WITH l0 AS (
  SELECT doc_id, u.line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents) d,
       LATERAL (SELECT unnest(ls) AS line) u
  WHERE u.line <> ''
),
lg AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len
  FROM l0 GROUP BY doc_id, line
),
ls AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         sum(c * len) AS line_chars,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_lines,
         sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS dup_line_chars
  FROM lg GROUP BY doc_id
),
tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
tc AS (SELECT doc_id, len(ts) AS n_tokens FROM tk),
g2 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g, count(*) AS c
  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) gi
  GROUP BY doc_id, g
),
g2s AS (SELECT doc_id, max(c) AS top2 FROM g2 GROUP BY doc_id),
g3 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g,
         count(*) AS c
  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) gi
  GROUP BY doc_id, g
),
g3s AS (
  SELECT doc_id, max(c) AS top3,
         sum(CASE WHEN c >= 2 THEN 3 * c ELSE 0 END) AS dup3
  FROM g3 GROUP BY doc_id
)
SELECT tc.doc_id,
       coalesce(ls.n_lines, 0)::BIGINT AS n_lines,
       tc.n_tokens::BIGINT AS n_tokens,
       round(coalesce(ls.dup_lines / nullif(ls.n_lines, 0), 0), 6)
           AS dup_line_frac,
       round(coalesce(ls.dup_line_chars / nullif(ls.line_chars, 0), 0), 6)
           AS dup_line_char_frac,
       round(coalesce(least(coalesce(2 * g2s.top2, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS top2gram_frac,
       round(coalesce(least(coalesce(3 * g3s.top3, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS top3gram_frac,
       round(coalesce(least(coalesce(g3s.dup3, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS dup3gram_frac
FROM tc
LEFT JOIN ls USING (doc_id)
LEFT JOIN g2s USING (doc_id)
LEFT JOIN g3s USING (doc_id)
"""


def doc_signals_batch(batch: pa.Table) -> pa.Table:
    """Merged per-doc signal row: quality + lexical + entropy + repetition
    columns, one row per input row (lexical's zero-word drops re-aligned
    and zero-filled — the twin coalesces identically)."""
    from tangent_ray.ops.textstats import (
        lexical_stats_batch,
        quality_batch,
        repetition_batch,
        token_entropy_batch,
    )

    q = quality_batch(batch)
    lx = lexical_stats_batch(batch)
    en = token_entropy_batch(batch)
    rep = repetition_batch(batch)
    n = batch.num_rows
    nw = q["n_words"].to_numpy(zero_copy_only=False)
    distinct = np.zeros(n, np.int64)
    ttr = np.zeros(n, np.float64)
    twf = np.zeros(n, np.float64)
    idx = np.flatnonzero(nw > 0)
    if lx.num_rows:
        distinct[idx] = lx["distinct_words"].to_numpy(zero_copy_only=False)
        ttr[idx] = lx["type_token_ratio"].to_numpy(zero_copy_only=False)
        twf[idx] = lx["top_word_fraction"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": q["n_words"],
            "alpha_ratio": q["alpha_ratio"],
            "distinct_words": pa.array(distinct, type=pa.int64()),
            "type_token_ratio": pa.array(ttr, type=pa.float64()),
            "top_word_fraction": pa.array(twf, type=pa.float64()),
            "token_entropy": en["token_entropy"],
            "n_lines": rep["n_lines"],
            "dup_line_frac": rep["dup_line_frac"],
            "dup_line_char_frac": rep["dup_line_char_frac"],
            "top2gram_frac": rep["top2gram_frac"],
            "top3gram_frac": rep["top3gram_frac"],
            "dup3gram_frac": rep["dup3gram_frac"],
        }
    )


def q_doc_signals(sf_dir: str):
    """Per-document quality signal panel — word count / alpha ratio
    (quality_batch), TTR / top-word fraction (lexical_stats_batch),
    unigram token entropy (token_entropy_batch), and the five Gopher
    repetition fractions (repetition_batch) — ONE stateless vectorized
    map over the corpus, no shuffle. Each signal remains its own
    production op; this merged table keeps all four under a single
    driver-gate slot."""
    import ray.data

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    return _collect(ds.map_batches(doc_signals_batch, batch_format="pyarrow"))


GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000

#: Gopher 11-bit fail mask twin (tests/test_gopher.py), parameters inlined
GOPHER_TWIN_SQL = (
    "WITH rep AS (" + REPETITION_TWIN_SQL + "),\n"
    + """tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x <> '') AS ts,
         coalesce(text, '') AS t
  FROM documents
),
w AS (
  SELECT doc_id,
         len(ts)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(ts, x -> length(x))), 0)::DOUBLE
             AS len_sum,
         len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))::BIGINT
             AS alpha_words,
         len(list_distinct(list_filter(ts, x -> x IN
             ('the','be','to','of','and','that','have','with'))))::BIGINT
             AS n_stop,
         (length(t) - length(replace(t, '#', '')))::BIGINT
           + len(regexp_extract_all(t, '\\.{3}'))::BIGINT
           + (length(t) - length(replace(t, '…', '')))::BIGINT AS symbols
  FROM tk
),
l0 AS (
  SELECT doc_id, u.line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents) d,
       LATERAL (SELECT unnest(ls) AS line) u
  WHERE u.line <> ''
),
ln AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_lines,
         sum(CASE WHEN regexp_matches(line, '^\\s*([-*•‣▪●])')
                  THEN 1 ELSE 0 END)::BIGINT AS bullet,
         sum(CASE WHEN regexp_matches(line, '(\\.{3}|…)\\s*$')
                  THEN 1 ELSE 0 END)::BIGINT AS ell_end
  FROM l0 GROUP BY doc_id
)
SELECT w.doc_id, w.n_words,
       (CASE WHEN w.n_words < """ + str(GOPHER_MIN_WORDS)
    + " OR w.n_words > " + str(GOPHER_MAX_WORDS)
    + """
             THEN 1 ELSE 0 END
        + CASE WHEN coalesce(w.len_sum / nullif(w.n_words, 0), 0) < 3
                 OR coalesce(w.len_sum / nullif(w.n_words, 0), 0) > 10
               THEN 2 ELSE 0 END
        + CASE WHEN coalesce(w.symbols / nullif(w.n_words, 0)::DOUBLE,
                             'inf'::DOUBLE) > 0.1 THEN 4 ELSE 0 END
        + CASE WHEN coalesce(ln.bullet / nullif(ln.n_lines, 0)::DOUBLE, 0) > 0.9
                 OR coalesce(ln.ell_end / nullif(ln.n_lines, 0)::DOUBLE, 0) > 0.3
               THEN 8 ELSE 0 END
        + CASE WHEN coalesce(w.alpha_words / nullif(w.n_words, 0)::DOUBLE, 0) < 0.8
               THEN 16 ELSE 0 END
        + CASE WHEN w.n_stop < 2 THEN 32 ELSE 0 END
        + CASE WHEN rep.dup_line_frac > 0.30 THEN 64 ELSE 0 END
        + CASE WHEN rep.dup_line_char_frac > 0.20 THEN 128 ELSE 0 END
        + CASE WHEN rep.top2gram_frac > 0.20 THEN 256 ELSE 0 END
        + CASE WHEN rep.top3gram_frac > 0.18 THEN 512 ELSE 0 END
        + CASE WHEN rep.dup3gram_frac > 0.16 THEN 1024 ELSE 0 END
       )::BIGINT AS fail_mask
FROM w JOIN rep ON w.doc_id = rep.doc_id
LEFT JOIN ln ON w.doc_id = ln.doc_id
"""
)


def q_gopher_quality(sf_dir: str):
    """Composed 11-rule Gopher quality gate (word/shape/stopword rules +
    the five repetition caps) as a per-doc fail bitmask — one vectorized
    map, no shuffle; the DuckDB twin reproduces every bit."""
    import ray.data

    from tangent_ray.ops.textstats import gopher_filter

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    t = _collect(
        gopher_filter(
            ds, min_words=GOPHER_MIN_WORDS, max_words=GOPHER_MAX_WORDS
        )
    )
    return t.select(["doc_id", "n_words", "fail_mask", "keep"])


def q_c4_clean(sf_dir: str):
    """C4 line-cleaning pass (Raffel et al. 2020): terminal-punctuation +
    min-word line filter, rebuilt text, lorem-ipsum / brace page gates —
    one vectorized map; the twin rebuilds identical text in SQL."""
    import ray.data

    from tangent_ray.ops.curation import c4_filter

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    t = _collect(c4_filter(ds))
    return t.select(
        ["doc_id", "text", "n_kept_lines", "n_dropped_lines", "keep"]
    )


def q_paragraph_cuts(sf_dir: str):
    """Corpus-wide paragraph dedup end to end: ``paragraph_dedup`` keeps a
    paragraph only at its minimum (doc_id, para_idx) occurrence (one
    paragraph-hash groupby), then ``apply_paragraph_cuts`` rebuilds every
    touched document from its kept splits (one id-hash shard groupby).
    The twin replays both stages in SQL, including the rebuilt text."""
    import ray.data

    from tangent_ray.ops.dedup import apply_paragraph_cuts, paragraph_dedup

    docs = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    flags = paragraph_dedup(docs)
    t = _collect(apply_paragraph_cuts(docs, flags))
    return _cast64(
        t.select(["doc_id", "text", "n_cut_paras"]), ["doc_id", "n_cut_paras"]
    )


#: fixed mixture shared with the SQL twin; src0 upsample hits the
#: max_epochs cap (exact multiplier 10.0), the rest exercise fractional
#: epochs; sources outside the dict are dropped (multiplier 0)
MIX_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0, "src3": 0.5}
MIX_MAX_EPOCHS = 10.0


def q_source_mix(sf_dir: str):
    """Source-mix resampling (The Pile / DoReMi-style epoch weighting):
    per-source multipliers from a #sources-row groupby over a narrow
    (id, source, n_tok) table, then a stateless replicating map — full
    epochs 0..floor(m)-1 plus a deterministic md5-Bernoulli fractional
    epoch. Payload text never moves."""
    import ray.data

    from tangent_ray.ops.curation import source_mix_resample

    ds = ray.data.read_parquet(
        _doc_path(sf_dir), columns=["doc_id", "text", "source"]
    )
    return _collect(
        source_mix_resample(ds, MIX_WEIGHTS, max_epochs=MIX_MAX_EPOCHS)
    )


TOPK_TOKENS = 20
VOCAB_MARKER = "__vocabulary__"


def q_token_sketches(sf_dir: str):
    """Corpus token sketches in one slot: certified shuffle-free exact
    top-20 heavy hitters (rank >= 1) + the exact distinct-token count as a
    rank-0 marker row (the vocabulary itself never reaches the driver —
    the count is a distributed ``Dataset.count()`` of the grouped vocab)."""
    import ray.data
    from ray.data.aggregate import Count

    from tangent_ray.ops.sketch import heavy_hitters
    from tangent_ray.ops.textstats import df_count_partial

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    top = heavy_hitters(
        ray.data.read_parquet(_doc_path(sf_dir), columns=["text"]),
        k=TOPK_TOKENS,
    )
    n_vocab = (
        ds.map_batches(df_count_partial, batch_format="pyarrow")
        .groupby(["kind", "th"])
        .aggregate(Count(alias_name="c"))
        .map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 0)), batch_format="pyarrow"
        )
        .count()
    )
    marker = pa.table(
        {
            "term": pa.array([VOCAB_MARKER], type=pa.string()),
            "cnt": pa.array([n_vocab], type=pa.int64()),
            "rank": pa.array([0], type=pa.int64()),
        }
    )
    return pa.concat_tables([top.select(["term", "cnt", "rank"]), marker])


def q_simhash_dup(sf_dir: str):
    """SimHash near-dup detection in one slot: 64-bit signatures (``sig``
    rows, doc_b = -1) + the exact Hamming<=3 pair set from the banded
    pigeonhole shuffle (``pair`` rows, sig = 0)."""
    import ray.data

    from tangent_ray.ops.dedup import simhash_batch, simhash_pairs

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    sig = _collect(ds.map_batches(simhash_batch, batch_format="pyarrow"))
    pairs = _cast64(_collect(simhash_pairs(ds)), ["doc_a", "doc_b"])
    n, m = sig.num_rows, pairs.num_rows
    return pa.table(
        {
            "kind": pa.array(["sig"] * n + ["pair"] * m, type=pa.string()),
            "doc_a": pa.concat_arrays(
                [
                    pc.cast(sig["doc_id"], pa.int64()).combine_chunks(),
                    pairs["doc_a"].combine_chunks(),
                ]
            ),
            "doc_b": pa.concat_arrays(
                [
                    pa.array(np.full(n, -1, np.int64), type=pa.int64()),
                    pairs["doc_b"].combine_chunks(),
                ]
            ),
            "sig": pa.concat_arrays(
                [
                    pc.cast(sig["simhash"], pa.int64()).combine_chunks(),
                    pa.array(np.zeros(m, np.int64), type=pa.int64()),
                ]
            ),
        }
    )


def q_doc_signatures(sf_dir: str):
    """Per-document signature families in ONE gate slot (tagged union on
    ``kind``): SimHash 64-bit signatures (``sig``), the exact banded
    Hamming<=3 SimHash pair set (``pair``), and the rolling-hash document
    fingerprints (``fp`` rows, doc_b = -1, sig = fingerprint) — the two
    round-2-verified slots merged under the 50-entry budget."""
    import ray.data

    from tangent_ray.ops.textstats import fingerprint_batch

    sim = q_simhash_dup(sf_dir)
    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    fp = _collect(ds.map_batches(fingerprint_batch, batch_format="pyarrow"))
    n = fp.num_rows
    fpu = pa.table(
        {
            "kind": pa.array(["fp"] * n, type=pa.string()),
            "doc_a": pc.cast(fp["doc_id"], pa.int64()),
            "doc_b": pa.array(np.full(n, -1, np.int64), type=pa.int64()),
            "sig": pc.cast(fp["fingerprint"], pa.int64()),
        }
    )
    return pa.concat_tables([sim, fpu])


_MC_K = 50  # DSIR sample size at the gate


def q_model_curation(sf_dir: str):
    """Model-based curation in ONE gate slot (tagged union on ``method``):

    - ``nb``   — hashed Naive-Bayes quality scores over the documents
      table seeded on ``lang = 'en'`` labels (ival = fixed-point score,
      ival2 = hashed-unigram count, flag = predicted positive);
    - ``dsir`` — the DSIR Gumbel-top-k importance resample of the same
      corpus toward the en target (ival = selection key, ival2 = raw
      importance weight, flag = true for every selected row).

    Both models are trained IN the pipeline (one bounded (bucket, label)
    groupby each) and scored streaming against a broadcast dense array;
    fixed-point integer sums make the DuckDB twin exact
    (tests/test_classify.py carries the same twins at a smaller D)."""
    import ray.data

    from tangent_ray.ops.classify import dsir_sample, nb_score, nb_train

    tbl = ray.data.read_parquet(
        _doc_path(sf_dir), columns=["doc_id", "text", "lang"]
    )

    def add_label(b: pa.Table) -> pa.Table:
        return b.append_column("label", pc.equal(b["lang"], "en"))

    ds = tbl.map_batches(add_label, batch_format="pyarrow")
    model = nb_train(ds)
    nb = _collect(nb_score(ds, model))
    dsir = _collect(dsir_sample(ds, k=_MC_K))

    def shape(method, t, ival, ival2, flag):
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array([method] * n, type=pa.string()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "ival": pc.cast(t[ival], pa.int64()),
                "ival2": pc.cast(t[ival2], pa.int64()),
                "flag": pc.cast(t[flag], pa.bool_())
                if flag in t.column_names
                else pa.array([True] * n, type=pa.bool_()),
            }
        )

    return pa.concat_tables(
        [
            shape("nb", nb, "score_e6", "n_grams", "pred"),
            shape("dsir", dsir, "key_e6", "weight_e6", "keep"),
        ]
    )


def q_shingle_pairs(sf_dir: str):
    """Shingle-based near-dup detection in one slot: 5-gram candidate
    pairs (``cand`` rows, jaccard = -1) + exact 4-gram Jaccard scores over
    the candidate graph (``jac`` rows) — the exact counterpart that
    minhash_candidates approximates."""
    import ray.data

    from tangent_ray.ops.dedup import jaccard_pairs, shingle_candidates

    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    cand = _cast64(
        _collect(shingle_candidates(ds, n=SHINGLE_N)).select(
            ["doc_a", "doc_b"]
        ),
        ["doc_a", "doc_b"],
    )
    jac = _collect(jaccard_pairs(ds, n=JACCARD_N))
    n, m = cand.num_rows, jac.num_rows
    return pa.table(
        {
            "kind": pa.array(["cand"] * n + ["jac"] * m, type=pa.string()),
            "doc_a": pa.concat_arrays(
                [
                    cand["doc_a"].combine_chunks(),
                    pc.cast(jac["doc_a"], pa.int64()).combine_chunks(),
                ]
            ),
            "doc_b": pa.concat_arrays(
                [
                    cand["doc_b"].combine_chunks(),
                    pc.cast(jac["doc_b"], pa.int64()).combine_chunks(),
                ]
            ),
            "jaccard": pa.concat_arrays(
                [
                    pa.array(np.full(n, -1.0), type=pa.float64()),
                    pa.array(
                        round_half_away(
                            jac["jaccard"].to_numpy(zero_copy_only=False), 6
                        ),
                        type=pa.float64(),
                    ),
                ]
            ),
        }
    )


UNIFORM_K = 100


def q_sampling(sf_dir: str):
    """Deterministic sampling in one slot: per-source stratified Bernoulli
    rows (``strat``, key = md5 bucket) + the fixed-size min-wise uniform
    sample (``unif``, key = salted md5 sample key, k smallest corpus-wide
    without ever sorting the corpus)."""
    import functools

    import ray.data

    from tangent_ray.ops.curation import (
        sample_key,
        stratified_sample_batch,
        uniform_sample,
    )

    fn = functools.partial(
        stratified_sample_batch,
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
    )
    ds = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id", "source"])
    strat = _collect(ds.map_batches(fn, batch_format="pyarrow"))
    ids = ray.data.read_parquet(_doc_path(sf_dir), columns=["doc_id"])
    unif = _collect(uniform_sample(ids, k=UNIFORM_K))
    u_ids = unif["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n, m = strat.num_rows, unif.num_rows
    return pa.table(
        {
            "kind": pa.array(["strat"] * n + ["unif"] * m, type=pa.string()),
            "doc_id": pa.concat_arrays(
                [
                    pc.cast(strat["doc_id"], pa.int64()).combine_chunks(),
                    pa.array(u_ids, type=pa.int64()),
                ]
            ),
            "source": pa.concat_arrays(
                [
                    strat["source"].combine_chunks(),
                    pa.array([""] * m, type=pa.string()),
                ]
            ),
            "key": pa.concat_arrays(
                [
                    pc.cast(strat["bucket"], pa.int64()).combine_chunks(),
                    pa.array(sample_key(u_ids), type=pa.int64()),
                ]
            ),
        }
    )


# fixed parameters of the advanced-search gate entry, shared with its twin
PROX_WINDOW, PROX_K = 10, 20
NEG_EXCLUDE = "window"
NEG_QUERY = " ".join(BM25_QUERY_TERMS) + " -" + NEG_EXCLUDE
FUZZY_WORD, FUZZY_TOPN = "sprak", 5
FACET_QUERY = "spark hash"
FACET_COLS = ("lang", "source")
PREFIX_TERM, PREFIX_CAP = "s", 4  # s* under a cap that exercises the df rule
SYN_MEMBERS = ("spark", "stream")
SYN_QUERY = "{" + ",".join(SYN_MEMBERS) + "} join"
FILTER_QUERY = " ".join(BM25_QUERY_TERMS) + " #lang:en"
MLT_DOC, MLT_TOPN, MLT_K = 3, 5, 20
SPAN_SLOP = 8  # ordered "table hash"~8
BOOST_TERM, BOOST_W = "spark", 2.0
BOOST_QUERY = f"{BOOST_TERM}^{BOOST_W:g} hash join"
RRF_DEPTH, RRF_K, RRF_C = 20, 10, 60  # hybrid BM25+ANN fusion
WILD_PAT, WILD_LIKE = "s*a*", "s%a%"  # glob wildcard query + its LIKE twin
COLLAPSE_COL, COLLAPSE_K, COLLAPSE_PER = "source", 5, 2  # field collapsing
RANGE_COL, RANGE_CUT = "n_chars", 300  # numeric range filter #n_chars>300
REGEX_PAT = "s.a.*"  # /s.a.*/ regexp term query (scan|spark|small)
PQ_SLOP = 2  # sloppy scored phrase "table hash"~2
MM_MIN = 2  # minimum_should_match #mm:2
MUST_TERM = "spark"  # +spark hash join — Lucene MUST clause


def _docs_feature_index(sf_dir: str) -> str:
    """documents index + facet/suggest sidecars (built once per lineage,
    under the same lock the base index build takes)."""
    import fcntl
    import json

    from tangent_ray.query.facets import FACETS_DIR, build_facet_sidecar
    from tangent_ray.query.fuzzy import SUGGEST_NAME, build_suggest_index

    idx = _docs_index(sf_dir)
    with open(idx + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if not os.path.exists(os.path.join(idx, SUGGEST_NAME)):
            build_suggest_index(idx, max_edit=2)
        # incremental: partials whose sidecar already carries exactly
        # these columns are skipped, and a cached index built with an
        # older column set rebuilds via the schema check
        build_facet_sidecar(idx, [*FACET_COLS, RANGE_COL])
    return idx


def q_search_features(sf_dir: str):
    """Advanced search features in one gate slot, as a tagged union table:
    exact phrase occurrence top-k (``phrase``), proximity minimal-span
    top-k (``prox``), negated BM25 with ``-term`` exclusion (``neg``),
    SymSpell deletes-index fuzzy suggestions (``fuzzy``), candidate-set
    facet counts (``facet``), capped prefix expansion BM25 (``prefix``),
    synonym-group blended BM25 (``syn``), metadata-filtered BM25
    (``filterq``), more-like-this (``mlt``), ordered span-near with slop
    (``spannear``), per-term ^boosts (``boost``), hybrid BM25+ANN
    reciprocal-rank fusion (``rrf``), search_after page-2 cursor
    paging (``page2``), df-ranked autocomplete (``complete``), glob
    wildcard terms (``wild``), field collapsing (``collapse``), numeric
    range filters (``rangef``), explain() breakdowns (``explain``),
    Lucene-style fuzzy query terms ``word~d`` scored as the blended
    synonym group of the edit-distance expansion (``fuzzyq``), regexp
    term queries ``/pat/`` (``regexq``), minimum_should_match ``#mm:N``
    (``mm2``), scored exact/sloppy phrase clauses ``"a b"`` /
    ``"a b"~s`` as BM25 pseudo-terms (``phraseq`` / ``phrasesl``),
    ``+term`` required MUST clauses (``must``), match-all ``*`` with a
    metadata filter (``matchall``), the stats aggregation over a
    numeric metadata column (``fstats``), and sort-by-field result
    ordering (``sortby``).
    Each constituent keeps its own
    pytest differential suite (tests/test_phrase|proximity|negation|
    fuzzy|facets|expand|spannear|hybrid|phraseq|regexq|mm|must|
    facet_stats.py); the twin re-derives all twenty-seven from the raw
    corpus + embeddings tables."""
    from tangent_ray.index.positions import phrase_search, proximity_search
    from tangent_ray.query.facets import FacetCounter, facet_counts
    from tangent_ray.query.fuzzy import Suggester
    from tangent_ray.query.scorer import QueryScorer, search

    rows: dict[str, list] = {
        "feature": [], "key": [], "doc_id": [],
        "ival": [], "score": [], "sval": [],
    }

    def add(feature, key, doc_id, ival, score, sval):
        rows["feature"].append(feature)
        rows["key"].append(key)
        rows["doc_id"].append(int(doc_id))
        rows["ival"].append(int(ival))
        rows["score"].append(float(score))
        rows["sval"].append(sval)

    pos = _positions_sidecar(sf_dir)
    ph = phrase_search(pos, PHRASE_QUERY, k=PHRASE_K)
    for d, c in zip(ph.column(0).to_pylist(), ph.column(1).to_pylist()):
        add("phrase", PHRASE_QUERY, d, c, 0.0, "")
    pr = proximity_search(pos, PHRASE_QUERY, window=PROX_WINDOW, k=PROX_K)
    for d, s in zip(pr["docid"].to_pylist(), pr["min_span"].to_pylist()):
        add("prox", PHRASE_QUERY, d, s, 0.0, "")
    # the DOC-PARTITIONED serving layout (PositionalEngine broadcasting
    # kernels to doc-disjoint part actors) must answer identically to
    # the term-sharded reader path — folding the check here puts the new
    # layout under the same oracle row
    from tangent_ray.index.positions import PositionalEngine

    eng = PositionalEngine(
        os.path.join(os.path.dirname(pos), "data_dpart"), n_shards=2
    )
    try:
        if not eng.phrase(PHRASE_QUERY, k=PHRASE_K).equals(ph):
            raise AssertionError(
                "doc-partitioned PositionalEngine diverged from the "
                "term-sharded reader on the phrase feature"
            )
        pr2 = eng.proximity(PHRASE_QUERY, window=PROX_WINDOW, k=PROX_K)
        if not pr2.equals(pr):
            raise AssertionError(
                "doc-partitioned PositionalEngine diverged from the "
                "term-sharded reader on the proximity feature"
            )
    finally:
        eng.shutdown()

    idx = _docs_feature_index(sf_dir)
    res = _collect(
        search(
            [{"query_id": "q", "kind": "text", "text": NEG_QUERY}],
            idx,
            topk=BM25_K,
        )
    )
    neg_scores = round_half_away(
        res["score"].to_numpy(zero_copy_only=False), 6
    )
    for d, s in zip(res["docid"].to_pylist(), neg_scores):
        add("neg", NEG_QUERY, d, 0, s, "")
    for term, dist, df in Suggester(idx).suggest(FUZZY_WORD, topn=FUZZY_TOPN):
        add("fuzzy", FUZZY_WORD, -1, dist, float(df), term)
    scorer, counter = QueryScorer(idx), FacetCounter(idx)
    scorer.attach_positions(pos)  # quoted-phrase clauses
    for col in FACET_COLS:
        fc = facet_counts(idx, FACET_QUERY, col, counter=counter, scorer=scorer)
        for v, nd in zip(fc["value"].to_pylist(), fc["n_docs"].to_pylist()):
            add("facet", col, -1, nd, 0.0, v)
    # stats aggregation over the same candidate set (tests/test_facet_stats)
    from tangent_ray.query.facets import facet_stats, sorted_search

    fs = facet_stats(
        idx, FACET_QUERY, RANGE_COL, counter=counter, scorer=scorer
    ).to_pylist()[0]
    for name in ("min", "max", "sum", "avg"):
        add("fstats", RANGE_COL, -1, fs["n_docs"],
            float(round_half_away(np.array([fs[f"v{name}"]]), 6)[0]), name)
    # sort-by-field (tests/test_facet_stats.py sorted_search tests)
    so = sorted_search(
        idx, FACET_QUERY, RANGE_COL, k=BM25_K, ascending=False,
        counter=counter, scorer=scorer,
    )
    for rk, dd, sv in zip(
        so["rank"].to_pylist(), so["docid"].to_pylist(),
        so["sort_value"].to_pylist(),
    ):
        add("sortby", RANGE_COL, dd, rk, float(sv), "")
    # ordered span-near (round 3: tests/test_spannear.py)
    from tangent_ray.index.positions import span_near_search

    sn = span_near_search(pos, PHRASE_QUERY, slop=SPAN_SLOP, k=PROX_K)
    for d, sl in zip(sn["docid"].to_pylist(), sn["min_span"].to_pylist()):
        add("spannear", PHRASE_QUERY, d, sl, 0.0, "")
    # expansion / boost / filter / more-like-this (tests/test_expand.py)
    scorer.prefix_max_expansions = PREFIX_CAP
    for tag, q in (
        ("prefix", PREFIX_TERM + "*"),
        ("syn", SYN_QUERY),
        ("filterq", FILTER_QUERY),
        ("boost", BOOST_QUERY),
        ("wild", WILD_PAT),
        ("rangef", " ".join(BM25_QUERY_TERMS) + f" #{RANGE_COL}>{RANGE_CUT}"),
        ("fuzzyq", f"{FUZZY_WORD}~2 join"),
        ("regexq", f"/{REGEX_PAT}/ join"),
        ("mm2", " ".join(BM25_QUERY_TERMS) + f" #mm:{MM_MIN}"),
        ("phraseq", f'"{PHRASE_QUERY}" join'),
        ("phrasesl", f'"{PHRASE_QUERY}"~{PQ_SLOP}'),
        ("must", f"+{MUST_TERM} hash join"),
        ("matchall", "* #lang:en"),
    ):
        d, s = scorer.score_query(q, "text", BM25_K)
        for dd, ss in zip(d.tolist(), round_half_away(s, 6)):
            add(tag, q, dd, 0, ss, "")
    from tangent_ray.query.mlt import more_like_this

    import pyarrow.dataset as pads

    src = (
        pads.dataset(_doc_path(sf_dir))
        .to_table(columns=["text"], filter=pads.field("doc_id") == MLT_DOC)
    )
    mlt = more_like_this(
        scorer, src["text"][0].as_py(), k=MLT_K,
        max_query_terms=MLT_TOPN, exclude_docids=(MLT_DOC,),
    )
    for dd, ss in zip(
        mlt["docid"].to_pylist(),
        round_half_away(mlt["score"].to_numpy(zero_copy_only=False), 6),
    ):
        add("mlt", f"doc{MLT_DOC}", dd, 0, ss, "")
    # field collapsing: top sources by best doc, 2 reps each
    from tangent_ray.query.facets import collapsed_search

    co = collapsed_search(
        idx, " ".join(BM25_QUERY_TERMS), COLLAPSE_COL,
        k=COLLAPSE_K, per_group=COLLAPSE_PER, counter=counter, scorer=scorer,
    )
    for rk, val, dd, ss, gr in zip(
        co["rank"].to_pylist(), co["value"].to_pylist(),
        co["docid"].to_pylist(),
        round_half_away(co["score"].to_numpy(zero_copy_only=False), 6),
        co["group_rank"].to_pylist(),
    ):
        add("collapse", COLLAPSE_COL, dd, rk * 1000 + gr, ss, val)
    # autocomplete: top completions of the fuzzy word's first 2 chars
    comp = scorer.reader.complete(FUZZY_WORD[:2], n=FUZZY_TOPN)
    for t_, df_ in zip(comp["term"].to_pylist(), comp["df"].to_pylist()):
        add("complete", FUZZY_WORD[:2], -1, df_, 0.0, t_)
    # search_after page 2 (tests/test_search_after.py): the next BM25_K
    # rows after page 1's cursor — twin = OFFSET paging of the same order
    bq = " ".join(BM25_QUERY_TERMS)
    d1, s1 = scorer.score_query(bq, "text", BM25_K)
    if len(d1):
        d2, s2 = scorer.score_query(
            bq, "text", BM25_K, after=(float(s1[-1]), int(d1[-1]))
        )
        for dd, ss in zip(d2.tolist(), round_half_away(s2, 6)):
            add("page2", bq, dd, 0, ss, "")
        # explain: per-term breakdown of the page's best doc, REUSING the
        # page-1 scoring pass; the explained doc is selected on ROUNDED
        # score (docid asc tie-break) so the twin's independent fp sort
        # cannot flip the pick on a sub-1e-6 score tie
        s1r = round_half_away(s1, 6)
        best = int(d1[np.lexsort((d1, -s1r))[0]])
        ex = scorer.explain(bq, best)
        for t_, df_, c_ in zip(
            ex["term"].to_pylist(), ex["df"].to_pylist(),
            round_half_away(
                ex["contribution"].to_numpy(zero_copy_only=False), 6
            ),
        ):
            add("explain", t_, best, df_, c_, "")
    # hybrid BM25+ANN reciprocal-rank fusion (tests/test_hybrid.py)
    import pyarrow.parquet as pq

    import ray.data

    from tangent_ray.query.hybrid import hybrid_search

    epath = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(epath, columns=["vec_id", "embedding"])
    qvec = np.asarray(
        qt.filter(pc.equal(qt["vec_id"], KNN_QUERY_VEC_ID))["embedding"][0]
        .as_py(),
        dtype=np.float64,
    )
    # ann="brute": the DuckDB twin ranks the ANN leg by exact cosine, so
    # the gate entry opts into the exact leg; serving defaults to IVF
    hy = hybrid_search(
        scorer, " ".join(BM25_QUERY_TERMS),
        ray.data.read_parquet(epath, columns=["vec_id", "embedding"]),
        qvec, k=RRF_K, depth=RRF_DEPTH, c=RRF_C, ann="brute",
    )
    for rk, dd, ss in zip(
        hy["rank"].to_pylist(), hy["docid"].to_pylist(),
        round_half_away(hy["rrf_score"].to_numpy(zero_copy_only=False), 6),
    ):
        add("rrf", " ".join(BM25_QUERY_TERMS), dd, rk, ss, "")
    return pa.table(
        {
            "feature": pa.array(rows["feature"], type=pa.string()),
            "key": pa.array(rows["key"], type=pa.string()),
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "ival": pa.array(rows["ival"], type=pa.int64()),
            "score": pa.array(rows["score"], type=pa.float64()),
            "sval": pa.array(rows["sval"], type=pa.string()),
        }
    )


_CONV_STAT_INTS = [
    "n_turns", "n_user", "n_assistant", "n_tool_turns", "n_tool_calls",
    "n_distinct_tools", "total_tokens", "duration_us",
    "alternation_breaks", "turn_gaps",
]
_CONV_K = 3  # example context turns
_CONV_SHARDS = 8


def q_conv_analytics(sf_dir: str):
    """Conversation-level analytics over the transcripts shape in ONE gate
    slot, as a tagged union ``(feature, k1, k2, ival, sval)``:

    - ``stat:<name>`` — per-conversation profile stats (turn/role/tool
      counts, tokens, duration, alternation breaks, turn-index gaps;
      ``first_role``/``last_role`` carry their value in ``sval``),
    - ``dedup`` — conversation-level exact dedup (kept conv, dup count),
    - ``tool_edge`` — consecutive-tool transition counts, and
    - ``example`` — assembled SFT (context, target) pairs per assistant
      turn (``sval = context ␟ target``).

    Runs the four distributed ops of ``ops/conv.py`` over the doctored
    gate corpus (``fixtures.conv_gate_corpus``: planted duplicate convs, a
    turn-index gap, an assistant-only conv, a NULL text turn — the corpus
    is a pure function, so the DuckDB twin embeds it as a literal
    relation, like the multimodal twin recomputes its payloads).
    Scale evidence for these ops lives in the 1M-conv soak (BASELINE.md);
    the gate grades exact semantics."""
    import ray.data

    from tangent_ray.fixtures import conv_gate_corpus
    from tangent_ray.ops.conv import (
        assemble_examples,
        conv_dedup,
        conv_stats,
        tool_transitions,
    )

    ds = ray.data.from_arrow(conv_gate_corpus()).repartition(5)
    stats = _collect(conv_stats(ds, shards=_CONV_SHARDS))
    dedup = _collect(conv_dedup(ds, shards=_CONV_SHARDS))
    edges = _collect(tool_transitions(ds, shards=_CONV_SHARDS))
    ex = _collect(assemble_examples(ds, k_context=_CONV_K, shards=_CONV_SHARDS))

    def rows(feature, k1, k2, ival, sval):
        n = len(k1)

        def _str(x):
            if isinstance(x, str):
                return pa.array([x] * n, type=pa.string())
            return pc.cast(x, pa.string())

        return pa.table(
            {
                "feature": _str(feature),
                "k1": _str(k1),
                "k2": _str(k2),
                "ival": pc.cast(
                    pa.array([ival] * n) if isinstance(ival, int) else ival,
                    pa.int64(),
                ),
                "sval": _str(sval),
            }
        )

    parts = []
    for c in _CONV_STAT_INTS:
        parts.append(rows(f"stat:{c}", stats["conv_id"], "", stats[c], ""))
    for c in ("first_role", "last_role"):
        parts.append(rows(f"stat:{c}", stats["conv_id"], "", 0, stats[c]))
    parts.append(rows("dedup", dedup["conv_id"], "", dedup["dups"], ""))
    parts.append(rows("tool_edge", edges["prev_tool"], edges["tool"],
                      edges["n"], ""))
    sval = pc.binary_join_element_wise(
        ex["context"].combine_chunks()
        if isinstance(ex["context"], pa.ChunkedArray) else ex["context"],
        ex["target"].combine_chunks()
        if isinstance(ex["target"], pa.ChunkedArray) else ex["target"],
        "\x1f",
    )
    parts.append(
        rows("example", ex["conv_id"], pc.cast(ex["turn_idx"], pa.string()),
             ex["n_context_turns"], sval)
    )
    return pa.concat_tables(parts)


QUERIES = {
    "term_doc_tf": q_term_doc_tf,
    "term_stats": q_term_stats,
    "doc_stats": q_doc_stats,
    "first_positions": q_first_positions,
    "bm25_topk": q_bm25_topk,
    "boolean_and": q_boolean_and,
    "dedup_exact": q_dedup_exact,
    "doc_signals": q_doc_signals,
    "gopher_quality": q_gopher_quality,
    "c4_clean": q_c4_clean,
    "paragraph_cuts": q_paragraph_cuts,
    "source_mix": q_source_mix,
    "token_counts": q_token_counts,
    "conv_analytics": q_conv_analytics,
    "lm_perplexity": q_lm_perplexity,
    "tfidf_keywords": q_tfidf_keywords,
    "clean_corpus": q_clean_corpus,
    "split_assign": q_split_assign,
    "pii_redact": q_pii_redact,
    "decontam": q_decontam,
    "sampling": q_sampling,
    "pack_sequences": q_pack_sequences,
    "curated_corpus": q_curated_corpus,
    "knn_cosine": q_knn_cosine,
    "embed_near_dup": q_embed_near_dup,
    "shingle_pairs": q_shingle_pairs,
    "dedup_clusters": q_dedup_clusters,
    "events_windows": q_events_windows,
    "sessions": q_sessions,
    "asof_attribution": q_asof_attribution,
    "range_active_sessions": q_range_active_sessions,
    "orders_customers": q_orders_customers,
    "customer_nation_bc": q_customer_nation_bc,
    "doclen_quantiles": q_doclen_quantiles,
    "top_events_per_type": q_top_events_per_type,
    "token_sketches": q_token_sketches,
    "chunk_spans": q_chunk_spans,
    "top_revenue_nations": q_top_revenue_nations,
    # engine-only (rows-only driver check; pytest-golden vs python oracle)
    "transcript_bm25": q_transcript_bm25,
    "transcript_rerank": q_transcript_rerank,
    "index_verify": q_index_verify,
    "math_corpus_stats": q_math_corpus_stats,
    "lang_id": q_lang_id,
    "minhash_candidates": q_minhash_candidates,
    "search_features": q_search_features,
    "doc_signatures": q_doc_signatures,
    "model_curation": q_model_curation,
    "multimodal_meta": q_multimodal_meta,
    "golden_replay": q_golden_replay,
    "formula_topk": q_formula_topk,
}


# ---------------------------------------------------------------------------
# Round-3 oracle consolidation (see the QUERIES comment above): the merged
# twins are composed from the SAME SQL bodies the individual ops were
# verified against in round 2 (popped so the gate never double-counts a
# slot), plus the round-3 twins ported verbatim from their pytest files.

_word_tok_sql = ORACLE_SQL.pop("token_count_by_source")
_bpe_tok_sql = ORACLE_SQL.pop("bpe_token_count")
ORACLE_SQL["token_counts"] = f"""
    SELECT 'word' AS method, * FROM ({_word_tok_sql})
    UNION ALL
    SELECT 'bpe' AS method, * FROM ({_bpe_tok_sql})
"""


def _sql_str(v) -> str:
    return "NULL" if v is None else "'" + v.replace("'", "''") + "'"


def _conv_analytics_sql() -> str:
    """Twin of q_conv_analytics. The gate corpus is a pure function
    (fixtures.conv_gate_corpus), so the twin embeds it as a VALUES literal
    — no filesystem access — and re-derives all four feature families with
    window functions. Shared contracts: the tokenizer regex, chr(31)/
    chr(30) canonical separators, positional (row_number) context windows."""
    from tangent_ray.fixtures import conv_gate_corpus

    t = conv_gate_corpus()
    ts_us = t["ts"].cast(pa.int64()).to_pylist()
    lits = ",\n".join(
        f"({_sql_str(c)},{x},{_sql_str(r)},{_sql_str(tx)},{_sql_str(tl)},{u})"
        for c, x, r, tx, tl, u in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
            t["role"].to_pylist(), t["text"].to_pylist(),
            t["tool"].to_pylist(), ts_us,
        )
    )
    stat_arms = "\n  UNION ALL\n  ".join(
        f"SELECT 'stat:{c}' AS feature, conv_id AS k1, '' AS k2,"
        f" {c} AS ival, '' AS sval FROM wide"
        for c in _CONV_STAT_INTS
    )
    return f"""
WITH t(conv_id, turn_idx, role, text, tool, ts_us) AS (VALUES
{lits}
), seq AS (
  SELECT conv_id, turn_idx, role, tool, ts_us,
         lag(role) OVER w AS prev_role,
         lag(turn_idx) OVER w AS prev_tix
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), tok AS (
  SELECT conv_id,
         len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '[^a-z0-9]+'),
                         x -> x <> '')) AS ntok
  FROM t
), s AS (
  SELECT conv_id,
         count(*)::BIGINT AS n_turns,
         count(*) FILTER (WHERE role = 'user')::BIGINT AS n_user,
         count(*) FILTER (WHERE role = 'assistant')::BIGINT AS n_assistant,
         count(*) FILTER (WHERE role = 'tool')::BIGINT AS n_tool_turns,
         count(*) FILTER (WHERE coalesce(tool, '') <> '')::BIGINT
             AS n_tool_calls,
         count(DISTINCT tool)
             FILTER (WHERE coalesce(tool, '') <> '')::BIGINT
             AS n_distinct_tools,
         (max(ts_us) - min(ts_us))::BIGINT AS duration_us,
         count(*) FILTER (WHERE prev_role = role)::BIGINT
             AS alternation_breaks,
         count(*) FILTER (WHERE prev_tix IS NOT NULL
                          AND turn_idx - prev_tix <> 1)::BIGINT AS turn_gaps,
         arg_min(role, turn_idx) AS first_role,
         arg_max(role, turn_idx) AS last_role
  FROM seq GROUP BY conv_id
), tk AS (
  SELECT conv_id, sum(ntok)::BIGINT AS total_tokens
  FROM tok GROUP BY conv_id
), wide AS (
  SELECT s.*, tk.total_tokens FROM s JOIN tk USING (conv_id)
), stats AS (
  {stat_arms}
), roles AS (
  SELECT 'stat:first_role' AS feature, conv_id AS k1, '' AS k2,
         0::BIGINT AS ival, first_role AS sval FROM wide
  UNION ALL
  SELECT 'stat:last_role', conv_id, '', 0::BIGINT, last_role FROM wide
), dd AS (
  SELECT 'dedup' AS feature, min(conv_id) AS k1, '' AS k2,
         count(*)::BIGINT AS ival, '' AS sval
  FROM (SELECT conv_id,
               string_agg(role || chr(31) || md5(coalesce(text, '')),
                          chr(30) ORDER BY turn_idx) AS canon
        FROM t GROUP BY conv_id)
  GROUP BY canon
), te AS (
  SELECT 'tool_edge' AS feature, prev_tool AS k1, tool AS k2,
         count(*)::BIGINT AS ival, '' AS sval
  FROM (SELECT coalesce(lag(tool) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx), '') AS prev_tool,
               tool
        FROM t WHERE coalesce(tool, '') <> '')
  GROUP BY prev_tool, tool
), p AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
), ex AS (
  SELECT 'example' AS feature, a.conv_id AS k1, a.turn_idx::VARCHAR AS k2,
         count(b.rn)::BIGINT AS ival,
         coalesce(string_agg(b.role || ': ' || b.text, chr(10)
                             ORDER BY b.rn), '')
             || chr(31) || a.text AS sval
  FROM p a LEFT JOIN p b
    ON b.conv_id = a.conv_id
   AND b.rn BETWEEN a.rn - {_CONV_K} AND a.rn - 1
  WHERE a.role = 'assistant'
  GROUP BY a.conv_id, a.turn_idx, a.text
)
SELECT * FROM stats UNION ALL SELECT * FROM roles
UNION ALL SELECT * FROM dd UNION ALL SELECT * FROM te
UNION ALL SELECT * FROM ex
"""


ORACLE_SQL["conv_analytics"] = _conv_analytics_sql()

_quality_sql = ORACLE_SQL.pop("quality_scores")
_lexical_sql = ORACLE_SQL.pop("lexical_stats")
_jaccard_sql = ORACLE_SQL.pop("jaccard_pairs")
_cand_sql = ORACLE_SQL.pop("shingle_candidates")
_strat_sql = ORACLE_SQL.pop("stratified_sample")
_toptok_sql = ORACLE_SQL.pop("top_tokens")
_distinct_sql = ORACLE_SQL.pop("distinct_tokens")
ORACLE_SQL.pop("simhash")
ORACLE_SQL.pop("simhash_pairs")

#: entropy twin (tests/test_entropy.py), embeddable
_ENTROPY_TWIN_SQL = """
WITH tk AS (
  SELECT doc_id, u.t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents) d,
       LATERAL (SELECT unnest(ts) AS t) u
),
c AS (SELECT doc_id, t, count(*)::DOUBLE AS c FROM tk GROUP BY doc_id, t),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id),
h AS (
  SELECT c.doc_id,
         -sum((c.c / n.n) * log2(c.c / n.n)) AS ent
  FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(n.n, 0)::BIGINT AS n_tokens,
       round(coalesce(h.ent, 0), 6) AS token_entropy
FROM documents d
LEFT JOIN n USING (doc_id)
LEFT JOIN h ON d.doc_id = h.doc_id
"""

ORACLE_SQL["doc_signals"] = f"""
    WITH q AS ({_quality_sql}),
    lx AS ({_lexical_sql}),
    en AS ({_ENTROPY_TWIN_SQL}),
    rep AS ({REPETITION_TWIN_SQL})
    SELECT q.doc_id, q.n_words, q.alpha_ratio,
           coalesce(lx.distinct_words, 0)::BIGINT AS distinct_words,
           coalesce(lx.type_token_ratio, 0)::DOUBLE AS type_token_ratio,
           coalesce(lx.top_word_fraction, 0)::DOUBLE AS top_word_fraction,
           en.token_entropy,
           rep.n_lines, rep.dup_line_frac, rep.dup_line_char_frac,
           rep.top2gram_frac, rep.top3gram_frac, rep.dup3gram_frac
    FROM q
    LEFT JOIN lx USING (doc_id)
    JOIN en USING (doc_id)
    JOIN rep ON q.doc_id = rep.doc_id
"""

ORACLE_SQL["gopher_quality"] = f"""
    SELECT doc_id, n_words, fail_mask, (fail_mask = 0) AS keep
    FROM ({GOPHER_TWIN_SQL})
"""

# C4 twin (tests/test_c4.py), verbatim
ORACLE_SQL["c4_clean"] = """
WITH l AS (
  SELECT doc_id, i, ls[i] AS line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) gi
),
k AS (
  SELECT doc_id, i, line,
         (regexp_matches(line, '[.!?"]\\s*$')
          AND len(list_filter(string_split_regex(lower(line),
                                                 '[^a-z0-9]+'),
                              x -> x <> '')) >= 5) AS keep_line
  FROM l
),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(line, chr(10) ORDER BY i)
                  FILTER (WHERE keep_line), '') AS text,
         count(*) FILTER (WHERE keep_line)::BIGINT AS n_kept_lines,
         count(*) FILTER (WHERE NOT keep_line)::BIGINT AS n_dropped_lines
  FROM k GROUP BY doc_id
)
SELECT agg.doc_id, agg.text, agg.n_kept_lines, agg.n_dropped_lines,
       (agg.n_kept_lines >= 3
        AND NOT contains(lower(coalesce(doc.text, '')), 'lorem ipsum')
        AND NOT contains(coalesce(doc.text, ''), '{')) AS keep
FROM agg JOIN documents doc USING (doc_id)
"""

# paragraph_dedup (tests/test_paragraph_dedup.py) composed with the
# apply_paragraph_cuts rebuild: a paragraph survives only at its minimum
# (doc_id, para_idx) occurrence; documents with no dropped paragraph pass
# through byte-identical (empty splits are never flagged, hence kept).
ORACLE_SQL["paragraph_cuts"] = """
WITH p0 AS (
  SELECT doc_id, i AS para_idx, ps[i] AS para
  FROM (SELECT doc_id,
               string_split(coalesce(text, ''), chr(10) || chr(10)) AS ps
        FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(ps))) AS i) gi
),
f AS (
  SELECT doc_id, para_idx, para,
         (para = '' OR row_number() OVER (
             PARTITION BY para ORDER BY doc_id, para_idx) = 1) AS keep
  FROM p0
),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(para, chr(10) || chr(10) ORDER BY para_idx)
                  FILTER (WHERE keep), '') AS new_text,
         count(*) FILTER (WHERE NOT keep)::BIGINT AS n_cut_paras
  FROM f GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN coalesce(agg.n_cut_paras, 0) = 0 THEN coalesce(d.text, '')
            ELSE agg.new_text END AS text,
       coalesce(agg.n_cut_paras, 0)::BIGINT AS n_cut_paras
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def _source_mix_sql() -> str:
    """Twin of q_source_mix: multipliers computed IN SQL from the same
    (weight / w_sum) * budget / toks definition (same operation order, so
    IEEE doubles agree bit-for-bit), epochs replayed with the identical
    epoch-salted md5 Bernoulli."""
    w_sum = float(sum(MIX_WEIGHTS.values()))
    cases = " ".join(
        f"WHEN '{s}' THEN {w!r}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
    WITH dl AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> ''))::BIGINT AS n_tok
      FROM documents
    ),
    tot AS (SELECT source, sum(n_tok)::DOUBLE AS toks FROM dl GROUP BY source),
    m AS (
      SELECT source,
             least((CASE source {cases} ELSE 0.0 END / {w_sum!r})
                   * (SELECT sum(toks) FROM tot) / toks,
                   {MIX_MAX_EPOCHS!r}) AS mult
      FROM tot WHERE toks > 0
    ),
    ks AS (
      SELECT source, floor(mult)::BIGINT AS k,
             round((mult - floor(mult)) * 1000000)::BIGINT AS thr
      FROM m
    ),
    e AS (
      SELECT dl.doc_id, dl.source, dl.n_tok, ks.k, ks.thr, g.epoch
      FROM dl JOIN ks USING (source),
           LATERAL (SELECT unnest(generate_series(0, ks.k)) AS epoch) g
    )
    SELECT doc_id, source, epoch::BIGINT AS epoch, n_tok
    FROM e
    WHERE epoch < k
       OR (epoch = k AND thr > 0
           AND CAST(concat('0x', substr(md5('e' || k::VARCHAR || ':'
                                            || doc_id::VARCHAR), 1, 8))
                    AS BIGINT) % 1000000 < thr)
"""


ORACLE_SQL["source_mix"] = _source_mix_sql()

ORACLE_SQL["token_sketches"] = f"""
    SELECT * FROM ({_toptok_sql})
    UNION ALL
    SELECT '{VOCAB_MARKER}' AS term, ({_distinct_sql}) AS cnt, 0::BIGINT AS rank
"""

ORACLE_SQL["simhash_dup"] = f"""
    WITH {_SIMHASH_CTE}
    SELECT 'sig' AS kind, doc_id AS doc_a, (-1)::BIGINT AS doc_b,
           {_I64.format(v="s")} AS sig
    FROM allsim
    UNION ALL
    SELECT 'pair' AS kind, a.doc_id AS doc_a, b.doc_id AS doc_b, 0::BIGINT AS sig
    FROM allsim a JOIN allsim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s::UBIGINT, b.s::UBIGINT)) <= 3
"""

ORACLE_SQL["shingle_pairs"] = f"""
    SELECT 'cand' AS kind, doc_a, doc_b, (-1.0)::DOUBLE AS jaccard
    FROM ({_cand_sql})
    UNION ALL
    SELECT 'jac' AS kind, doc_a, doc_b, jaccard FROM ({_jaccard_sql})
"""


def _sampling_sql() -> str:
    from tangent_ray.ops.curation import SAMPLE_KEY_HEX

    return f"""
    SELECT 'strat' AS kind, doc_id, source, bucket::BIGINT AS key
    FROM ({_strat_sql})
    UNION ALL
    SELECT 'unif' AS kind, doc_id, '' AS source, sample_key::BIGINT AS key
    FROM (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('u:' || doc_id::VARCHAR), 1,
                                      {SAMPLE_KEY_HEX})) AS BIGINT)
                 AS sample_key
      FROM documents ORDER BY sample_key, doc_id LIMIT {UNIFORM_K}
    )
"""


ORACLE_SQL["sampling"] = _sampling_sql()


def _search_features_sql() -> str:
    """Twin of q_search_features: all five features re-derived from the raw
    documents table — phrase/proximity via a positions self-join, negated
    BM25 as the bm25 twin formula with the exclusion applied BEFORE the
    top-k cut (survivor scores unchanged, exactly the engine's NOT
    semantics), fuzzy via DuckDB's levenshtein() over the vocabulary with
    the (distance asc, df desc, term asc) ranking, facets as candidate-set
    group counts."""
    _phrase_body = ORACLE_SQL.pop("phrase_topk")
    terms = sorted(set(PHRASE_QUERY.split()))
    t1, t2 = terms[0], terms[1]
    toks = (
        "(SELECT * FROM (SELECT doc_id, unnest(string_split_regex("
        "lower(text), '[^a-z0-9]+')) AS term FROM documents)"
        " WHERE term <> '')"
    )
    q_terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    facet_union = "\n      UNION ALL\n".join(
        f"""      SELECT '{c}' AS col, d.{c}::VARCHAR AS value,
             count(*)::BIGINT AS n_docs
      FROM documents d JOIN cand USING (doc_id) GROUP BY d.{c}"""
        for c in FACET_COLS
    )
    return f"""
    WITH toks AS (SELECT * FROM {toks}),
    rawp AS (
      SELECT doc_id, ts[i] AS term, i
      FROM (SELECT doc_id,
                   string_split_regex(lower(text), '[^a-z0-9]+') AS ts
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
    ),
    tokp AS (
      SELECT doc_id, term,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
      FROM rawp WHERE term <> ''
    ),
    tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
             (SELECT sum(dl) FROM dl)::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scores AS (
      SELECT tf.doc_id,
             sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                ) AS score
      FROM tf
      JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN ({q_terms})
      GROUP BY tf.doc_id
    ),
    vocab AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
    ),
    cand AS (
      SELECT DISTINCT doc_id FROM toks
      WHERE term IN ({", ".join(f"'{t}'" for t in FACET_QUERY.split())})
    ),
    psel AS (
      SELECT term FROM dfx WHERE term LIKE '{PREFIX_TERM}%'
      ORDER BY df DESC, term LIMIT {PREFIX_CAP}
    ),
    wsel AS (
      SELECT term FROM dfx WHERE term LIKE '{WILD_LIKE}'
      ORDER BY df DESC, term LIMIT {PREFIX_CAP}
    ),
    wscores AS (
      SELECT g.doc_id,
             ln(1 + (stats.n - wdf.df + 0.5) / (wdf.df + 0.5))
               * g.tf * 2.2
               / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM (SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN wsel USING (term)
            GROUP BY 1) g
      JOIN dl USING (doc_id),
           (SELECT max(df) AS df FROM dfx JOIN wsel USING (term)) wdf,
           stats
    ),
    pscores AS (
      SELECT g.doc_id,
             ln(1 + (stats.n - pdf.df + 0.5) / (pdf.df + 0.5))
               * g.tf * 2.2
               / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM (SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN psel USING (term)
            GROUP BY 1) g
      JOIN dl USING (doc_id),
           (SELECT max(df) AS df FROM dfx JOIN psel USING (term)) pdf,
           stats
    ),
    sspart AS (
      SELECT g.doc_id,
             ln(1 + (stats.n - sdf.df + 0.5) / (sdf.df + 0.5))
               * g.tf * 2.2
               / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM (SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf
            WHERE tf.term IN ({", ".join(f"'{t}'" for t in SYN_MEMBERS)})
            GROUP BY 1) g
      JOIN dl USING (doc_id),
           (SELECT max(df) AS df FROM dfx
            WHERE term IN ({", ".join(f"'{t}'" for t in SYN_MEMBERS)})) sdf,
           stats
    ),
    sjpart AS (
      SELECT tf.doc_id,
             ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term = 'join'
    ),
    sscores AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.score, 0) + coalesce(b.score, 0) AS score
      FROM sspart a FULL JOIN sjpart b USING (doc_id)
    ),
    fzsel AS (
      -- expand_fuzzy's rank rule: distance asc, global df desc, term asc,
      -- capped like prefix expansion; the word itself (dist 0) included
      SELECT term FROM (
        SELECT term, levenshtein('{FUZZY_WORD}', term) AS dist, df
        FROM dfx WHERE levenshtein('{FUZZY_WORD}', term) <= 2
      ) ORDER BY dist, df DESC, term LIMIT {PREFIX_CAP}
    ),
    fzpart AS (
      SELECT g.doc_id,
             ln(1 + (stats.n - fdf.df + 0.5) / (fdf.df + 0.5))
               * g.tf * 2.2
               / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM (SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN fzsel USING (term)
            GROUP BY 1) g
      JOIN dl USING (doc_id),
           (SELECT max(df) AS df FROM dfx JOIN fzsel USING (term)) fdf,
           stats
    ),
    fzscores AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.score, 0) + coalesce(b.score, 0) AS score
      FROM fzpart a FULL JOIN sjpart b USING (doc_id)
    ),
    mltsel AS (
      SELECT tf.term FROM tf JOIN dfx USING (term), stats
      WHERE tf.doc_id = {MLT_DOC}
      ORDER BY tf.tf * ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
               DESC, tf.term
      LIMIT {MLT_TOPN}
    ),
    mltscores AS (
      SELECT tf.doc_id,
             sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                ) AS score
      FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN (SELECT term FROM mltsel) AND tf.doc_id <> {MLT_DOC}
      GROUP BY 1
    ),
    snear AS (
      -- ordered: a = the phrase's FIRST term, b = its second
      SELECT a.doc_id AS docid, min(b.pos - a.pos - 1)::BIGINT AS min_slop
      FROM tokp a JOIN tokp b USING (doc_id)
      WHERE a.term = '{PHRASE_QUERY.split()[0]}'
        AND b.term = '{PHRASE_QUERY.split()[1]}' AND b.pos > a.pos
      GROUP BY 1 HAVING min(b.pos - a.pos - 1) <= {SPAN_SLOP}
      ORDER BY 2, 1 LIMIT {PROX_K}
    ),
    bscores AS (
      SELECT tf.doc_id,
             sum( (CASE WHEN tf.term = '{BOOST_TERM}' THEN {BOOST_W}
                   ELSE 1.0 END)
                  * ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                ) AS score
      FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN ({q_terms})
      GROUP BY 1
    ),
    rxsel AS (
      -- expand_regexp's rank rule: full match, global df desc, term asc,
      -- capped like prefix expansion
      SELECT term FROM dfx WHERE regexp_full_match(term, '{REGEX_PAT}')
      ORDER BY df DESC, term LIMIT {PREFIX_CAP}
    ),
    rxpart AS (
      SELECT g.doc_id,
             ln(1 + (stats.n - rdf.df + 0.5) / (rdf.df + 0.5))
               * g.tf * 2.2
               / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM (SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN rxsel USING (term)
            GROUP BY 1) g
      JOIN dl USING (doc_id),
           (SELECT max(df) AS df FROM dfx JOIN rxsel USING (term)) rdf,
           stats
    ),
    rxscores AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.score, 0) + coalesce(b.score, 0) AS score
      FROM rxpart a FULL JOIN sjpart b USING (doc_id)
    ),
    mmscores AS (
      -- minimum_should_match: same BM25 sum, docs matching >= {MM_MIN}
      -- distinct query terms survive (scores unchanged)
      SELECT tf.doc_id,
             sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                ) AS score
      FROM tf
      JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN ({q_terms})
      GROUP BY tf.doc_id HAVING count(DISTINCT tf.term) >= {MM_MIN}
    ),
    ph_tf AS (
      -- exact-phrase frequency (the scored-phrase pseudo-term's tf)
      SELECT t0.doc_id, count(*)::DOUBLE AS tf
      FROM tokp t0
      JOIN tokp t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
      WHERE t0.term = '{PHRASE_QUERY.split()[0]}'
        AND t1.term = '{PHRASE_QUERY.split()[1]}'
      GROUP BY 1
    ),
    ph_part AS (
      SELECT ph_tf.doc_id,
             ln(1 + (stats.n - pdf.df + 0.5) / (pdf.df + 0.5))
               * ph_tf.tf * 2.2
               / (ph_tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM ph_tf JOIN dl USING (doc_id),
           (SELECT count(*)::DOUBLE AS df FROM ph_tf) pdf, stats
    ),
    phscores AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.score, 0) + coalesce(b.score, 0) AS score
      FROM ph_part a FULL JOIN sjpart b USING (doc_id)
    ),
    sl_tf AS (
      -- sloppy-phrase frequency: a first-term occurrence counts iff its
      -- GREEDY chain (nearest next occurrence) lands within the slop —
      -- for two terms, min(next pos) - pos - 1 <= slop
      SELECT doc_id, count(*)::DOUBLE AS tf FROM (
        SELECT a.doc_id, a.pos, min(b.pos) AS npos
        FROM tokp a
        JOIN tokp b ON b.doc_id = a.doc_id AND b.pos > a.pos
                   AND b.term = '{PHRASE_QUERY.split()[1]}'
        WHERE a.term = '{PHRASE_QUERY.split()[0]}'
        GROUP BY a.doc_id, a.pos
      ) WHERE npos - pos - 1 <= {PQ_SLOP}
      GROUP BY 1
    ),
    slscores AS (
      SELECT sl_tf.doc_id,
             ln(1 + (stats.n - sdf2.df + 0.5) / (sdf2.df + 0.5))
               * sl_tf.tf * 2.2
               / (sl_tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS score
      FROM sl_tf JOIN dl USING (doc_id),
           (SELECT count(*)::DOUBLE AS df FROM sl_tf) sdf2, stats
    ),
    mustscores AS (
      -- +term MUST clause: same BM25 sum, docs containing the required
      -- term survive (scores unchanged — every clause stays SHOULD)
      SELECT tf.doc_id,
             sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                ) AS score
      FROM tf
      JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN ({q_terms})
      GROUP BY tf.doc_id HAVING bool_or(tf.term = '{MUST_TERM}')
    ),
    fstats AS (
      SELECT count(d.{RANGE_COL})::BIGINT AS n,
             min(d.{RANGE_COL})::DOUBLE AS vmin,
             max(d.{RANGE_COL})::DOUBLE AS vmax,
             coalesce(sum(d.{RANGE_COL}), 0)::DOUBLE AS vsum,
             avg(d.{RANGE_COL})::DOUBLE AS vavg
      FROM documents d JOIN cand USING (doc_id)
    ),
    rrfa AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM scores QUALIFY r <= {RRF_DEPTH}
    ),
    rrfb AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (
               ORDER BY list_cosine_similarity(
                 embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings
                  WHERE vec_id = {KNN_QUERY_VEC_ID})
               ) DESC, vec_id
             ) AS r
      FROM embeddings QUALIFY r <= {RRF_DEPTH}
    ),
    rrff AS (
      SELECT doc_id, sum(1.0 / ({RRF_C} + r)) AS score,
             row_number() OVER (
               ORDER BY sum(1.0 / ({RRF_C} + r)) DESC, doc_id
             ) AS rank
      FROM (SELECT * FROM rrfa UNION ALL SELECT * FROM rrfb)
      GROUP BY doc_id QUALIFY rank <= {RRF_K}
    )
    SELECT 'phrase' AS feature, '{PHRASE_QUERY}' AS key, doc_id,
           n_occurrences AS ival, 0.0::DOUBLE AS score, '' AS sval
    FROM ({_phrase_body})
    UNION ALL
    SELECT 'prox', '{PHRASE_QUERY}', docid, min_span, 0.0, '' FROM (
      SELECT a.doc_id AS docid, min(abs(a.pos - b.pos))::BIGINT AS min_span
      FROM tokp a JOIN tokp b USING (doc_id)
      WHERE a.term = '{t1}' AND b.term = '{t2}'
      GROUP BY 1 HAVING min(abs(a.pos - b.pos)) <= {PROX_WINDOW}
      ORDER BY 2, 1 LIMIT {PROX_K}
    )
    UNION ALL
    SELECT 'neg', '{NEG_QUERY}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (
      SELECT doc_id, score FROM scores
      WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM toks
                           WHERE term = '{NEG_EXCLUDE}')
      ORDER BY score DESC, doc_id LIMIT {BM25_K}
    )
    UNION ALL
    SELECT 'fuzzy', '{FUZZY_WORD}', (-1)::BIGINT, dist, df::DOUBLE, term
    FROM (
      SELECT term, levenshtein('{FUZZY_WORD}', term)::BIGINT AS dist, df
      FROM vocab
      WHERE term <> '{FUZZY_WORD}'
        AND levenshtein('{FUZZY_WORD}', term) <= 2
      ORDER BY dist, df DESC, term LIMIT {FUZZY_TOPN}
    )
    UNION ALL
    SELECT 'facet', col, (-1)::BIGINT, n_docs, 0.0, value FROM (
{facet_union}
    )
    UNION ALL
    SELECT 'prefix', '{PREFIX_TERM}*', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM pscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'syn', '{SYN_QUERY}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM sscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'filterq', '{FILTER_QUERY}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (
      SELECT s.doc_id, s.score FROM scores s
      JOIN documents d USING (doc_id)
      WHERE d.lang = 'en'
      ORDER BY s.score DESC, s.doc_id LIMIT {BM25_K}
    )
    UNION ALL
    SELECT 'mlt', 'doc{MLT_DOC}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM mltscores ORDER BY score DESC, doc_id LIMIT {MLT_K})
    UNION ALL
    SELECT 'spannear', '{PHRASE_QUERY}', docid, min_slop, 0.0, '' FROM snear
    UNION ALL
    SELECT 'boost', '{BOOST_QUERY}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM bscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'rrf', '{" ".join(BM25_QUERY_TERMS)}', doc_id, rank,
           round(score, 6), ''
    FROM rrff
    UNION ALL
    SELECT 'page2', '{" ".join(BM25_QUERY_TERMS)}', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM scores ORDER BY score DESC, doc_id
          LIMIT {BM25_K} OFFSET {BM25_K})
    UNION ALL
    SELECT 'complete', '{FUZZY_WORD[:2]}', (-1)::BIGINT, df, 0.0, term
    FROM (SELECT term, df::BIGINT AS df FROM vocab
          WHERE term LIKE '{FUZZY_WORD[:2]}%'
          ORDER BY df DESC, term LIMIT {FUZZY_TOPN})
    UNION ALL
    SELECT 'wild', '{WILD_PAT}', doc_id, 0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM wscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'fuzzyq', '{FUZZY_WORD}~2 join', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM fzscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'regexq', '/{REGEX_PAT}/ join', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM rxscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'mm2', '{" ".join(BM25_QUERY_TERMS)} #mm:{MM_MIN}', doc_id,
           0::BIGINT, round(score, 6), ''
    FROM (SELECT * FROM mmscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'phraseq', '"{PHRASE_QUERY}" join', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM phscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'phrasesl', '"{PHRASE_QUERY}"~{PQ_SLOP}', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM slscores ORDER BY score DESC, doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'must', '+{MUST_TERM} hash join', doc_id, 0::BIGINT,
           round(score, 6), ''
    FROM (SELECT * FROM mustscores ORDER BY score DESC, doc_id
          LIMIT {BM25_K})
    UNION ALL
    SELECT 'matchall', '* #lang:en', doc_id, 0::BIGINT, 1.0::DOUBLE, ''
    FROM (SELECT doc_id FROM documents WHERE lang = 'en'
          ORDER BY doc_id LIMIT {BM25_K})
    UNION ALL
    SELECT 'fstats', '{RANGE_COL}', (-1)::BIGINT, n, round(vmin, 6), 'min'
    FROM fstats
    UNION ALL
    SELECT 'fstats', '{RANGE_COL}', (-1)::BIGINT, n, round(vmax, 6), 'max'
    FROM fstats
    UNION ALL
    SELECT 'fstats', '{RANGE_COL}', (-1)::BIGINT, n, round(vsum, 6), 'sum'
    FROM fstats
    UNION ALL
    SELECT 'fstats', '{RANGE_COL}', (-1)::BIGINT, n, round(vavg, 6), 'avg'
    FROM fstats
    UNION ALL
    SELECT 'sortby', '{RANGE_COL}', doc_id, rk, sv, '' FROM (
      SELECT d.doc_id,
             row_number() OVER (
               ORDER BY d.{RANGE_COL} DESC, d.doc_id
             ) AS rk,
             d.{RANGE_COL}::DOUBLE AS sv
      FROM documents d JOIN cand USING (doc_id)
      WHERE d.{RANGE_COL} IS NOT NULL
      QUALIFY rk <= {BM25_K}
    )
    UNION ALL
    SELECT 'rangef', '{" ".join(BM25_QUERY_TERMS)} #{RANGE_COL}>{RANGE_CUT}',
           doc_id, 0::BIGINT, round(score, 6), ''
    FROM (
      SELECT s.doc_id, s.score FROM scores s
      JOIN documents d USING (doc_id)
      WHERE d.{RANGE_COL} > {RANGE_CUT}
      ORDER BY s.score DESC, s.doc_id LIMIT {BM25_K}
    )
    UNION ALL
    SELECT 'explain', term, doc_id, df::BIGINT, round(contribution, 6), ''
    FROM (
      SELECT tf.term, tf.doc_id, dfx.df,
             ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               AS contribution
      FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
      WHERE tf.term IN ({q_terms})
        -- the engine explains page 1's best doc selected on ROUNDED
        -- score (doc_id asc ties), immune to sub-1e-6 fp sort flips
        AND tf.doc_id = (
          SELECT doc_id FROM (SELECT * FROM scores
                              ORDER BY score DESC, doc_id LIMIT {BM25_K})
          ORDER BY round(score, 6) DESC, doc_id LIMIT 1
        )
    )
    UNION ALL
    SELECT 'collapse', '{COLLAPSE_COL}', doc_id,
           (vrank * 1000 + grank)::BIGINT, round(score, 6), value
    FROM (
      WITH cbase AS (
        SELECT s.doc_id, s.score, d.{COLLAPSE_COL}::VARCHAR AS value
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.{COLLAPSE_COL} IS NOT NULL
      ),
      cg AS (
        SELECT *, row_number() OVER (
          PARTITION BY value ORDER BY score DESC, doc_id) AS grank
        FROM cbase
      ),
      cord AS (
        SELECT value,
               row_number() OVER (ORDER BY score DESC, value) AS vrank
        FROM cg WHERE grank = 1 QUALIFY vrank <= {COLLAPSE_K}
      )
      SELECT o.vrank, cg.value, cg.doc_id, cg.score, cg.grank
      FROM cg JOIN cord o USING (value)
      WHERE cg.grank <= {COLLAPSE_PER}
    )
"""


ORACLE_SQL["search_features"] = _search_features_sql()


# doc_signatures: the simhash_dup + fingerprints union (both bodies are the
# round-2-verified twins, popped so the gate never double-counts a slot)
_simdup_sql = ORACLE_SQL.pop("simhash_dup")
_fp_sql = ORACLE_SQL.pop("fingerprints")
ORACLE_SQL["doc_signatures"] = f"""
    SELECT * FROM ({_simdup_sql})
    UNION ALL
    SELECT 'fp' AS kind, doc_id AS doc_a, (-1)::BIGINT AS doc_b,
           fingerprint AS sig
    FROM ({_fp_sql})
"""


def _model_curation_sql() -> str:
    """Twin of q_model_curation: the SAME template strings the pytest
    differentials run at a smaller D (classify.nb_twin_sql /
    dsir_twin_sql — single source, the two cannot drift), wrapped into the
    union tagging at the production D."""
    from tangent_ray.ops.classify import D_BUCKETS, dsir_twin_sql, nb_twin_sql

    return f"""
SELECT 'nb' AS method, doc_id, score_e6 AS ival, n_grams AS ival2,
       pred AS flag
FROM ({nb_twin_sql(D_BUCKETS)})
UNION ALL
SELECT 'dsir' AS method, doc_id, key_e6 AS ival, weight_e6 AS ival2,
       TRUE AS flag
FROM ({dsir_twin_sql(D_BUCKETS, _MC_K)})
"""


ORACLE_SQL["model_curation"] = _model_curation_sql()
