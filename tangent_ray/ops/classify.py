"""Model-based curation: hashed Naive-Bayes quality scoring and DSIR
importance resampling.

The two standard "train a cheap model on a seed set, score the whole
corpus" curation steps of a public LLM data pipeline (CCNet / fastText-
style quality filtering; DSIR, arXiv:2302.03169), built exactly
aggregable so they carry bit-exact SQL twins:

- **Features** are hashed token n-grams: ``md5(token) % D`` buckets
  (``md5_number_lower`` — the repo's portable engine-independent hash), so
  the model state is a DENSE int64 array of D entries, independent of
  corpus vocabulary. D defaults to 2^18 = 2 MiB of model — broadcast once
  per actor, never reshipped per batch.
- **Training** is pre-aggregated: each block emits its local
  (bucket, label) count partial (at most D rows), a parallel tree reduce
  (fan-in 16, dense bincount combines) folds the partials, and the driver
  materializes ONLY the final ≤ D+1-row table (the TF-IDF
  don't-pull-the-vocab lesson: driver input is O(D), not O(vocabulary)).
- **Log-ratios are fixed-point** (``round(ln(p1/p0) * 1e6)`` int64, the
  ops/lm.py convention): per-document scores are integer SUMS, so Ray's
  per-batch accumulation order and DuckDB's aggregate order produce the
  SAME number — float association drift cannot break the oracle.
- **Scoring** streams: one ``map_batches`` gather-and-segment-sum per
  batch against the broadcast array.
- **DSIR sampling** is the Gumbel-top-k trick (key = weight + Gumbel
  noise ⇔ sampling without replacement ∝ exp(weight)) with DETERMINISTIC
  hashed uniforms (salted md5 of the doc id), so the sample is
  reproducible and SQL-checkable end-to-end; top-k never materializes
  more than k rows per block (local cut, then a k·blocks global sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.util import round_half_away

D_BUCKETS = 1 << 18

#: salt for the DSIR Gumbel uniforms (shared with the SQL twin)
DSIR_SALT = ":dsir"
#: uniform grid resolution: u = ((md5 % 1e9) + 0.5) / 1e9 — never 0 or 1
DSIR_U_MOD = 1_000_000_000


def _log_e6(num, den) -> np.ndarray:
    """Fixed-point ``round(ln(num/den) * 1e6)`` (half away from zero, the
    DuckDB ``round`` rule) — the shared quantization of every model
    parameter here and in ops/lm.py."""
    return round_half_away(
        np.log(np.asarray(num, dtype=np.float64) / den) * 1e6, 0
    ).astype(np.int64)


def _token_buckets(
    texts, d: int, ngram: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """(parents, buckets) of hashed token ``ngram``s per row.

    Unigrams hash each token (``md5_number_lower % d``); bigrams combine
    the two TOKEN md5s polynomially (``(h1·1000003 + h2) mod 2^64 mod d``,
    the fingerprints-twin combine) instead of md5'ing every bigram STRING
    — bigrams are corpus-rate-unique, so hashing them directly made the
    md5 kernel the whole op (measured 4.7x at the 1M-doc soak), while
    token md5s dedupe to the vocabulary. Both forms are recomputed
    verbatim by the SQL twins (HUGEINT math, like the fingerprints twin).
    """
    from tangent_ray.tokenize.text import md5_u64, split_tokens

    parents, tokens, _pos = split_tokens(texts)
    if ngram == 1:
        if len(parents) == 0:
            return parents, np.empty(0, dtype=np.int64)
        return parents, (md5_u64(tokens) % d).astype(np.int64)
    if ngram != 2:
        raise ValueError("ngram must be 1 or 2")
    n = len(parents)
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    th = md5_u64(tokens)  # vocab-rate md5 (dictionary-deduped)
    same = parents[1:] == parents[:-1]
    sel = np.flatnonzero(same)
    with np.errstate(over="ignore"):
        combo = th[sel] * np.uint64(1000003) + th[sel + 1]
    return parents[sel], (combo % d).astype(np.int64)


def label_bucket_counts(
    ds,
    label_col: str = "label",
    text_col: str = "text",
    d: int = D_BUCKETS,
    ngram: int = 1,
    count_batch_size: int = 8192,
) -> pa.Table:
    """Per-(bucket) positive/negative token counts over a labeled corpus:
    the sufficient statistics of both models, as ONE Arrow table of at
    most ``d+1`` rows ``(bucket, c_pos, c_neg)``.

    Wide step = a parallel TREE REDUCE over the per-block sparse partials
    (fan-in 16, dense-bincount combine per task), not a sort-based
    groupby: partials are already ≤ d rows each and keyed by a dense int
    < d, so folding them is O(rows + d) adds — round 3 measured the
    groupby-Sum over the raw partials as the DSIR wide-step bottleneck
    (~60 s of the 142 s at 1M docs); the tree reduce does the same sum in
    < 1 s and moves the same bytes at most ``log_16(blocks)`` times.
    ``count_batch_size`` bounds each map task's gram arrays — and with
    the reduce no longer sort-based, SMALLER batches win (more parallel
    map tasks; 8192 measured 2.4 s vs 17.4 s at 32768 for the 1M-doc map
    despite 3x the partial rows, which the bincount folds absorb)."""
    import ray

    def part(batch: pa.Table) -> pa.Table:
        lab = batch[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        if lab.null_count:
            # a null label would silently diverge from the SQL twin (whose
            # FILTER clauses exclude NULLs from BOTH classes) — same
            # strictness as conv._strict_col / streaming._ts_us_strict
            raise ValueError(
                f"label_bucket_counts: null {label_col} unsupported"
                " (filter first)"
            )
        labv = pc.cast(lab, pa.bool_()).to_numpy(zero_copy_only=False)
        parents, buckets = _token_buckets(batch[text_col], d, ngram)
        if len(buckets) == 0:
            ubkt = np.empty(0, dtype=np.int64)
            c = np.zeros((0, 2), dtype=np.int64)
        else:
            # dense bincount over the 2d fused (bucket, label) space —
            # O(grams + d), vs the O(grams log grams) sort of np.unique
            fused = buckets * 2 + labv[parents].astype(np.int64)
            dense = np.bincount(fused, minlength=2 * d)
            ubkt = np.flatnonzero(dense[0::2] | dense[1::2])
            c = np.stack([dense[2 * ubkt], dense[2 * ubkt + 1]], axis=1)
        # sentinel row: per-batch DOCUMENT counts per label (bucket -1),
        # so the class prior needs no second pass over the corpus
        n_pos = int(labv.sum())
        return pa.table(
            {
                "bucket": pa.array(np.append(ubkt, -1)),
                "c_pos": pa.array(np.append(c[:, 1], n_pos)),
                "c_neg": pa.array(np.append(c[:, 0], len(labv) - n_pos)),
            }
        )

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        """Fold sparse partial tables into one (≤ d+1 rows) — dense
        bincount adds, O(rows + d)."""
        t = pa.concat_tables(tables)
        b = t["bucket"].to_numpy(zero_copy_only=False)
        cp = t["c_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
        cn = t["c_neg"].to_numpy(zero_copy_only=False).astype(np.float64)
        sen = b == -1
        dp = np.bincount(b[~sen], weights=cp[~sen], minlength=d).astype(
            np.int64
        )
        dn = np.bincount(b[~sen], weights=cn[~sen], minlength=d).astype(
            np.int64
        )
        nz = np.flatnonzero(dp | dn)
        return pa.table(
            {
                "bucket": pa.array(np.append(nz, -1)),
                "c_pos": pa.array(np.append(dp[nz], int(cp[sen].sum()))),
                "c_neg": pa.array(np.append(dn[nz], int(cn[sen].sum()))),
            }
        )

    refs = (
        ds.map_batches(part, batch_format="pyarrow",
                       batch_size=count_batch_size)
        .to_arrow_refs()
    )
    if not refs:
        return pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "c_pos": pa.array([], pa.int64()),
                "c_neg": pa.array([], pa.int64()),
            }
        )
    fan = 16
    while len(refs) > 1:
        refs = [
            combine.remote(*refs[i : i + fan])
            for i in range(0, len(refs), fan)
        ]
    return ray.get(refs[0])


class NBModel:
    """Dense fixed-point Naive-Bayes log-ratio table (broadcastable)."""

    def __init__(self, lr_e6: np.ndarray, prior_e6: int, d: int, ngram: int):
        self.lr_e6 = lr_e6
        self.prior_e6 = int(prior_e6)
        self.d = d
        self.ngram = ngram


def nb_train(
    ds,
    label_col: str = "label",
    text_col: str = "text",
    d: int = D_BUCKETS,
    ngram: int = 1,
) -> NBModel:
    """Train the hashed NB classifier: add-one smoothed per-bucket
    log P(b|pos) − log P(b|neg) (fixed-point), plus the class prior from
    DOCUMENT counts (the bucket −1 sentinel of the SAME single pass).
    Driver input is the bounded (≤ d+1)-row count table — never the
    corpus, and never a second execution of the input lineage."""
    bucket, c_pos, c_neg = _collect_counts(
        label_bucket_counts(ds, label_col, text_col, d, ngram)
    )
    doc = bucket == -1
    d_pos, d_neg = int(c_pos[doc].sum()), int(c_neg[doc].sum())
    bucket, c_pos, c_neg = bucket[~doc], c_pos[~doc], c_neg[~doc]
    n1, n0 = int(c_pos.sum()), int(c_neg.sum())
    full_pos = np.zeros(d, dtype=np.int64)
    full_neg = np.zeros(d, dtype=np.int64)
    full_pos[bucket] = c_pos
    full_neg[bucket] = c_neg
    lr = _log_e6(full_pos + 1.0, n1 + float(d)) - _log_e6(
        full_neg + 1.0, n0 + float(d)
    )
    prior = _log_e6(np.array([d_pos + 1.0]), d_neg + 1.0)[0]
    return NBModel(lr, prior, d, ngram)


def _collect_counts(counts: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (
        counts["bucket"].to_numpy(zero_copy_only=False).astype(np.int64),
        counts["c_pos"].to_numpy(zero_copy_only=False).astype(np.int64),
        counts["c_neg"].to_numpy(zero_copy_only=False).astype(np.int64),
    )


def nb_score(ds, model: NBModel, id_col: str = "doc_id",
             text_col: str = "text"):
    """Score every document: ``score_e6 = prior_e6 + Σ lr_e6[bucket]``
    over the doc's hashed grams (integer sum — order-independent), and
    ``pred = score_e6 > 0``. The model array ships via ``ray.put`` once
    and each actor reads it zero-copy."""
    import ray

    lr_ref = ray.put(model.lr_e6)
    prior, d, ngram = model.prior_e6, model.d, model.ngram

    class Scorer:
        def __init__(self):
            self.lr = ray.get(lr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            parents, buckets = _token_buckets(batch[text_col], d, ngram)
            score = np.full(n, prior, dtype=np.int64)
            ntok = np.zeros(n, dtype=np.int64)
            if len(buckets):
                np.add.at(score, parents, self.lr[buckets])
                np.add.at(ntok, parents, 1)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_grams": pa.array(ntok),
                    "score_e6": pa.array(score),
                    "pred": pa.array(score > 0),
                }
            )

    from tangent_ray.util import actor_pool

    return ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=actor_pool()
    )


def _gumbel_e6(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic fixed-point Gumbel noise per id: salted-md5 uniform
    on a 1e9 grid (never 0/1), then ``round(-ln(-ln(u)) * 1e6)``."""
    from tangent_ray.tokenize.text import md5_u64

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    salted = pc.binary_join_element_wise(
        pc.cast(ids, pa.string()), DSIR_SALT, ""
    )
    u = ((md5_u64(salted) % DSIR_U_MOD).astype(np.float64) + 0.5) / DSIR_U_MOD
    return round_half_away(-np.log(-np.log(u)) * 1e6, 0).astype(np.int64)


def dsir_sample(
    ds,
    k: int,
    target_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = D_BUCKETS,
    ngram: int = 2,
):
    """DSIR: Data Selection via Importance Resampling (arXiv:2302.03169).

    Importance weight per document = Σ over hashed ``ngram`` features of
    ``ln p_target(b) − ln p_raw(b)`` (add-one smoothed, fixed-point);
    ``target`` is the rows where ``target_col`` is true, ``raw`` is the
    WHOLE input. Selection is Gumbel-top-k over ``weight_e6 +
    gumbel_e6(id)`` — i.e. sampling without replacement with probability
    ∝ exp(weight), deterministic via hashed uniforms. Returns the k
    selected rows ``(id, n_grams, weight_e6, key_e6)``; each block cuts
    to its local top-k first, so the global sort sees ≤ k·blocks rows.
    """
    import ray

    bucket, c_pos, c_neg = _collect_counts(
        label_bucket_counts(ds, target_col, text_col, d, ngram)
    )
    grams = bucket >= 0  # drop the document-count sentinel rows
    bucket, c_pos, c_neg = bucket[grams], c_pos[grams], c_neg[grams]
    c_tgt = np.zeros(d, dtype=np.int64)
    c_raw = np.zeros(d, dtype=np.int64)
    c_tgt[bucket] = c_pos
    c_raw[bucket] = c_pos + c_neg
    n_t, n_r = int(c_tgt.sum()), int(c_raw.sum())
    lr = _log_e6(c_tgt + 1.0, n_t + float(d)) - _log_e6(
        c_raw + 1.0, n_r + float(d)
    )
    lr_ref = ray.put(lr)

    class Weigher:
        def __init__(self):
            self.lr = ray.get(lr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            parents, buckets = _token_buckets(batch[text_col], d, ngram)
            w = np.zeros(n, dtype=np.int64)
            ng = np.zeros(n, dtype=np.int64)
            if len(buckets):
                np.add.at(w, parents, self.lr[buckets])
                np.add.at(ng, parents, 1)
            ids = batch[id_col]
            key = w + _gumbel_e6(ids)
            # local top-k cut by the SAME global total order
            idv = (
                ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
                else ids
            ).to_numpy(zero_copy_only=False)
            top = np.sort(np.lexsort((idv, -key))[:k])
            return pa.table(
                {
                    id_col: ids.take(pa.array(top)),
                    "n_grams": pa.array(ng[top]),
                    "weight_e6": pa.array(w[top]),
                    "key_e6": pa.array(key[top]),
                }
            )

    from tangent_ray.util import actor_pool

    scored = ds.map_batches(
        Weigher, batch_format="pyarrow", concurrency=actor_pool()
    )
    return scored.sort(["key_e6", id_col], descending=[True, False]).limit(k)


def nb_twin_sql(d: int, label_expr: str = "(lang = 'en')") -> str:
    """The ONE DuckDB twin of nb_train + nb_score over a ``documents``
    view — shared verbatim by tests/test_classify.py (small d) and the
    gate's model_curation entry (production d), so the two cannot drift.
    Each ln() is quantized to 1e-6 BEFORE the subtraction, matching
    ``_log_e6``; per-doc scores are integer sums."""
    return f"""
WITH docs AS (
  SELECT doc_id, coalesce(text, '') AS text, {label_expr} AS lab
  FROM documents
), raw AS (
  SELECT doc_id, ts[i] AS term
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
        FROM docs),
       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
), tok AS (
  SELECT doc_id, (md5_number_lower(term) % {d})::BIGINT AS b
  FROM raw WHERE term <> ''
), cnt AS (
  SELECT b, count(*) FILTER (WHERE lab)::BIGINT AS c1,
         count(*) FILTER (WHERE NOT lab)::BIGINT AS c0
  FROM tok JOIN docs USING (doc_id) GROUP BY b
), tot AS (
  SELECT sum(c1) AS n1, sum(c0) AS n0 FROM cnt
), lr AS (
  SELECT b, (round(ln((c1 + 1.0) / (n1 + {d}.0)) * 1e6)
             - round(ln((c0 + 1.0) / (n0 + {d}.0)) * 1e6))::BIGINT AS lr_e6
  FROM cnt, tot
), prior AS (
  SELECT round(ln((count(*) FILTER (WHERE lab) + 1.0)
               / (count(*) FILTER (WHERE NOT lab) + 1.0)) * 1e6)::BIGINT AS p
  FROM docs
), per AS (
  SELECT tok.doc_id, count(*)::BIGINT AS n_grams,
         sum(lr.lr_e6)::BIGINT AS s
  FROM tok JOIN lr USING (b) GROUP BY tok.doc_id
)
SELECT d.doc_id, coalesce(per.n_grams, 0) AS n_grams,
       (coalesce(per.s, 0) + prior.p)::BIGINT AS score_e6,
       (coalesce(per.s, 0) + prior.p) > 0 AS pred
FROM docs d LEFT JOIN per USING (doc_id), prior
"""


def dsir_twin_sql(d: int, k: int, label_expr: str = "(lang = 'en')") -> str:
    """The ONE DuckDB twin of dsir_sample over a ``documents`` view (see
    ``nb_twin_sql`` for the sharing rationale and quantization rule)."""
    return f"""
WITH docs AS (
  SELECT doc_id, coalesce(text, '') AS text, {label_expr} AS tgt
  FROM documents
), raw AS (
  SELECT doc_id, ts[i] AS term, i
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
        FROM docs),
       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
), tok AS (
  SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r
  FROM raw WHERE term <> ''
), big AS (
  SELECT a.doc_id,
         (((md5_number_lower(a.term)::HUGEINT * 1000003
            + md5_number_lower(b.term))
           % 18446744073709551616::HUGEINT) % {d})::BIGINT AS b
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.r = a.r + 1
), cnt AS (
  SELECT b, count(*) FILTER (WHERE tgt)::BIGINT AS ct,
         count(*)::BIGINT AS cr
  FROM big JOIN docs USING (doc_id) GROUP BY b
), tot AS (
  SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt
), lr AS (
  SELECT b, (round(ln((ct + 1.0) / (nt + {d}.0)) * 1e6)
             - round(ln((cr + 1.0) / (nr + {d}.0)) * 1e6))::BIGINT AS lr_e6
  FROM cnt, tot
), per AS (
  SELECT big.doc_id, count(*)::BIGINT AS n_grams,
         sum(lr.lr_e6)::BIGINT AS w
  FROM big JOIN lr USING (b) GROUP BY big.doc_id
), scored AS (
  SELECT d.doc_id, coalesce(per.n_grams, 0) AS n_grams,
         coalesce(per.w, 0)::BIGINT AS weight_e6,
         (coalesce(per.w, 0)
          + round(-ln(-ln(((md5_number_lower(d.doc_id::VARCHAR || '{DSIR_SALT}')
                            % {DSIR_U_MOD}) + 0.5) / {DSIR_U_MOD}.0))
                  * 1e6))::BIGINT AS key_e6
  FROM docs d LEFT JOIN per USING (doc_id)
)
SELECT doc_id, n_grams, weight_e6, key_e6 FROM scored
ORDER BY key_e6 DESC, doc_id LIMIT {k}
"""
