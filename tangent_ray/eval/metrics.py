"""Retrieval evaluation metrics (reference ``experiment_tools`` parity).

The reference ships NTCIR evaluation scripts — target recall + Mean
Reciprocal Rank (``ntcir_metrics.py``, ``ntcir_metrics2.py``) and nDCG from
graded human judgments (``nDCG_metrics.py``, ``nDCG_human.py``) — all
driver-side computations over small (query, ranked-list) tables. Same here:
inputs are a results table ``(query_id, rank, docid)`` (any extra columns
ignored) plus judgments; outputs are per-query and mean metrics. These never
touch a Dataset — top-k lists are tiny by construction.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow as pa


def _ranked_lists(results: pa.Table | list[dict]) -> dict[str, list[int]]:
    rows = results.to_pylist() if isinstance(results, pa.Table) else list(results)
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    out: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        out[r["query_id"]].append(r["docid"])
    return dict(out)


def mean_reciprocal_rank(
    results: pa.Table | list[dict],
    relevant: dict[str, set[int]],
    k: int | None = None,
) -> tuple[float, dict[str, float]]:
    """MRR over queries with judgments: 1/rank of the first relevant hit
    within the (optionally k-truncated) list, 0 if absent — the NTCIR
    specific-item protocol (``ntcir_metrics.py``)."""
    lists = _ranked_lists(results)
    per: dict[str, float] = {}
    for qid, rel in relevant.items():
        ranked = lists.get(qid, [])
        if k is not None:  # k=0 must mean 'empty cutoff', not 'no cutoff'
            ranked = ranked[:k]
        rr = 0.0
        for i, d in enumerate(ranked):
            if d in rel:
                rr = 1.0 / (i + 1)
                break
        per[qid] = rr
    mean = sum(per.values()) / len(per) if per else 0.0
    return mean, per


def recall_at_k(
    results: pa.Table | list[dict],
    relevant: dict[str, set[int]],
    k: int | None = None,
) -> tuple[float, dict[str, float]]:
    """Fraction of judged-relevant docs found in the top-k per query."""
    lists = _ranked_lists(results)
    per: dict[str, float] = {}
    for qid, rel in relevant.items():
        if not rel:
            continue
        got_list = lists.get(qid, [])
        if k is not None:
            got_list = got_list[:k]
        got = set(got_list)
        per[qid] = len(got & rel) / len(rel)
    mean = sum(per.values()) / len(per) if per else 0.0
    return mean, per


def ndcg_at_k(
    results: pa.Table | list[dict],
    gains: dict[str, dict[int, float]],
    k: int = 10,
) -> tuple[float, dict[str, float]]:
    """nDCG@k with graded gains (``nDCG_metrics.py`` protocol):
    DCG = sum gain_i / log2(i+1), ideal from the judgment pool sorted
    descending; unjudged docs carry gain 0."""
    lists = _ranked_lists(results)
    per: dict[str, float] = {}
    for qid, g in gains.items():
        ranked = lists.get(qid, [])[:k]
        dcg = sum(
            g.get(d, 0.0) / math.log2(i + 2) for i, d in enumerate(ranked)
        )
        ideal_gains = sorted(g.values(), reverse=True)[:k]
        idcg = sum(v / math.log2(i + 2) for i, v in enumerate(ideal_gains))
        per[qid] = dcg / idcg if idcg > 0 else 0.0
    mean = sum(per.values()) / len(per) if per else 0.0
    return mean, per
