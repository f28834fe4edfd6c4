"""Resident sharded serving: shard actors created ONCE, searched many times.

``search_sharded`` (scorer.py) spins an actor pool per call — right for
batch jobs, wrong for a serving loop where segment load dominates. This is
the long-lived analogue: each shard actor holds a ``QueryScorer`` over a
disjoint partial subset (the reference keeps one resident engine process
per index window — ``tangent_cntl.py``'s long-running server loop; SURVEY
§2.5 T1/S13); the driver fans a query batch to every shard and merges with
the exact ``merge_shard_results`` path ``search_sharded`` uses, so results
are identical to unsharded ``search`` by construction.

Index mutations (``add_increment`` / ``delete_docs``) are picked up by
``refresh()`` WITHOUT dropping residency: each actor reopens its reader
(``IndexReader.reload`` — loaded segments are reused, only new partials
are read; the Lucene ``reopen`` model), new partials are assigned to the
currently-smallest shard group, and a compaction that rewrote the partial
list falls back to a fresh round-robin assignment.

At cluster scale each shard actor pins ~1/n_shards of the index in one
worker's heap; shard count is a residency knob, not a correctness one.

Resource sizing: each shard actor RESERVES ``num_cpus_per_shard`` (default
1) for the scoring hot path. If the engine co-runs with background index
jobs (``add_increment`` / ``delete_docs`` / ``compact_index`` launch Ray
Data tasks), those jobs need unreserved CPUs — an engine that reserves the
whole node deadlocks the first background job (the maintenance tasks pend
forever behind the serving reservation). Leave headroom, or pass a
fractional ``num_cpus_per_shard``: reservations are scheduling hints, not
cgroup limits, so a 0.5-CPU shard actor serves exactly as fast on an idle
node.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from tangent_ray.config import EngineConfig


class _ShardWorker:
    """Ray actor body: one resident ``QueryScorer`` over a partial subset."""

    def __init__(self, index_dir: str, topk: int | None,
                 partials: list[str] | None, positions=None):
        from tangent_ray.query.scorer import QueryScorer

        self.scorer = QueryScorer(index_dir, topk, partials=partials,
                                  positions=positions)

    def search(self, queries: pa.Table, mixed_bounds=None) -> pa.Table:
        return self.scorer(queries, mixed_bounds=mixed_bounds)

    def mixed_text_bounds(self, queries: pa.Table) -> list[dict]:
        return self.scorer.mixed_text_bounds(queries)

    def refresh(self, partials: list[str] | None) -> int:
        self.scorer.refresh(partials)
        return len(self.scorer.reader.partials)

    def n_segments(self) -> int:
        return len(self.scorer.reader.segments)


class ShardedEngine:
    """Resident sharded engine over an on-disk index.

    >>> eng = ShardedEngine(index_dir, n_shards=4)
    >>> out = eng.search([{"query_id": "q1", "kind": "text", "text": "a b"}])
    >>> ...  # add_increment(...) / delete_docs(...) elsewhere
    >>> eng.refresh()          # picks up the change, keeps loaded segments
    >>> eng.shutdown()
    """

    def __init__(self, index_dir: str, n_shards: int = 4,
                 topk: int | None = None, num_cpus_per_shard: float = 1,
                 positions=None):
        """``positions``: explicit positional source for phrase clauses —
        pass a driver-built ``PositionalEngine`` so every resident shard
        scorer shares its part actors (handles pickle light) instead of
        each actor loading the whole ``<index_dir>/positions`` sidecar
        on its first phrase query."""
        import ray

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        self.cfg = EngineConfig.from_json(manifest["config"])
        self.default_k = topk or self.cfg.topk
        partials = list(manifest["partials"])
        n_shards = max(1, min(n_shards, len(partials)))
        self._groups: list[list[str]] = [
            partials[i::n_shards] for i in range(n_shards)
        ]
        self._actor_cls = ray.remote(num_cpus=num_cpus_per_shard)(_ShardWorker)
        self._actors = [
            self._actor_cls.remote(index_dir, topk, g, positions)
            for g in self._groups
        ]
        # surface segment-load errors at construction, not first query
        ray.get([a.n_segments.remote() for a in self._actors])

    @property
    def n_shards(self) -> int:
        return len(self._actors)

    def search(self, queries) -> pa.Table:
        """Score a query batch; returns global per-query top-k rows
        identical to unsharded ``search`` (same merge as
        ``search_sharded``)."""
        import ray

        from tangent_ray.query.scorer import merge_shard_results

        if isinstance(queries, list):
            queries = pa.Table.from_pylist(queries)
        if not isinstance(queries, pa.Table):  # a (small) Dataset
            queries = pa.Table.from_pylist(queries.take_all())
        topk_of = {
            r["query_id"]: int(r.get("topk") or self.default_k)
            for r in queries.to_pylist()
        }
        if "kind" in queries.column_names:
            import pyarrow.compute as pc

            is_mixed = pc.equal(queries["kind"], "mixed")
            shardable = queries.filter(pc.invert(is_mixed))
            mixed = queries.filter(is_mixed)
        else:
            shardable, mixed = queries, queries.slice(0, 0)
        futures = []
        if shardable.num_rows:
            futures += [a.search.remote(shardable) for a in self._actors]
        if mixed.num_rows:
            # two-phase exact sharded fusion: (1) every shard reports its
            # text-leg (min, max, n) — disjoint doc sets + global idf make
            # the fold below the exact global extrema; (2) shards fuse
            # with the global bounds and the usual disjoint top-k merge
            # applies. Replaces the old lazy full-index mixed worker,
            # whose single-process fusion was the serving p99 cliff at
            # 20M turns (~3 s vs 21 ms p50 in the round-4 soak).
            bounds: dict[str, list | None] = {}
            for rows in ray.get(
                [a.mixed_text_bounds.remote(mixed) for a in self._actors]
            ):
                for r in rows:
                    qid = r["query_id"]
                    if r["n"] <= 0:  # fallback kind (-1) or empty shard leg
                        bounds.setdefault(qid, None)
                        continue
                    cur = bounds.get(qid)
                    if cur is None:
                        bounds[qid] = [r["lo"], r["hi"]]
                    else:
                        cur[0] = min(cur[0], r["lo"])
                        cur[1] = max(cur[1], r["hi"])
            bfinal = {
                q: tuple(v) for q, v in bounds.items() if v is not None
            }
            futures += [
                a.search.remote(mixed, bfinal) for a in self._actors
            ]
        tabs = ray.get(futures)
        return merge_shard_results(tabs, topk_of, self.default_k)

    def refresh(self) -> dict:
        """Pick up ``add_increment`` / ``delete_docs`` results in place.

        New partials go to the smallest shard group (segments already
        resident are NOT reloaded); if the manifest's partial list dropped
        any assigned partial (compaction/purge rewrote the LSM), every
        group is re-assigned round-robin over the new list. Returns
        ``{"new_partials": [...], "reassigned": bool}``."""
        import ray

        with open(os.path.join(self.index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        current = list(manifest["partials"])
        assigned = {p for g in self._groups for p in g}
        dropped = assigned - set(current)
        new = [p for p in current if p not in assigned]
        if dropped:
            n = len(self._actors)
            self._groups = [current[i::n] for i in range(n)]
        else:
            for p in new:
                min(self._groups, key=len).append(p)
        jobs = [
            a.refresh.remote(g) for a, g in zip(self._actors, self._groups)
        ]
        ray.get(jobs)
        return {"new_partials": new, "reassigned": bool(dropped)}

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
