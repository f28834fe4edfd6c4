"""Conversation-level analytics over the transcripts table.

The corpus rows are turns ``(conv_id, turn_idx, role, text, tool, ts)``
(BASELINE.json ``input_hint``); every operator here needs per-CONVERSATION
locality, which Ray Data's row-level transforms do not give for free (a
conversation's turns may straddle blocks). All four ops therefore share ONE
partitioning pattern — the same fixed hash-shard shuffle as
``ops.streaming.sessionize``: ``shard = hash(conv_id) % shards`` appended
per batch, ``groupby("shard").map_groups`` with a fully vectorized in-shard
kernel (ONE lexsort over (conv, turn_idx) orders every conversation of the
shard at once; run boundaries + ``reduceat``/``bincount`` do the per-conv
math — no Python loop per conversation). Scale story: the shuffle moves
each turn row once, a shard holds ``corpus/shards`` conversations (raise
``shards`` so a shard fits a worker heap), and skew is bounded because
conversations are small relative to shards.

The reference has no conversation table — these are the transcript-payload
analogues of its corpus-statistics pass (``indexer.py`` document stats,
SURVEY §2.5): per-group profile rows a curation pipeline gates on before
training (malformed role sequences, missing-turn gaps, tool-loop
conversations), plus the SFT staples: conversation-level exact dedup and
(context, target) example assembly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.util import DEFAULT_SHARDS, shard_column


def _strict_col(g: pa.Table, name: str, what: str):
    col = g[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{what}: null {name} unsupported (filter first)")
    return col


def _conv_runs(g: pa.Table, what: str):
    """Shared in-shard canonicalization: sort every conversation of the
    shard by (conv, turn_idx) in ONE lexsort and return run structure.

    Returns ``(order, codes, dictionary, starts, ends, rid)`` where
    ``order`` sorts the shard, ``codes`` are per-row conv codes AFTER the
    sort, ``starts``/``ends`` bound each conversation's run and ``rid`` is
    the per-row run id.
    """
    conv = pc.dictionary_encode(_strict_col(g, "conv_id", what))
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tix = _strict_col(g, "turn_idx", what).to_numpy(zero_copy_only=False)
    order = np.lexsort((tix, codes))
    c = codes[order]
    new = np.concatenate([[True], c[1:] != c[:-1]])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(c))
    rid = np.cumsum(new) - 1
    return order, c, conv.dictionary, starts, ends, rid


def _take(col, order: np.ndarray):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(order))


_STATS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_user", pa.int64()),
        ("n_assistant", pa.int64()),
        ("n_tool_turns", pa.int64()),
        ("n_tool_calls", pa.int64()),
        ("n_distinct_tools", pa.int64()),
        ("total_tokens", pa.int64()),
        ("duration_us", pa.int64()),
        ("alternation_breaks", pa.int64()),
        ("turn_gaps", pa.int64()),
        ("first_role", pa.string()),
        ("last_role", pa.string()),
    ]
)


def conv_stats(ds, shards: int = DEFAULT_SHARDS):
    """Per-conversation profile: turn/role/tool counts, token totals,
    wall-clock duration, role-alternation breaks (adjacent turns with the
    same role) and turn-index gaps (missing turns — ``turn_idx`` jumps).

    One conv-hash shard shuffle; everything in-shard is numpy over the
    shared lexsort (see module docstring). Token definition is the shared
    tokenizer contract (``[^a-z0-9]+`` split of ``lower(text)``, empties
    dropped) so the DuckDB twin is exact.
    """
    from tangent_ray.tokenize.text import split_tokens

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _STATS_SCHEMA.empty_table()
        order, c, dic, starts, ends, rid = _conv_runs(g, "conv_stats")
        n = len(c)
        n_convs = len(starts)

        role = _take(_strict_col(g, "role", "conv_stats"), order)
        renc = pc.dictionary_encode(role)
        rcode = renc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rdict = renc.dictionary.to_pylist()

        def role_count(name: str) -> np.ndarray:
            if name not in rdict:
                return np.zeros(n_convs, dtype=np.int64)
            mask = rcode == rdict.index(name)
            return np.bincount(rid[mask], minlength=n_convs).astype(np.int64)

        tool = _take(pc.fill_null(g["tool"], ""), order)
        tool_mask = pc.not_equal(tool, "").to_numpy(zero_copy_only=False)
        n_tool_calls = np.bincount(
            rid[tool_mask], minlength=n_convs
        ).astype(np.int64)

        # distinct tools per conv: unique (rid, tool_code) pairs
        tenc = pc.dictionary_encode(tool)
        tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = tcode.max() + 1  # n > 0 here (empty shards returned early)
        upair = np.unique(rid[tool_mask] * m + tcode[tool_mask])
        n_tools = np.bincount(
            (upair // m).astype(np.int64), minlength=n_convs
        ).astype(np.int64)

        text = _take(g["text"], order)
        parents, _toks, _ = split_tokens(text)
        per_row = np.zeros(n, dtype=np.int64)
        if len(parents):
            np.add.at(per_row, parents, 1)
        total_tokens = np.add.reduceat(per_row, starts).astype(np.int64)

        from tangent_ray.ops.streaming import _ts_us_strict

        ts = _ts_us_strict(_take(g["ts"], order), "conv_stats")
        dur = (
            np.maximum.reduceat(ts, starts) - np.minimum.reduceat(ts, starts)
        ).astype(np.int64)

        same_conv = rid[1:] == rid[:-1]
        brk_rows = same_conv & (rcode[1:] == rcode[:-1])
        breaks = np.bincount(rid[1:][brk_rows], minlength=n_convs).astype(
            np.int64
        )
        tix = _take(g["turn_idx"], order).to_numpy(zero_copy_only=False)
        gap_rows = same_conv & ((tix[1:] - tix[:-1]) != 1)
        gaps = np.bincount(rid[1:][gap_rows], minlength=n_convs).astype(
            np.int64
        )

        return pa.table(
            {
                "conv_id": pc.take(dic, pa.array(c[starts])),
                "n_turns": pa.array(
                    (ends - starts).astype(np.int64), type=pa.int64()
                ),
                "n_user": pa.array(role_count("user")),
                "n_assistant": pa.array(role_count("assistant")),
                "n_tool_turns": pa.array(role_count("tool")),
                "n_tool_calls": pa.array(n_tool_calls),
                "n_distinct_tools": pa.array(n_tools),
                "total_tokens": pa.array(total_tokens),
                "duration_us": pa.array(dur),
                "alternation_breaks": pa.array(breaks),
                "turn_gaps": pa.array(gaps),
                "first_role": role.take(pa.array(starts)),
                "last_role": role.take(pa.array(ends - 1)),
            },
            schema=_STATS_SCHEMA,
        )

    sharded = ds.map_batches(
        lambda b: shard_column(b, ["conv_id"], shards), batch_format="pyarrow"
    )
    return sharded.groupby("shard").map_groups(
        per_shard, batch_format="pyarrow"
    )


def tool_transitions(ds, shards: int = DEFAULT_SHARDS):
    """Tool-call transition counts: for every pair of CONSECUTIVE tool
    turns within a conversation (by ``turn_idx`` order, other roles in
    between skipped), count ``(prev_tool, tool)``; a conversation's first
    tool turn counts under ``prev_tool = ''`` (chain start).

    Shard-partial counts (each shard emits its local transition table, at
    most tools² rows) + one tiny global groupby sum — the agent-behavior
    analytics a transcript pipeline mines for tool-loop detection.
    """
    from ray.data.aggregate import Sum

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_tool": pa.array([], type=pa.string()),
                "tool": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        order, c, _dic, _starts, _ends, rid = _conv_runs(g, "tool_transitions")
        tool = _take(pc.fill_null(g["tool"], ""), order)
        mask = pc.not_equal(tool, "").to_numpy(zero_copy_only=False)
        if not mask.any():
            return empty
        sel = np.flatnonzero(mask)
        t_rid = rid[sel]
        t_tool = tool.take(pa.array(sel))
        first = np.concatenate([[True], t_rid[1:] != t_rid[:-1]])
        prev = pa.concat_arrays(
            [pa.array([""], type=pa.string()), t_tool.slice(0, len(sel) - 1)]
        )
        prev = pc.if_else(pa.array(first), "", prev)
        t = pa.table({"prev_tool": prev, "tool": t_tool})
        agg = t.group_by(["prev_tool", "tool"]).aggregate([("tool", "count")])
        return pa.table(
            {
                "prev_tool": agg["prev_tool"],
                "tool": agg["tool"],
                "n": pc.cast(agg["tool_count"], pa.int64()),
            }
        )

    sharded = ds.map_batches(
        lambda b: shard_column(b, ["conv_id"], shards), batch_format="pyarrow"
    )
    partial = sharded.groupby("shard").map_groups(
        per_shard, batch_format="pyarrow"
    )
    out = partial.groupby(["prev_tool", "tool"]).aggregate(
        Sum("n", alias_name="n")
    )

    def strip(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_tool": b["prev_tool"],
                "tool": b["tool"],
                "n": pc.cast(b["n"], pa.int64()),
            }
        )

    return out.map_batches(strip, batch_format="pyarrow")


# unit separator / record separator (SQL chr(31) / chr(30)). Raw text is
# NEVER composed with these: each turn's text is md5-hex'd first (hex is
# [0-9a-f], so a crafted text containing the separators cannot forge a
# different turn structure with the same canonical string); ``role`` is a
# schema-enumerated value ('user'/'assistant'/'tool'), composed plain.
_US = "\x1f"
_RS = "\x1e"


def conv_dedup(ds, shards: int = DEFAULT_SHARDS):
    """Conversation-level exact dedup: two conversations are duplicates
    when their ordered ``role:text`` turn sequences are byte-identical
    (``turn_idx`` gaps/renumbering ignored — order is what matters; ``ts``
    and ``tool`` excluded so re-runs of the same dialogue dedup).

    Per shard, each turn collapses to ``role ␟ md5(text)`` (separator-
    injection-proof — see the ``_US`` note), the conversation to ONE
    128-bit portable content key (md5 lower+upper halves over the
    ``␞``-joined turn tokens — DuckDB-recomputable, engine-independent);
    the global groupby then moves one narrow row per conversation, never
    the text. First-wins by min ``conv_id``; emits ``(conv_id, n_turns,
    dups)`` per distinct content, the conversation analogue of
    ``ops.dedup.exact_dedup``.
    """
    from ray.data.aggregate import Count, Max, Min

    from tangent_ray.tokenize.text import md5_u64_pair

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h1": pa.array([], type=pa.int64()),
                "h2": pa.array([], type=pa.int64()),
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        from tangent_ray.tokenize.text import md5_hex

        order, c, dic, starts, ends, _rid = _conv_runs(g, "conv_dedup")
        role = _take(_strict_col(g, "role", "conv_dedup"), order)
        text = _take(pc.fill_null(g["text"], ""), order)
        turn = pc.binary_join_element_wise(role, md5_hex(text), _US)
        lst = pa.ListArray.from_arrays(
            pa.array(np.append(starts, len(c)), type=pa.int32()),
            turn.combine_chunks() if isinstance(turn, pa.ChunkedArray) else turn,
        )
        canon = pc.binary_join(lst, _RS)
        h1, h2 = md5_u64_pair(canon)
        return pa.table(
            {
                "h1": pa.array(h1.astype(np.int64), type=pa.int64()),
                "h2": pa.array(h2.astype(np.int64), type=pa.int64()),
                "conv_id": pc.take(dic, pa.array(c[starts])),
                "n_turns": pa.array(
                    (ends - starts).astype(np.int64), type=pa.int64()
                ),
            }
        )

    sharded = ds.map_batches(
        lambda b: shard_column(b, ["conv_id"], shards), batch_format="pyarrow"
    )
    keys = sharded.groupby("shard").map_groups(
        per_shard, batch_format="pyarrow"
    )
    agg = keys.groupby(["h1", "h2"]).aggregate(
        Min("conv_id", alias_name="conv_id"),
        Max("n_turns", alias_name="n_turns"),
        Count(alias_name="dups"),
    )

    def strip(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "n_turns": pc.cast(b["n_turns"], pa.int64()),
                "dups": pc.cast(b["dups"], pa.int64()),
            }
        )

    return agg.map_batches(strip, batch_format="pyarrow")


def assemble_examples(ds, k_context: int = 3, shards: int = DEFAULT_SHARDS):
    """SFT example assembly: one training example per ASSISTANT turn —
    ``target`` is the assistant text, ``context`` the previous (up to)
    ``k_context`` turns rendered ``role: text`` and joined by newlines in
    turn order (empty when the assistant speaks first).

    Context windows of neighbouring examples overlap, so the in-shard
    kernel gathers them with ONE flattened ``take``: window bounds are
    contiguous slices of the (conv, turn_idx)-sorted render array, the
    flat gather index is built by pure offset arithmetic, and a ListArray
    over the gathered values joins every window in one ``binary_join``
    kernel call — no per-example Python.
    """

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "n_context_turns": pa.array([], type=pa.int64()),
                "context": pa.array([], type=pa.string()),
                "target": pa.array([], type=pa.string()),
            }
        )
        if g.num_rows == 0:
            return empty
        order, c, dic, starts, _ends, rid = _conv_runs(g, "assemble_examples")
        role = _take(_strict_col(g, "role", "assemble_examples"), order)
        text = _take(pc.fill_null(g["text"], ""), order)
        tix = _take(g["turn_idx"], order)

        is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(is_asst)
        if len(sel) == 0:
            return empty
        rendered = pc.binary_join_element_wise(role, text, ": ")
        if isinstance(rendered, pa.ChunkedArray):
            rendered = rendered.combine_chunks()

        # window [w_lo, i) per example, clamped to the conversation start
        conv_start = starts[rid[sel]]
        w_lo = np.maximum(sel - k_context, conv_start)
        m = (sel - w_lo).astype(np.int64)  # context turns per example
        offsets = np.concatenate([[0], np.cumsum(m)])
        flat = np.repeat(w_lo, m) + (
            np.arange(offsets[-1], dtype=np.int64)
            - np.repeat(offsets[:-1], m)
        )
        ctx_vals = rendered.take(pa.array(flat))
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            ctx_vals.combine_chunks()
            if isinstance(ctx_vals, pa.ChunkedArray)
            else ctx_vals,
        )
        context = pc.binary_join(lst, "\n")
        sel_pa = pa.array(sel)
        return pa.table(
            {
                "conv_id": pc.take(dic, pa.array(c[sel])),
                "turn_idx": tix.take(sel_pa),
                "n_context_turns": pa.array(m, type=pa.int64()),
                "context": context,
                "target": text.take(sel_pa),
            }
        )

    sharded = ds.map_batches(
        lambda b: shard_column(b, ["conv_id"], shards), batch_format="pyarrow"
    )
    return sharded.groupby("shard").map_groups(
        per_shard, batch_format="pyarrow"
    )
