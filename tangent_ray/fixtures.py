"""Deterministic synthetic transcripts corpus + query set (FIXTURES.md).

Everything is a pure function of row index (seed fixed at 42-derived
constants, no RNG state, no wall clock), so any scale regenerates
identically — the property the resume/golden tests rely on. Schema is
exactly the BASELINE.json ``input_hint`` shape::

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

Text is a Zipf-ish stream over a ~5k-stem vocabulary with hot/cold grading;
~1 in 4 assistant turns embeds a ``$...$`` math fragment drawn from a
template pool expressed directly in Tangent SLT syntax (the shapes mirror
the reference's bundled test corpus — fractions, scripts, radicals,
parenthesized groups; ``testing/test_data``)."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = ["user", "assistant", "tool"]

_BASES = [
    "query", "index", "token", "merge", "shard", "batch", "stream", "vector",
    "table", "filter", "sort", "group", "join", "scan", "write", "read",
    "cache", "spill", "block", "actor", "task", "graph", "plan", "stage",
    "store", "fetch", "score", "rank", "match", "search", "parse", "encode",
]
_SUFFIXES = ["", "s", "ing", "ed", "er", "ation", "able"]


def vocab() -> list[str]:
    """~5k words: graded pools of base+suffix+numeric variants."""
    out = []
    for i in range(700):
        base = _BASES[i % len(_BASES)]
        for suf in _SUFFIXES:
            out.append(f"{base}{i // len(_BASES)}{suf}" if i >= len(_BASES) else base + suf)
    # dedupe preserving order
    seen = set()
    uniq = []
    for w in out:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    return uniq


_SLT_TEMPLATES = [
    "[V!{v}[=[F!,o[N!{n}],u[V!{w}]]]]",      # v = n/w
    "[V!{v}[+[V!{w},a[N!{n}]]]]",            # v + w^n
    "[V!{v}[*[V!{w}]],b[V!i]]",              # v_i * w
    "[R!,w[V!{v}]]",                          # sqrt(v)
    "[V!{v}[M!()1x1,w[V!{w}]]]",             # v(w)
    "[V!{v}]",                                # bare symbol (height 0)
    "[V!{v},b[N!{n}]]",                       # v_n (height 1)
    "[N!{n}[+[N!{m}[=[N!{s}]]]]]",           # n + m = s
]


def _turn_text(c: int, t: int, words: list[str]) -> str:
    nv = len(words)
    n_words = 8 + ((c * 13 + t * 7) % 25)
    # graded pick: 60% of picks from the hot head, rest spread over the tail
    toks = []
    for i in range(n_words):
        h = (c * 31 + t * 17 + i * 7919) % 100
        if h < 60:
            toks.append(words[(c + t + i) % 50])
        else:
            toks.append(words[(c * 131 + t * 37 + i * 101) % nv])
    role = _ROLES[(c + t) % 3]
    if role == "assistant" and (c * 7 + t) % 4 == 0:
        tpl = _SLT_TEMPLATES[(c + t) % len(_SLT_TEMPLATES)]
        frag = tpl.format(
            v="xyzabc"[(c + t) % 6],
            w="pqrstu"[(c * 3 + t) % 6],
            n=(c + t) % 10,
            m=(c * 2 + t) % 10,
            s=(3 * c + t) % 10,
        )
        toks.append(f"${frag}$")
    return " ".join(toks)


def generate_conv_range(c_lo: int, c_hi: int) -> pa.Table:
    """Rows for convs ``[c_lo, c_hi)`` — pure function of conv index, so any
    sharding of the range concatenates to the identical corpus."""
    words = vocab()
    conv_ids: list[str] = []
    turn_idx: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts: list[int] = []
    # tz-aware: a naive datetime's .timestamp() applies the LOCAL zone,
    # which would make the "pure function of row index" corpus differ
    # across machines
    epoch = int(
        datetime.datetime(
            2026, 1, 1, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    for c in range(c_lo, c_hi):
        n_turns = 2 + (c * 7919) % 14
        for t in range(n_turns):
            conv_ids.append(f"conv{c:08d}")
            turn_idx.append(t)
            role = _ROLES[(c + t) % 3]
            roles.append(role)
            texts.append(_turn_text(c, t, words))
            tools.append(f"tool{(c + t) % 8}" if role == "tool" else "")
            ts.append(epoch + (c * 1000 + t) * 1_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def generate_transcripts(n_convs: int) -> pa.Table:
    return generate_conv_range(0, n_convs)


def _write_shard(path: str, c_lo: int, c_hi: int) -> None:
    tmp = path + ".tmp"
    pq.write_table(generate_conv_range(c_lo, c_hi), tmp)
    os.replace(tmp, path)


def write_transcripts(out_dir: str, n_convs: int, files: int = 4) -> list[str]:
    """Write the corpus as ``files`` parquet shards (conv-contiguous ranges).

    Cached on the FULL layout key (n_convs, files), not mere file
    existence: a reused out_dir generated under different parameters is
    wiped and regenerated (existence-only caching silently returned a
    stale corpus, or mixed shard bounds from two layouts). Generation is
    fanned out over Ray tasks when a session is up (each shard is a pure
    function of its conv range), else done serially.
    """
    import glob
    import json

    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"part-{i:04d}.parquet") for i in range(files)]
    meta_path = os.path.join(out_dir, "_layout.json")
    meta = {"n_convs": n_convs, "files": files}
    try:
        with open(meta_path) as f:
            cached = json.load(f)
    except (OSError, ValueError):
        cached = None
    if cached != meta:
        for stale in glob.glob(os.path.join(out_dir, "part-*.parquet")):
            os.remove(stale)
    elif all(os.path.exists(p) for p in paths):
        return paths
    bounds = [i * n_convs // files for i in range(files + 1)]
    jobs = [
        (p, bounds[i], bounds[i + 1])
        for i, p in enumerate(paths)
        if not os.path.exists(p)
    ]
    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, meta_path)
    import ray

    if ray.is_initialized() and n_convs >= 4096:
        task = ray.remote(num_cpus=1)(_write_shard)
        ray.get([task.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _write_shard(*j)
    return paths


def query_set() -> pa.Table:
    """~25 fixed queries: exact/partial/hot/rare/empty/tie-heavy cases."""
    words = vocab()
    rows = []

    def q(qid, kind, text, topk=10):
        rows.append({"query_id": qid, "kind": kind, "text": text, "topk": topk})

    q("q001", "text", f"{words[0]} {words[7]}")                 # hot terms
    q("q002", "text", words[4321 % len(words)])                  # rare-ish term
    q("q003", "text", f"{words[2]} {words[3]} {words[5]}")
    q("q004", "text", "zzznotaword")                             # empty result
    q("q005", "text", " ".join(words[10:16]), 100)               # many terms
    q("q006", "text", words[1])                                  # single hot (tie-heavy)
    q("q007", "math", "$[V!x[=[F!,o[N!1],u[V!p]]]]$")           # exact template hit
    q("q008", "math", "$[V!x[+[V!p,a[N!2]]]]$")
    q("q009", "math", "$[R!,w[V!z]]$")
    q("q010", "math", "$[V!q]$", 20)                              # bare symbol
    q("q011", "math", "$[V!x[=[F!,o[N!9],u[V!q]]]]$")
    q("q012", "math", "$[V!nosuch]$")                             # empty result
    q("q013", "math", "$[V!x,b[N!3]]$")
    q("q014", "mixed", f"{words[0]} $[R!,w[V!x]]$")
    q("q015", "mixed", f"{words[12]} {words[13]} $[V!a[+[V!q,a[N!4]]]]$")
    q("q016", "text", f"{words[50]} {words[300]}")
    q("q017", "text", " ".join(words[60:63]), 50)
    q("q018", "math", "$[?v[=[F!,o[N!1],u[V!p]]]]$")             # wildcard from
    q("q019", "math", "$[V!x[=[?w]]]$")                           # wildcard to
    q("q020", "math", "$[N!3[+[N!4[=[N!7]]]]]$", 20)
    q("q021", "text", "queries indexed merging", 20)              # stemming hits
    q("q022", "text", f"{words[33]}", 1000)
    q("q023", "mixed", "$[V!z]$ " + words[8], 30)
    q("q024", "math", "$[V!x[+[V!p,a[N!2]]]]$ $[R!,w[V!t]]$")   # two formulas
    q("q025", "text", f"{words[100]} {words[101]} {words[102]} {words[103]}")
    # Presentation-MathML formula query (the reference topic format) —
    # must rank identically to its $SLT$ twin q007
    q(
        "q026",
        "math",
        "<math><mi>x</mi><mo>=</mo><mfrac><mn>1</mn><mi>p</mi></mfrac></math>",
    )
    return pa.Table.from_pylist(rows)


def conv_gate_corpus() -> pa.Table:
    """Conversation-analytics gate corpus: 40 generated conversations plus
    planted edge cases the analytics must detect —

    - ``dupc...`` twins of convs 3 and 17: identical ordered ``role:text``
      content under a NEW conv_id with shifted timestamps (conv_dedup must
      collapse each pair; ts/turn renumbering are excluded from identity),
    - ``gapc00000007``: conv 7 with its ``turn_idx == 1`` row removed
      (one turn-index gap; NOT a duplicate of conv 7),
    - ``zsolo``: a single assistant-only turn (empty-context example), and
    - ``znull``: a conversation containing a NULL text turn (token count 0,
      canonical form uses the empty string).

    Pure function of nothing (seedless, clock-free) — the oracle twin
    embeds these exact rows as a SQL literal.
    """
    import pyarrow.compute as pc

    base = generate_conv_range(0, 40)

    def clone(src_conv: int, new_id: str, ts_shift_us: int,
              drop_turn: int | None = None) -> pa.Table:
        t = base.filter(pc.equal(base["conv_id"], f"conv{src_conv:08d}"))
        if drop_turn is not None:
            t = t.filter(pc.not_equal(t["turn_idx"], drop_turn))
        cols = {c: t[c] for c in t.column_names}
        cols["conv_id"] = pa.array([new_id] * t.num_rows, type=pa.string())
        shifted = pc.add(
            t["ts"].cast(pa.int64()), ts_shift_us
        ).cast(pa.timestamp("us"))
        cols["ts"] = shifted
        return pa.table(cols, schema=base.schema)

    epoch = base["ts"][0].value
    extras = [
        clone(3, "dupc00000003", 3_600_000_000),
        clone(17, "dupc00000017", 3_600_000_000),
        clone(7, "gapc00000007", 7_200_000_000, drop_turn=1),
        pa.table(
            {
                "conv_id": pa.array(["zsolo", "znull", "znull"]),
                "turn_idx": pa.array([0, 0, 1], type=pa.int32()),
                "role": pa.array(["assistant", "user", "assistant"]),
                "text": pa.array(["solo reply with $[V!x]$", None, "ack"]),
                "tool": pa.array(["", "", ""]),
                "ts": pa.array(
                    [epoch + 9_000_000_000 + i * 1_000_000 for i in range(3)],
                    type=pa.timestamp("us"),
                ),
            },
            schema=base.schema,
        ),
    ]
    return pa.concat_tables([base, *extras])
