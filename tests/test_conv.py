"""Conversation-level analytics (ops/conv.py) vs exact DuckDB twins.

The twins define correctness over the doctored gate corpus
(``fixtures.conv_gate_corpus``): planted duplicate conversations, a
turn-index gap, an assistant-only conversation (empty context) and a NULL
text turn. Every comparison is exact row-multiset equality.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from tangent_ray.fixtures import conv_gate_corpus
from tangent_ray.ops.conv import (
    assemble_examples,
    conv_dedup,
    conv_stats,
    tool_transitions,
)

CONV_STATS_SQL = """
WITH seq AS (
  SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS ts_us,
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
  SELECT conv_id, sum(ntok)::BIGINT AS total_tokens FROM tok GROUP BY conv_id
)
SELECT s.conv_id, n_turns, n_user, n_assistant, n_tool_turns, n_tool_calls,
       n_distinct_tools, total_tokens, duration_us, alternation_breaks,
       turn_gaps, first_role, last_role
FROM s JOIN tk USING (conv_id)
"""

TOOL_TRANSITIONS_SQL = """
WITH tt AS (
  SELECT conv_id, turn_idx, tool FROM t WHERE coalesce(tool, '') <> ''
), seq AS (
  SELECT coalesce(lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  '') AS prev_tool,
         tool
  FROM tt
)
SELECT prev_tool, tool, count(*)::BIGINT AS n FROM seq GROUP BY 1, 2
"""

CONV_DEDUP_SQL = """
WITH c AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         string_agg(role || chr(31) || md5(coalesce(text, '')), chr(30)
                    ORDER BY turn_idx) AS s
  FROM t GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id, max(n_turns) AS n_turns,
       count(*)::BIGINT AS dups
FROM c GROUP BY s
"""

# positional window: the previous k TURNS of the conversation (row_number
# over turn_idx order), not turn_idx arithmetic — turn-index gaps do not
# shrink the context
EXAMPLES_SQL = """
WITH p AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
)
SELECT a.conv_id, a.turn_idx,
       count(b.rn)::BIGINT AS n_context_turns,
       coalesce(string_agg(b.role || ': ' || b.text, chr(10)
                           ORDER BY b.rn), '') AS context,
       a.text AS target
FROM p a LEFT JOIN p b
  ON b.conv_id = a.conv_id AND b.rn BETWEEN a.rn - {k} AND a.rn - 1
WHERE a.role = 'assistant'
GROUP BY a.conv_id, a.turn_idx, a.text
"""


@pytest.fixture(scope="module")
def corpus():
    return conv_gate_corpus()


def _twin(tbl: pa.Table, sql: str) -> pa.Table:
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(sql).arrow()


def _run(op, tbl: pa.Table, **kw) -> pa.Table:
    import ray
    import ray.data

    ds = ray.data.from_arrow(tbl).repartition(5)
    refs = op(ds, **kw).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tabs)


def _canon(t: pa.Table):
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _assert_equal(got: pa.Table, want: pa.Table):
    import pandas as pd

    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_conv_stats_matches_twin(ray_session, corpus):
    got = _run(conv_stats, corpus, shards=8)
    _assert_equal(got, _twin(corpus, CONV_STATS_SQL))
    # planted facts: the gap conv reports exactly one turn-index gap,
    # everything else none
    rows = {r["conv_id"]: r for r in got.to_pylist()}
    assert rows["gapc00000007"]["turn_gaps"] == 1
    assert sum(r["turn_gaps"] for r in rows.values()) == 1
    assert rows["zsolo"] == {
        "conv_id": "zsolo", "n_turns": 1, "n_user": 0, "n_assistant": 1,
        "n_tool_turns": 0, "n_tool_calls": 0, "n_distinct_tools": 0,
        "total_tokens": 5, "duration_us": 0, "alternation_breaks": 0,
        "turn_gaps": 0, "first_role": "assistant", "last_role": "assistant",
    }
    # the fixture's 3-cycle role pattern never repeats a role back-to-back
    assert rows["conv00000003"]["alternation_breaks"] == 0
    # null text counts zero tokens but the turn still counts
    assert rows["znull"]["n_turns"] == 2
    assert rows["znull"]["total_tokens"] == 1  # "ack"


def test_tool_transitions_matches_twin(ray_session, corpus):
    got = _run(tool_transitions, corpus, shards=8)
    _assert_equal(got, _twin(corpus, TOOL_TRANSITIONS_SQL))
    # every conversation's first tool turn charges the '' chain-start edge
    starts = sum(r["n"] for r in got.to_pylist() if r["prev_tool"] == "")
    n_convs_with_tools = _twin(
        corpus,
        "SELECT count(DISTINCT conv_id) AS n FROM t"
        " WHERE coalesce(tool,'') <> ''",
    )["n"][0].as_py()
    assert starts == n_convs_with_tools


def test_conv_dedup_matches_twin(ray_session, corpus):
    got = _run(conv_dedup, corpus, shards=8)
    _assert_equal(got, _twin(corpus, CONV_DEDUP_SQL))
    rows = {r["conv_id"]: r for r in got.to_pylist()}
    # the two planted twins collapse; first-wins picks the 'conv' id
    assert rows["conv00000003"]["dups"] == 2
    assert rows["conv00000017"]["dups"] == 2
    assert "dupc00000003" not in rows and "dupc00000017" not in rows
    # the gap conv is NOT a duplicate of conv 7 (one turn missing)
    assert rows["gapc00000007"]["dups"] == 1
    assert rows["conv00000007"]["dups"] == 1


@pytest.mark.parametrize("k", [1, 3])
def test_assemble_examples_matches_twin(ray_session, corpus, k):
    got = _run(assemble_examples, corpus, k_context=k, shards=8)
    _assert_equal(got, _twin(corpus, EXAMPLES_SQL.format(k=k)))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in got.to_pylist()}
    solo = rows[("zsolo", 0)]
    assert solo["n_context_turns"] == 0 and solo["context"] == ""
    assert solo["target"] == "solo reply with $[V!x]$"
    # null-text turn renders as 'user: ' inside its successor's context
    znull = rows[("znull", 1)]
    assert znull["context"] == "user: " and znull["target"] == "ack"


def test_conv_dedup_separator_injection_safe(ray_session):
    """A turn whose TEXT embeds the canonical separators must not forge
    the structure of a different conversation (each turn's text is md5'd
    before composition)."""
    import hashlib

    forged = "hi\x1e" + "assistant\x1f" + hashlib.md5(b"ok").hexdigest()
    t = pa.table(
        {
            "conv_id": pa.array(["a", "b", "b"]),
            "turn_idx": pa.array([0, 0, 1], type=pa.int32()),
            "role": pa.array(["user", "user", "assistant"]),
            "text": pa.array([forged, "hi", "ok"]),
            "tool": pa.array(["", "", ""]),
            "ts": pa.array([0, 0, 1], type=pa.timestamp("us")),
        }
    )
    got = _run(conv_dedup, t, shards=4)
    assert got.num_rows == 2  # 'a' and 'b' are NOT duplicates
    assert sorted(got["dups"].to_pylist()) == [1, 1]
    _assert_equal(got, _twin(t, CONV_DEDUP_SQL))


def test_null_timestamp_rejected(ray_session, corpus):
    bad = corpus.set_column(
        corpus.column_names.index("ts"), "ts",
        pa.array([None] * corpus.num_rows, type=pa.timestamp("us")),
    )
    with pytest.raises(Exception, match="null"):
        _run(conv_stats, bad, shards=4)
