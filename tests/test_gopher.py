"""Gopher quality filter (ops/textstats.gopher_filter): hand fixtures per
rule + an exact DuckDB twin of the full 11-bit fail mask over fixtures and
the real corpus sample. Reuses the repetition twin for bits 6-10."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.ops.textstats import (
    GOPHER_RULES,
    gopher_filter_batch,
    gopher_filter,
)
from tests.test_repetition import REPETITION_SQL

BIT = {name: i for i, name in enumerate(GOPHER_RULES)}


def _gopher_sql(min_words=50, max_words=100_000):
    return f"""
WITH rep AS ({REPETITION_SQL.replace("ORDER BY tc.doc_id", "")}),
tk AS (
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
           + len(regexp_extract_all(t, '\\.{{3}}'))::BIGINT
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
         sum(CASE WHEN regexp_matches(line, '(\\.{{3}}|…)\\s*$')
                  THEN 1 ELSE 0 END)::BIGINT AS ell_end
  FROM l0 GROUP BY doc_id
)
SELECT w.doc_id, w.n_words,
       (CASE WHEN w.n_words < {min_words} OR w.n_words > {max_words}
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
ORDER BY w.doc_id
"""


def _twin(tbl, **kw):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(_gopher_sql(**kw)).arrow()


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


GOOD = (
    "The project was designed to have a robust and reliable pipeline that "
    "would scale with the data volume and keep operating costs low. "
    "Engineers continued to refine the approach over several months, and "
    "the results have improved steadily with each release cycle of the "
    "platform, which the team shipped on schedule despite many setbacks."
)


def test_gopher_rules_hand_fixtures():
    docs = [
        GOOD,                                 # passes everything
        "short text",                         # word_count (+stopwords)
        GOOD + " ####### ##### ###### ####",  # symbol_ratio
        "\n".join(["- bullet point here"] * 12) + "\nplain",  # bullets
        # 60 alpha words, sane lengths, only ONE distinct stopword ("the")
        ("running fast near green hills while birds sing loudly about "
         "summer rain under bright skies the children play games outside "
         "before dinner time arrives slowly ") * 2
        + "wind blows softly across open fields during late afternoon "
          "hours when farmers gather ripe crops",
    ]
    out = gopher_filter_batch(_doc_table(docs))
    mask = out["fail_mask"].to_pylist()
    keep = out["keep"].to_pylist()
    assert keep[0] and mask[0] == 0
    assert mask[1] & (1 << BIT["word_count"])
    assert mask[2] & (1 << BIT["symbol_ratio"]) and not (
        mask[2] & (1 << BIT["word_count"])
    )
    assert mask[3] & (1 << BIT["bullet_ellipsis"])
    assert mask[4] & (1 << BIT["stopwords"])


def test_gopher_matches_duckdb_twin_fixtures():
    docs = [
        GOOD,
        "",  # empty: word_count + mean_len + symbol(inf) + alpha + stop
        "short",
        GOOD + " ...... ... … ... ...",
        "line one...\nline two...\nline three ends here\nx",
        "- a\n- b\n- c\n- d",
        ("tiny tiny tiny tiny tiny " * 20),  # repetition bits fire
        "12345 67890 " * 30,  # alpha_words fails, numbers are tokens
        GOOD + "\n\n" + GOOD,  # dup paragraphs -> dup_line bits
    ]
    tbl = _doc_table(docs)
    got = gopher_filter_batch(tbl)
    want = _twin(tbl)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["n_words"].to_pylist() == want["n_words"].to_pylist()
    gm, wm = got["fail_mask"].to_pylist(), want["fail_mask"].to_pylist()
    for i, (a, b) in enumerate(zip(gm, wm)):
        diff = a ^ b
        bad = [r for r in GOPHER_RULES if diff & (1 << BIT[r])]
        assert a == b, f"doc {i}: engine {a:b} vs twin {b:b}, differing {bad}"


def test_gopher_matches_duckdb_twin_real_corpus(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    tabs = [
        t for t in ray.get(gopher_filter(ds).to_arrow_refs()) if t.num_rows
    ]
    got = pa.concat_tables(
        [t.select(["doc_id", "n_words", "fail_mask"]) for t in tabs]
    )
    order = np.argsort(got["doc_id"].to_numpy(zero_copy_only=False))
    got = got.take(pa.array(order))
    want = _twin(pq.read_table(path, columns=["doc_id", "text"]))
    assert got.num_rows == want.num_rows
    assert got["fail_mask"].to_pylist() == want["fail_mask"].to_pylist()
    assert got["n_words"].to_pylist() == want["n_words"].to_pylist()
