"""C4 line filter (ops/curation.c4_filter): hand fixtures + exact DuckDB
twin over fixtures, fuzz corpora, and the real corpus sample."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.ops.curation import c4_filter, c4_filter_batch

C4_SQL = """
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
ORDER BY agg.doc_id
"""

COLS = ["doc_id", "text", "n_kept_lines", "n_dropped_lines", "keep"]


def _twin(tbl):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(C4_SQL).arrow().select(COLS)


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_c4_hand_fixtures():
    texts = [
        # 3 good sentences -> kept doc, junk lines dropped
        "This is the first full sentence of the page.\n"
        "menu home about contact\n"
        "Here is another complete sentence with enough words.\n"
        "And a third sentence rounds out the document nicely!",
        # lorem ipsum page
        "Lorem Ipsum dolor sit amet is placeholder text everywhere.\n"
        "A second real sentence sits right here today.\n"
        "A third real sentence sits right here today too.",
        # code page (brace)
        'function f() { return "many words in this sentence here."; }\n'
        "This sentence would otherwise pass the filter easily.\n"
        "So would this one with its terminal punctuation mark.\n"
        "And this third one completes the trio of sentences.",
        # too few kept sentences
        "Short line.\nAnother short one.\nno punctuation here at all",
        "",
    ]
    out = c4_filter_batch(_docs(texts))
    keep = out["keep"].to_pylist()
    assert keep == [True, False, False, False, False]
    assert out["n_kept_lines"].to_pylist()[0] == 3
    assert out["text"].to_pylist()[0].count("\n") == 2
    assert "menu home" not in out["text"].to_pylist()[0]


def test_c4_matches_duckdb_twin_fixtures():
    from tests.test_fuzz_curation import _corpus

    texts = [
        "One good sentence right here with plenty of words.\nshort.\nx",
        'He said "stop" and left.\nExactly five words here now.\n'
        "Another one with five words too!",
        "\n\n\n",
        "Ends with quote after words in this line\"\nBad line\nMe too.",
        None,
    ]
    tbl = _docs(texts)
    got = c4_filter_batch(tbl).select(COLS)
    want = _twin(tbl)
    assert got.to_pydict() == want.to_pydict()
    # fuzz corpora too
    for seed in range(4):
        t = _corpus(seed + 300)
        g = c4_filter_batch(t).select(COLS)
        w = _twin(t)
        assert g.to_pydict() == w.to_pydict(), f"seed {seed}"


def test_c4_matches_duckdb_twin_real_corpus(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    tabs = [t for t in ray.get(c4_filter(ds).to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.argsort(got["doc_id"].to_numpy(zero_copy_only=False))
    got = got.take(pa.array(order))
    want = _twin(pq.read_table(path, columns=["doc_id", "text"]))
    assert got.to_pydict() == want.to_pydict()
