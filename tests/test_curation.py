"""Unit tests for ops/curation.py: PII redaction, decontamination,
stratified sampling, sequence packing."""

import numpy as np
import pyarrow as pa

from tangent_ray.ops.curation import (
    Decontaminate,
    PACK_SEQ_LEN,
    pack_group,
    pii_redact_batch,
    sample_bucket,
    stratified_sample_batch,
)


def _doc_table(texts, **extra):
    cols = {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts)}
    cols.update({k: pa.array(v) for k, v in extra.items()})
    return pa.table(cols)


def test_pii_redact_basic():
    b = _doc_table(
        [
            "mail me at jane.doe+x@example.co.uk today",
            "call +1 (555) 123-4567 or 555 987-6543",
            "server at 192.168.0.1 and 10.0.0.255",
            "clean text with no pii at all",
            "a@b.io then 1.2.3.4",
        ]
    )
    out = pii_redact_batch(b)
    red = out["redacted"].to_pylist()
    assert red[0] == "mail me at <EMAIL> today"
    assert "<PHONE>" in red[1] and "555" not in red[1]
    assert red[2] == "server at <IP> and <IP>"
    assert red[3] == "clean text with no pii at all"
    assert red[4] == "<EMAIL> then <IP>"
    assert out["n_email"].to_pylist() == [1, 0, 0, 0, 1]
    assert out["n_phone"].to_pylist()[1] == 2
    assert out["n_ipv4"].to_pylist() == [0, 0, 2, 0, 1]


def test_pii_redact_matches_duckdb_twin():
    """The SQL twin replays the same RE2 passes — byte-identical output."""
    import duckdb

    from tangent_ray.pipelines.entry_queries import _pii_sql

    b = _doc_table(
        [
            "a@b.io then 1.2.3.4 and +1 555-123-4567",
            "nested bob@x.y.example.com.",
            "",
        ]
    )
    con = duckdb.connect()
    con.register("documents", b)
    want = con.execute(_pii_sql()).arrow()
    got = pii_redact_batch(b).select(want.schema.names)
    assert got.to_pydict() == want.to_pydict()


def test_decontaminate_counts_distinct_overlap():
    ho = _doc_table(["the quick brown fox jumps over the lazy dog"])
    from tangent_ray.ops.curation import _doc_shingle_hashes

    _, ho_hashes = _doc_shingle_hashes(ho, 5, "text", "doc_id")
    d = Decontaminate(np.unique(ho_hashes), n=5)
    tr = _doc_table(
        [
            "the quick brown fox jumps over a cliff",  # shares 4 5-grams
            "totally unrelated text with no overlap here at all",
            "the quick brown fox jumps the quick brown fox jumps",  # distinct!
        ]
    )
    out = d(tr)
    # doc 0 shares exactly 2 of its 4 5-grams with the holdout sentence
    assert out["n_bad"].to_pylist() == [2, 0, 1]
    assert out["contaminated"].to_pylist() == [True, False, True]


def test_drop_contaminated_filters_and_keeps_columns():
    from tangent_ray.ops.curation import DropContaminated, _doc_shingle_hashes

    ho = _doc_table(["the quick brown fox jumps over the lazy dog"])
    _, hashes = _doc_shingle_hashes(ho, 5, "text", "doc_id")
    d = DropContaminated(np.unique(hashes), n=5)
    tr = _doc_table(
        [
            "the quick brown fox jumps over a cliff",
            "totally unrelated text with no overlap here at all",
        ],
        source=["a", "b"],
    )
    out = d(tr)
    assert out.num_rows == 1
    assert out.column_names == tr.column_names  # passthrough schema
    assert out["doc_id"].to_pylist() == [1] and out["source"].to_pylist() == ["b"]


def test_stratified_sample_subset_property():
    n = 2000
    b = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array(["s"] * n),
        }
    )
    lo = stratified_sample_batch(b, rates={}, default_rate=0.2)
    hi = stratified_sample_batch(b, rates={}, default_rate=0.5)
    lo_ids = set(lo["doc_id"].to_pylist())
    hi_ids = set(hi["doc_id"].to_pylist())
    assert lo_ids <= hi_ids
    assert 0.15 < len(lo_ids) / n < 0.25
    assert 0.45 < len(hi_ids) / n < 0.55
    # per-source rates override the default
    b2 = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array((["a", "b"] * n)[:n]),
        }
    )
    out = stratified_sample_batch(b2, rates={"a": 0.0, "b": 1.0})
    srcs = set(out["source"].to_pylist())
    assert srcs == {"b"} and out.num_rows == n // 2


def test_sample_bucket_deterministic_and_salted():
    ids = np.arange(100, dtype=np.int64)
    assert (sample_bucket(ids) == sample_bucket(ids)).all()
    from tangent_ray.ops.textstats import split_assign_batch

    split = split_assign_batch(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    )["bucket"].to_numpy(zero_copy_only=False)
    # the 's:' salt decorrelates sampling from the holdout split hash
    assert not (sample_bucket(ids) % 1000 == split).all()


def test_pack_group_hand_case():
    g = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], type=pa.int64()),
            "source": pa.array(["s"] * 4),
            # token counts (after sort by doc_id): 3, 0, 2, 4
            "text": pa.array(["c c", "a b c", "", "d d d d"]),
        }
    )
    out = pack_group(g, seq_len=4)
    assert out["doc_id"].to_pylist() == [1, 2, 3, 4]
    assert out["n_tok"].to_pylist() == [3, 0, 2, 4]
    # cum before: 0, 3, 3, 5 with seq_len=4
    assert out["seq_first"].to_pylist() == [0, 0, 0, 1]
    assert out["seq_last"].to_pylist() == [0, 0, 1, 2]  # docs 3,4 span cuts
    assert out["seq_offset"].to_pylist() == [0, 3, 3, 1]
    assert PACK_SEQ_LEN == 256  # SQL twin hard-codes it


def test_sample_threshold_keeps_boundary_bucket():
    from tangent_ray.ops.curation import SAMPLE_BUCKETS, sample_threshold

    # 0.3 * 1e6 = 299999.99999999994 in binary float; int() truncation
    # would drop bucket 299999 — round() keeps the mathematical boundary
    assert sample_threshold(0.3) == 300_000
    assert sample_threshold(1.0) == SAMPLE_BUCKETS
    assert sample_threshold(0.0) == 0


def test_pack_group_empty_stub_matches_int_key_schema():
    import pyarrow as pa

    from tangent_ray.ops.curation import pack_group

    empty_int_key = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.int32()),  # non-string key
        }
    )
    out = pack_group(empty_int_key)
    assert out.schema.field("source").type == pa.int32()


def test_chunk_spans_hand_case():
    import pyarrow as pa

    from tangent_ray.ops.curation import chunk_spans_batch

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(10)),  # 10 tokens
                    " ".join(f"w{i}" for i in range(4)),   # exactly one chunk
                    "",                                      # no chunks
                    " ".join(f"w{i}" for i in range(5)),   # 4 + 1 overflow
                ]
            ),
        }
    )
    out = chunk_spans_batch(docs, max_tokens=4, overlap=1)
    rows = [
        (r["doc_id"], r["chunk_idx"], r["tok_start"], r["tok_end"])
        for r in out.to_pylist()
    ]
    # doc1: stride 3 -> starts 0,3,6 cover [0,4),[3,7),[6,10): 9 < 10 at
    # start 6? end=min(6+4,10)=10 reaches the end at chunk 2
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, 4), (1, 1, 3, 7), (1, 2, 6, 10)
    ]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, 4)]
    assert [r for r in rows if r[0] == 3] == []
    assert [r for r in rows if r[0] == 4] == [(4, 0, 0, 4), (4, 1, 3, 5)]


def test_chunk_spans_full_coverage_property():
    import numpy as np
    import pyarrow as pa

    from tangent_ray.ops.curation import chunk_spans_batch

    rng = np.random.default_rng(9)
    lens = rng.integers(0, 40, 30)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(30), type=pa.int64()),
            "text": pa.array([" ".join("x" for _ in range(n)) for n in lens]),
        }
    )
    out = chunk_spans_batch(docs, max_tokens=7, overlap=3).to_pylist()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, n in enumerate(lens):
        chunks = sorted(by_doc.get(d, []), key=lambda r: r["chunk_idx"])
        if n == 0:
            assert not chunks
            continue
        # full coverage, correct overlap, last chunk reaches the end
        assert chunks[0]["tok_start"] == 0
        assert chunks[-1]["tok_end"] == n
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] == a["tok_start"] + 4  # stride
            assert b["tok_start"] < a["tok_end"]  # overlap maintained
