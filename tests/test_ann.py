"""ANN / near-dup operator tests over synthetic clustered vectors."""

import numpy as np
import pyarrow as pa


def _clustered(n=120, d=16, k=4, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((k, d)) * 4
    vecs = cents[np.arange(n) % k] + rng.standard_normal((n, d)) * 0.2
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )


def _cosine(m):
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return m @ m.T


def test_near_dup_pairs_exact(ray_session):
    import ray.data

    from tangent_ray.ops.ann import near_dup_pairs

    t = _clustered()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sims = _cosine(m)
    iu = np.triu_indices(len(m), k=1)
    tau = 0.95
    want = {(int(a), int(b)) for a, b in zip(*iu) if sims[a, b] >= tau}
    assert want, "fixture must produce near-dup pairs"

    got_rows = near_dup_pairs(ray.data.from_arrow(t), threshold=tau).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == want
    for r in got_rows:
        assert abs(r["score"] - sims[r["doc_a"], r["doc_b"]]) < 1e-9
        assert r["doc_a"] < r["doc_b"]


def test_ivf_knn_recall(ray_session):
    import ray.data

    from tangent_ray.ops.ann import ivf_knn, knn_cosine

    t = _clustered(n=200)
    q = np.array(t["embedding"][0].as_py(), dtype=np.float64)[None, :]
    exact = knn_cosine(ray.data.from_arrow(t), q, k=10).take_all()
    approx = ivf_knn(ray.data.from_arrow(t), q, k=10, nlist=8, nprobe=4).take_all()
    exact_ids = {r["vec_id"] for r in exact}
    approx_ids = {r["vec_id"] for r in approx}
    # clustered data + 4/8 probes: the query's own cluster is probed,
    # so recall of the true top-10 must be high
    assert len(approx_ids & exact_ids) >= 8
    # scores of returned ids are the exact cosines
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = (q / np.linalg.norm(q))[0]
    for r in approx:
        assert abs(r["score"] - float(m[r["vec_id"]] @ qn)) < 1e-9


def test_lsh_knn_recall(ray_session):
    import ray.data

    from tangent_ray.ops.ann import knn_cosine, lsh_knn

    t = _clustered(n=200)
    q = np.array(t["embedding"][0].as_py(), dtype=np.float64)[None, :]
    exact = {r["vec_id"] for r in knn_cosine(ray.data.from_arrow(t), q, k=10).take_all()}
    approx = lsh_knn(ray.data.from_arrow(t), q, k=10, n_planes=10, probe_hamming=2).take_all()
    got = {r["vec_id"] for r in approx}
    # clustered data + 2-bit multiprobe: near-neighbours share sign patterns
    assert len(got & exact) >= 7, (sorted(got), sorted(exact))


def test_knn_ties_deterministic_across_block_layouts(ray_session):
    # 30 identical vectors: top-10 must be the 10 LOWEST ids whatever the
    # block layout (argpartition would keep arbitrary tie members per batch)
    import ray.data

    from tangent_ray.ops.ann import knn_cosine

    vec = [1.0] * 8
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(30)[::-1].copy(), type=pa.int64()),
            "embedding": pa.array([vec] * 30, type=pa.list_(pa.float32())),
        }
    )
    q = np.array([vec], dtype=np.float64)
    one = ray.data.from_arrow(t)
    split = ray.data.from_arrow(t.slice(0, 11)).union(
        ray.data.from_arrow(t.slice(11, 9)), ray.data.from_arrow(t.slice(20))
    )
    ids_one = sorted(r["vec_id"] for r in knn_cosine(one, q, k=10).take_all())
    ids_split = sorted(r["vec_id"] for r in knn_cosine(split, q, k=10).take_all())
    assert ids_one == ids_split == list(range(10))


def test_to_matrix_rejects_null_and_ragged():
    import pytest

    from tangent_ray.ops.ann import _to_matrix

    with pytest.raises(ValueError, match="null"):
        _to_matrix(pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="ragged"):
        _to_matrix(pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64())))


def test_lsh_probe_radius_three_expands(ray_session):
    # radius must keep growing past 2 (the old code silently capped at 2)
    from tangent_ray.ops.ann import HyperplaneLSH, lsh_knn  # noqa: F401
    import tangent_ray.ops.ann as ann_mod

    # white-box: expansion loop honors probe_hamming by set size
    n_planes = 6
    probes = {0}
    for _ in range(3):
        for b in list(probes):
            for i in range(n_planes):
                probes.add(b ^ (1 << i))
    # radius-3 ball around 0 in 6-bit space: sum C(6,0..3) = 42
    assert len(probes) == 1 + 6 + 15 + 20


def test_ivf_index_full_probe_matches_brute(ray_session, tmp_path):
    """IVFReader with nprobe = nlist scores every vector — results must be
    identical (ids, scores, ranks) to the exact knn_cosine job."""
    import ray
    import ray.data

    from tangent_ray.ops.ann import IVFReader, build_ivf_index, knn_cosine

    t = _clustered(n=150)
    ds = ray.data.from_arrow(t).repartition(3)
    out = str(tmp_path / "ivf")
    build_ivf_index(ds, out, nlist=5, iters=1)
    reader = IVFReader(out)
    rng = np.random.default_rng(9)
    q = rng.standard_normal((4, 16))
    got = reader.search(q, k=7, nprobe=5)
    want = pa.concat_tables(
        [x for x in ray.get(
            knn_cosine(ds, q, k=7).to_arrow_refs()
        ) if x.num_rows]
    )
    gs = got.sort_by([("qid", "ascending"), ("rank", "ascending")])
    ws = want.select(["qid", "vec_id", "score", "rank"]).sort_by(
        [("qid", "ascending"), ("rank", "ascending")]
    )
    assert gs["qid"].to_pylist() == ws["qid"].to_pylist()
    assert gs["vec_id"].to_pylist() == ws["vec_id"].to_pylist()
    assert np.allclose(gs["score"].to_numpy(), ws["score"].to_numpy(),
                       atol=1e-12)
    assert gs["rank"].to_pylist() == ws["rank"].to_pylist()


def test_ivf_index_recall(ray_session, tmp_path):
    """nprobe < nlist keeps recall high on clustered data."""
    import ray
    import ray.data

    from tangent_ray.ops.ann import IVFReader, build_ivf_index, knn_cosine

    t = _clustered(n=200)
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "ivf")
    build_ivf_index(ds, out, nlist=4, iters=2)
    reader = IVFReader(out)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = m[[0, 1, 2, 3]] + 0.05  # near-cluster queries
    approx = reader.search(q, k=10, nprobe=2)
    exact = pa.concat_tables(
        [x for x in ray.get(
            knn_cosine(ds, q, k=10).to_arrow_refs()
        ) if x.num_rows]
    )

    def sets(tab):
        got = {}
        for qi, vi in zip(tab["qid"].to_pylist(), tab["vec_id"].to_pylist()):
            got.setdefault(qi, set()).add(vi)
        return got

    a, e = sets(approx), sets(exact)
    recall = np.mean([len(a.get(qi, set()) & e[qi]) / len(e[qi]) for qi in e])
    assert recall >= 0.9, recall


def test_ivf_recall_manifest_guardrail(ray_session, tmp_path):
    """build_ivf_index measures a recall@k curve per nprobe on a sampled
    query set and stores it in the manifest; IVFReader.min_nprobe picks
    the smallest measured nprobe meeting a target. Full probe is exact by
    construction (recall 1.0) and the curve is monotone nondecreasing."""
    import json
    import os

    import ray.data

    from tangent_ray.ops.ann import IVFReader, build_ivf_index

    t = _clustered(n=200)
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "ivf")
    m = build_ivf_index(ds, out, nlist=4, iters=2, recall_sample=16,
                        recall_k=5)
    assert m["recall_sample"] == 16 and m["recall_k"] == 5
    curve = m["recall_curve"]
    assert set(curve) == {"1", "2", "4"}
    vals = [curve[p] for p in ("1", "2", "4")]
    assert vals == sorted(vals)  # more probes never lose recall here
    assert curve["4"] == 1.0  # nprobe = nlist IS the ground truth
    # the manifest on disk carries the curve too
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["recall_curve"] == curve
    reader = IVFReader(out)
    assert reader.min_nprobe(1.0) <= 4
    assert reader.min_nprobe(0.0) == 1
    # sizing beats folklore: the picked nprobe meets the target on the
    # measured sample by construction
    p = reader.min_nprobe(0.9)
    assert curve[str(p)] >= 0.9
    # an index built without sampling falls back to probing everything
    out2 = str(tmp_path / "ivf2")
    build_ivf_index(ds, out2, nlist=4, iters=1, recall_sample=0)
    assert IVFReader(out2).min_nprobe(0.9) == 4
