import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tangent_ray.index.codec import (
    concat_runs,
    decode_block,
    decode_postings,
    decode_skips,
    encode_postings,
    merge_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**35, 2**63 - 1, 2**64 - 1],
                    dtype=np.uint64)
    enc = varint_encode(vals)
    dec = varint_decode(enc)
    assert (dec == vals).all()


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def _mk(n, seed=0, block_size=16):
    rng = np.random.RandomState(seed)
    docids = np.cumsum(rng.randint(1, 1000, size=n).astype(np.uint64))
    tfs = rng.randint(1, 50, size=n).astype(np.uint32)
    dls = rng.randint(1, 500, size=n).astype(np.uint32)
    pos = rng.randint(1, 100, size=n).astype(np.uint32)
    return docids, tfs, dls, pos


@pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 1000])
def test_postings_roundtrip(n):
    docids, tfs, dls, pos = _mk(n)
    post, skips = encode_postings(docids, tfs, dls, pos, block_size=16)
    d, t, l, p = decode_postings(post, skips)
    assert (d == docids).all() and (t == tfs).all() and (l == dls).all() and (p == pos).all()


def test_skip_metadata():
    docids, tfs, dls, pos = _mk(100)
    post, skips_b = encode_postings(docids, tfs, dls, pos, block_size=16)
    skips = decode_skips(skips_b)
    assert skips["n"].sum() == 100
    assert skips["last"][-1] == docids[-1]
    for bi in range(len(skips)):
        lo, hi = bi * 16, min(100, (bi + 1) * 16)
        assert skips["maxtf"][bi] == tfs[lo:hi].max()
        assert skips["mindl"][bi] == dls[lo:hi].min()
        d, t, l, p = decode_block(post, skips, bi)
        assert (d == docids[lo:hi]).all()
        assert (t == tfs[lo:hi]).all()


def test_concat_runs_disjoint():
    docids, tfs, dls, pos = _mk(200)
    full = encode_postings(docids, tfs, dls, pos, block_size=16)
    a = encode_postings(docids[:77], tfs[:77], dls[:77], pos[:77], block_size=16)
    b = encode_postings(docids[77:], tfs[77:], dls[77:], pos[77:], block_size=16)
    post, skips = concat_runs([a, b])
    d, t, l, p = decode_postings(post, skips)
    assert (d == docids).all() and (t == tfs).all() and (l == dls).all() and (p == pos).all()
    # and the fully-reencoded version decodes identically too
    d2 = decode_postings(*full)[0]
    assert (d2 == d).all()
    # every block must decode standalone to the right slice — the appended
    # run's first-delta rewrite changes the varint length here (abs docid
    # ~3 bytes vs gap delta ~2 bytes), which exercises the skip-offset shift
    # used by the block-max WAND path.
    sk = decode_skips(skips)
    lo = 0
    for bi in range(len(sk)):
        hi = lo + int(sk["n"][bi])
        bd, bt, bl, bp = decode_block(post, sk, bi)
        assert (bd == docids[lo:hi]).all(), f"block {bi} docids wrong"
        assert (bt == tfs[lo:hi]).all()
        assert (bl == dls[lo:hi]).all()
        assert (bp == pos[lo:hi]).all()
        lo = hi


def test_concat_runs_many_blocks_per_run():
    # three runs, each spanning several blocks, with varint-length-changing
    # first deltas; decode_block must stay aligned across all of them.
    docids, tfs, dls, pos = _mk(300, seed=3)
    cuts = [0, 90, 181, 300]
    runs = [
        encode_postings(docids[a:b], tfs[a:b], dls[a:b], pos[a:b], block_size=16)
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    post, skips = concat_runs(runs)
    sk = decode_skips(skips)
    lo = 0
    for bi in range(len(sk)):
        hi = lo + int(sk["n"][bi])
        bd = decode_block(post, sk, bi)[0]
        assert (bd == docids[lo:hi]).all(), f"block {bi} misaligned"
        lo = hi
    assert lo == 300


def test_merge_postings_interleaved():
    docids, tfs, dls, pos = _mk(300)
    sel = np.zeros(300, dtype=bool)
    sel[::3] = True
    runs = [
        encode_postings(docids[sel], tfs[sel], dls[sel], pos[sel], block_size=16),
        encode_postings(docids[~sel], tfs[~sel], dls[~sel], pos[~sel], block_size=16),
    ]
    post, skips = merge_postings(runs, block_size=16)
    d, t, l, p = decode_postings(post, skips)
    assert (d == docids).all() and (t == tfs).all() and (l == dls).all() and (p == pos).all()


def test_merge_postings_duplicate_raises():
    docids, tfs, dls, pos = _mk(10)
    run = encode_postings(docids, tfs, dls, pos, block_size=4)
    with pytest.raises(ValueError):
        merge_postings([run, run], block_size=4)


def test_encode_postings_multi_matches_single():
    from tangent_ray.index.codec import encode_postings_multi

    rng = np.random.default_rng(7)
    # runs of varied lengths incl. 1-entry and non-multiple-of-block
    lens = [1, 5, 16, 17, 100, 3, 128, 129]
    docs_all, tfs_all, dls_all, pos_all = [], [], [], []
    for L in lens:
        d = np.cumsum(rng.integers(1, 50, size=L)).astype(np.uint64)
        docs_all.append(d)
        tfs_all.append(rng.integers(1, 9, size=L).astype(np.uint32))
        dls_all.append(rng.integers(1, 500, size=L).astype(np.uint32))
        pos_all.append(rng.integers(1, 30, size=L).astype(np.uint32))
    docids = np.concatenate(docs_all)
    tfs = np.concatenate(tfs_all)
    dls = np.concatenate(dls_all)
    pos = np.concatenate(pos_all)
    ends = np.cumsum(lens)
    starts = ends - np.array(lens)
    posts, skips = encode_postings_multi(docids, tfs, dls, pos, starts, ends, block_size=16)
    for i, L in enumerate(lens):
        s, e = starts[i], ends[i]
        ref_p, ref_s = encode_postings(docids[s:e], tfs[s:e], dls[s:e], pos[s:e], block_size=16)
        assert posts[i] == ref_p, f"run {i} postings differ"
        assert skips[i] == ref_s, f"run {i} skips differ"


def test_concat_runs_rejects_docid_zero_overlap():
    """Docid 0 is reachable; two runs both containing it must raise through
    merge_postings' documented duplicate check, not silently concatenate."""
    import numpy as np
    import pytest

    from tangent_ray.index.codec import encode_postings, concat_runs, merge_postings

    one = lambda ids: encode_postings(
        np.array(ids, dtype=np.uint64),
        np.ones(len(ids), dtype=np.uint32),
        np.ones(len(ids), dtype=np.uint32),
        np.ones(len(ids), dtype=np.uint32),
    )
    r0 = one([0])
    r1 = one([0, 7])
    with pytest.raises(ValueError):
        concat_runs([r0, r1])
    with pytest.raises(ValueError, match="duplicate docid"):
        merge_postings([r0, r1])
    # non-overlapping after a docid-0 run still concatenates fine
    from tangent_ray.index.codec import decode_postings

    post, sk = concat_runs([one([0]), one([3, 7])])
    d, *_ = decode_postings(post, sk)
    assert d.tolist() == [0, 3, 7]
