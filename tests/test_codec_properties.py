"""Property-based codec tests (SURVEY.md §5.2-3).

Hypothesis generates adversarial posting shapes: the varbyte/delta round-trip
must be the identity on any strictly-increasing doc_id array, and every
block-max bound must dominate the true BM25 term contribution of every
posting in its block for arbitrary (k1, b, avgdl) — the exactness guarantee
that makes WAND/MaxScore pruning safe (Ding & Suel, SIGIR 2011).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from archivesspace_virgo_spark import codec

uint64s = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300
)

posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2**40),   # doc_id gap
        st.integers(min_value=1, max_value=10_000),  # tf
        st.integers(min_value=1, max_value=1_000_000),  # dl
    ),
    min_size=1,
    max_size=400,
)


@given(uint64s)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varbyte_decode(codec.varbyte_encode(arr))
    assert out.dtype == np.uint64
    np.testing.assert_array_equal(out, arr)


@given(posting_lists)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_strictly_increasing(rows):
    gaps = np.array([g for g, _, _ in rows], dtype=np.int64)
    ids = np.cumsum(gaps)  # strictly increasing by construction
    out = codec.delta_decode(codec.varbyte_decode(
        codec.varbyte_encode(codec.delta_encode(ids))
    ))
    np.testing.assert_array_equal(out, ids)


@given(posting_lists, st.integers(min_value=1, max_value=64))
@settings(max_examples=150, deadline=None)
def test_postings_roundtrip_and_blockmax_dominates(rows, block_size):
    gaps = np.array([g for g, _, _ in rows], dtype=np.int64)
    ids = np.cumsum(gaps)
    tfs = np.array([t for _, t, _ in rows], dtype=np.int64)
    dls = np.array([d for _, _, d in rows], dtype=np.int64)

    d_blob, t_blob, l_blob, b_last, b_maxtf, b_mindl = codec.encode_postings(
        ids, tfs, dls, block_size
    )
    rid, rtf, rdl = codec.decode_postings(d_blob, t_blob, l_blob)
    np.testing.assert_array_equal(rid, ids)
    np.testing.assert_array_equal(rtf, tfs)
    np.testing.assert_array_equal(rdl, dls)

    # block-max exactness: for ANY scoring parameters the stored
    # (max_tf, min_dl) pair yields an upper bound on tf/(tf + k1*norm(dl))
    # because the kernel is monotone increasing in tf, decreasing in dl
    for k1, b, avgdl in [(1.2, 0.75, 50.0), (0.5, 0.0, 1.0), (2.0, 1.0, 500.0)]:
        kernel = lambda tf, dl: tf / (tf + k1 * (1 - b + b * dl / avgdl))  # noqa: E731
        n_blocks = len(b_last)
        for blk in range(n_blocks):
            s, e = blk * block_size, min((blk + 1) * block_size, ids.size)
            bound = kernel(float(b_maxtf[blk]), float(b_mindl[blk]))
            actual = kernel(tfs[s:e].astype(float), dls[s:e].astype(float))
            assert (actual <= bound + 1e-12).all()
            assert ids[s:e].max() <= b_last[blk]
