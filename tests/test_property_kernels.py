"""Hypothesis property tests over the pure (Spark-free) kernels — the
LuceneTestCase randomized-unit strategy applied to the codec and the
quantizers. These run in milliseconds per example, so the search space is
much wider than the fixture-based tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pysearch.codec import (
    CODEC_RAW,
    CODEC_VARINT,
    decode_blocks_batch,
    decode_positions,
    encode_posting_blocks,
    varint_decode,
    varint_encode,
)
from pysearch.ops.vector_index import (
    _dequantize,
    _onebit_codes,
    _quantize_rows,
)

import pandas as pd


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 62)), max_size=300)
)
@settings(max_examples=150, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr), arr.size) == arr).all()


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**12),  # doc id
        st.integers(min_value=1, max_value=5000),     # tf
        st.integers(min_value=1, max_value=100_000),  # dl
    ),
    min_size=1,
    max_size=200,
    unique_by=lambda t: t[0],
)


@given(posting_lists, st.integers(min_value=1, max_value=64), st.booleans())
@settings(max_examples=100, deadline=None)
def test_posting_block_roundtrip(postings, block_size, force_raw):
    ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    min_compress = (len(postings) + 1) if force_raw else 1
    blocks = encode_posting_blocks(ids, tfs, dls, block_size, min_compress)
    want_codec = CODEC_RAW if force_raw else CODEC_VARINT
    assert all(b[10] == want_codec for b in blocks)
    # block-max metadata is exact per block
    order = np.argsort(ids, kind="stable")
    s_ids, s_tfs, s_dls = ids[order], tfs[order], dls[order]
    for b in blocks:
        sl = slice(b[0] * block_size, b[0] * block_size + b[1])
        assert b[7] == s_tfs[sl].max() and b[8] == s_dls[sl].min()
        assert b[2] == s_ids[sl][0] and b[3] == s_ids[sl][-1]
    got_ids, got_tfs, got_dls = decode_blocks_batch(
        np.array([b[2] for b in blocks], dtype=np.int64),
        np.array([b[3] for b in blocks], dtype=np.int64),
        np.array([b[1] for b in blocks], dtype=np.int64),
        [b[4] for b in blocks],
        [b[5] for b in blocks],
        [b[6] for b in blocks],
        np.array([b[10] for b in blocks], dtype=np.int64),
    )
    assert (got_ids == s_ids).all()
    assert (got_tfs == s_tfs).all()
    assert (got_dls == s_dls).all()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # tf
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=80, deadline=None)
def test_positions_roundtrip(tf_rows, base):
    tfs = np.array([t[0] for t in tf_rows], dtype=np.int64)
    # ascending positions within each posting (the invariant the encoder
    # exploits: deltas reset at posting starts)
    pos = np.concatenate(
        [base + np.cumsum(np.arange(1, t + 1)) for t in tfs]
    ).astype(np.int64)
    from pysearch.codec import encode_positions

    buf = encode_positions(tfs, pos)
    assert (decode_positions(tfs, buf) == pos).all()


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=8,
        max_size=8,
    ),
    min_size=1,
    max_size=40,
)


@given(vectors)
@settings(max_examples=100, deadline=None)
def test_int8_quantization_error_bound(rows):
    X = np.array(rows, dtype=np.float64)
    codes, lo, step = _quantize_rows(X)
    pdf = pd.DataFrame({"qcode": codes, "qlo": lo, "qstep": step})
    approx = _dequantize(pdf)
    # reconstruction error is bounded by half a quantization step per dim
    assert (np.abs(approx - X) <= step[:, None] / 2 + 1e-9).all()


@given(vectors)
@settings(max_examples=100, deadline=None)
def test_onebit_codes_deterministic_and_faithful(rows):
    X = np.array(rows, dtype=np.float64)
    thr = X.mean(axis=0)
    codes = _onebit_codes(X, thr)
    assert codes == _onebit_codes(X, thr)  # deterministic
    # unpacking reproduces exactly the (x > thr) bit pattern
    bits = np.unpackbits(
        np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(len(rows), -1),
        axis=1,
    )[:, : X.shape[1]]
    assert (bits.astype(bool) == (X > thr[None, :])).all()
