"""Posting codec unit tests — the JVectorRandomAccessReaderTests /
GraphNodeIdToDocMapTests analog: exact round-trips under randomized input."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pysearch.codec import (
    decode_block_dls,
    decode_block_ids,
    decode_block_tfs,
    decode_blocks_batch,
    encode_posting_blocks,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), len(values)).tolist() == values


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63 - 1], dtype=np.uint64
    )
    out = varint_decode(varint_encode(vals), vals.size)
    assert out.tolist() == vals.tolist()


@pytest.mark.parametrize("n,block_size", [(1, 128), (127, 128), (128, 128), (1000, 128), (1000, 7)])
def test_block_roundtrip(n, block_size):
    rng = np.random.default_rng(42)
    ids = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(20, 2000, n).astype(np.int64)
    blocks = encode_posting_blocks(ids, tfs, dls, block_size)
    got_ids, got_tfs, got_dls = [], [], []
    for blk in blocks:
        block_id, bn, first, last, ib, tb, db, max_tf, min_dl, sum_tf, codec, poss = blk
        bids = decode_block_ids(first, bn, ib, codec)
        assert bids[0] == first and bids[-1] == last
        btfs = decode_block_tfs(bn, tb, codec)
        bdls = decode_block_dls(bn, db, codec)
        assert max_tf == btfs.max() and min_dl == bdls.min() and sum_tf == btfs.sum()
        got_ids += bids.tolist()
        got_tfs += btfs.tolist()
        got_dls += bdls.tolist()
    assert got_ids == ids.tolist()
    assert got_tfs == tfs.tolist()
    assert got_dls == dls.tolist()


def test_batch_decode_matches_per_block():
    rng = np.random.default_rng(7)
    n = 999
    ids = np.sort(rng.choice(100000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    dls = rng.integers(20, 500, n).astype(np.int64)
    blocks = encode_posting_blocks(ids, tfs, dls, 64)
    # decode a strided subset in one batched call
    sub = blocks[::3]
    g_ids, g_tfs, g_dls = decode_blocks_batch(
        [b[2] for b in sub],
        [b[3] for b in sub],
        [b[1] for b in sub],
        [b[4] for b in sub],
        [b[5] for b in sub],
        [b[6] for b in sub],
        [b[10] for b in sub],
    )
    exp_ids = np.concatenate([decode_block_ids(b[2], b[1], b[4], b[10]) for b in sub])
    exp_tfs = np.concatenate([decode_block_tfs(b[1], b[5], b[10]) for b in sub])
    exp_dls = np.concatenate([decode_block_dls(b[1], b[6], b[10]) for b in sub])
    assert (g_ids == exp_ids).all() and (g_tfs == exp_tfs).all() and (g_dls == exp_dls).all()


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"", 0).size == 0


def test_codec_tiers_mixed_batch_decode():
    """Raw tier for short lists (the quantization-threshold analog) and
    mixed-tier batched decode (merged segments can interleave tiers)."""
    from pysearch.codec import CODEC_RAW, CODEC_VARINT

    rng = np.random.default_rng(3)
    short = encode_posting_blocks(
        np.array([5, 9, 12]), np.array([1, 2, 3]), np.array([10, 20, 30]),
        block_size=128, min_compress_postings=8,
    )
    assert all(b[10] == CODEC_RAW for b in short)
    n = 500
    ids = np.sort(rng.choice(100000, size=n, replace=False)).astype(np.int64)
    longb = encode_posting_blocks(
        ids, rng.integers(1, 9, n), rng.integers(20, 99, n),
        block_size=64, min_compress_postings=8,
    )
    assert all(b[10] == CODEC_VARINT for b in longb)
    # interleave: raw blocks first (ids 5..12 < long ids? ensure ordering)
    mixed = short + longb if short[0][2] < longb[0][2] else longb + short
    g_ids, g_tfs, g_dls = decode_blocks_batch(
        [b[2] for b in mixed], [b[3] for b in mixed], [b[1] for b in mixed],
        [b[4] for b in mixed], [b[5] for b in mixed], [b[6] for b in mixed],
        [b[10] for b in mixed],
    )
    exp_ids = np.concatenate([decode_block_ids(b[2], b[1], b[4], b[10]) for b in mixed])
    exp_tfs = np.concatenate([decode_block_tfs(b[1], b[5], b[10]) for b in mixed])
    exp_dls = np.concatenate([decode_block_dls(b[1], b[6], b[10]) for b in mixed])
    assert (g_ids == exp_ids).all() and (g_tfs == exp_tfs).all() and (g_dls == exp_dls).all()


def test_positions_roundtrip():
    from pysearch.codec import decode_positions, encode_positions

    rng = np.random.default_rng(5)
    n = 400
    ids = np.sort(rng.choice(8000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 6, n).astype(np.int64)
    dls = rng.integers(20, 99, n).astype(np.int64)
    # ascending positions per posting
    pos = np.concatenate([np.sort(rng.choice(2000, size=t, replace=False)) for t in tfs])
    blocks = encode_posting_blocks(ids, tfs, dls, 64, positions_concat=pos)
    got = []
    off = 0
    for b in blocks:
        btfs = decode_block_tfs(b[1], b[5], b[10])
        got.append(decode_positions(btfs, b[11]))
    got = np.concatenate(got)
    assert (got == pos).all()
    # stitched multi-block decode: concatenated streams + concatenated tfs
    all_tfs = np.concatenate([decode_block_tfs(b[1], b[5], b[10]) for b in blocks])
    stitched = decode_positions(all_tfs, b"".join(b[11] for b in blocks))
    assert (stitched == pos).all()


def test_positions_roundtrip_unsorted_input():
    """encode_posting_blocks sorts by id internally; positions must follow."""
    from pysearch.codec import decode_positions

    ids = np.array([30, 10, 20])
    tfs = np.array([2, 1, 3])
    dls = np.array([50, 60, 70])
    pos = np.array([5, 9,  2,  1, 4, 8])  # posting-major for input order
    blocks = encode_posting_blocks(ids, tfs, dls, 128, positions_concat=pos)
    (b,) = blocks
    btfs = decode_block_tfs(b[1], b[5], b[10])
    bids = decode_block_ids(b[2], b[1], b[4], b[10])
    got = decode_positions(btfs, b[11])
    assert bids.tolist() == [10, 20, 30] and btfs.tolist() == [1, 3, 2]
    assert got.tolist() == [2, 1, 4, 8, 5, 9]
