"""Posting-list block codec: delta-gap + varint (LEB128 / PForDelta-style),
fully vectorized in numpy (no per-element Python loops — the input_hint
forbids per-row Python work).

This is the analog of the reference's vector-compression tier: PQ codebooks /
NVQ (JVectorIndexQuantization.java:45-140) compress vectors for traversal and
keep full-precision data for rerank; here varint blocks compress postings for
storage and carry per-block (max_tf, min_dl) upper-bound metadata so the
query path can skip whole blocks (block-max WAND) and recompute exact BM25
only for survivors — the same approximate-traversal / exact-rerank split as
JVectorReader.java:166-174,353-366.

Block layout (one row per block in the postings table):
    term        string   indexed term
    block_id    int      0..n_blocks-1 within (segment, term)
    n           int      postings in this block (<= block_size)
    first_id    long     local doc id of the first posting (delta base)
    last_id     long     local doc id of the last posting (for skip tests)
    ids         binary   varint deltas of ids[1:] minus previous id
    tfs         binary   varint term frequencies
    max_tf      int      max tf in block        } block-max metadata
    min_dl      int      min doc length in block } (upper-bounds BM25 tfnorm)
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7 bits-per-byte


# ---------------------------------------------------------------------------
# varint (LEB128) — vectorized
# ---------------------------------------------------------------------------

def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nbytes = np.ones(v.shape, dtype=np.int64)
    threshold = np.uint64(1 << 7)
    for _ in range(_MAX_VARINT_BYTES - 1):
        mask = v >= threshold
        if not mask.any():
            break
        nbytes += mask
        if threshold >= np.uint64(1 << 57):
            break
        threshold = np.uint64(int(threshold) << 7)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    seven = np.uint64(0x7F)
    for level in range(int(nbytes.max())):
        sel = nbytes > level
        chunk = (v[sel] >> np.uint64(7 * level)) & seven
        cont = (nbytes[sel] - 1 > level).astype(np.uint8) << 7
        out[starts[sel] + level] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode `n` LEB128 varints from `buf` into a uint64 array (vectorized)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    terminal = b < 128
    # value index for each byte = number of terminators strictly before it
    group = np.zeros(b.size, dtype=np.int64)
    np.cumsum(terminal[:-1], out=group[1:])
    ends = np.flatnonzero(terminal)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    values = np.zeros(n, dtype=np.uint64)
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    for level in range(int(pos.max()) + 1):
        m = pos == level
        # each group index appears at most once per level -> safe fancy |=
        values[group[m]] |= payload[m] << np.uint64(7 * level)
    return values


# ---------------------------------------------------------------------------
# posting blocks
# ---------------------------------------------------------------------------

CODEC_VARINT = 0  # delta-gap + LEB128 (the "quantized" tier)
CODEC_RAW = 1     # raw little-endian arrays (the "full precision" tier)


# ---------------------------------------------------------------------------
# positions (for phrase queries): per posting, the ascending token positions
# of the term in the doc, delta-encoded (first absolute) in one varint stream
# per block, posting-major. The posting's position count == its tf, so the
# stream needs no extra framing.
# ---------------------------------------------------------------------------

def encode_positions(tfs: np.ndarray, positions_concat: np.ndarray) -> bytes:
    """tfs: per-posting counts; positions_concat: all positions posting-major
    (len == tfs.sum()), ascending within each posting."""
    tfs = np.asarray(tfs, dtype=np.int64)
    pos = np.asarray(positions_concat, dtype=np.int64)
    if pos.size == 0:
        return b""
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    deltas = np.empty_like(pos)
    deltas[1:] = pos[1:] - pos[:-1]
    deltas[starts] = pos[starts]  # first of each posting absolute
    return varint_encode(deltas.astype(np.uint64))


def decode_positions(tfs: np.ndarray, buf: bytes) -> np.ndarray:
    """Inverse of encode_positions: returns the posting-major positions."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    full = varint_decode(buf, total).astype(np.int64)
    cs = np.cumsum(full)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    corr = (cs - full)[starts]  # prefix sum before each posting start
    return cs - np.repeat(corr, tfs)


def encode_posting_blocks(
    ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
    min_compress_postings: int = 1,
    positions_concat: np.ndarray | None = None,
):
    """Split a posting list into blocks (sorted by id here).

    Returns one tuple per block:
    (block_id, n, first_id, last_id, ids_bytes, tfs_bytes, dls_bytes,
     max_tf, min_dl, sum_tf, codec, poss_bytes).
    `positions_concat` (optional): posting-major token positions aligned
    with the INPUT order of (ids, tfs) — per-posting counts are the tfs.
    When given, each block carries its positions varint stream (phrase tier);
    otherwise poss_bytes is empty.
    Doc lengths are stored in-block (denormalized norms, the Lucene-norms
    analog) so the query path scores from postings alone.

    Compression-tier policy (the minimumBatchSizeForQuantization analog,
    JVectorWriter.java:263-283: tiny vector batches skip PQ): posting lists
    shorter than `min_compress_postings` are stored as raw int64/int32
    arrays (CODEC_RAW) — not worth the varint work; longer lists get
    delta-gap + varint blocks (CODEC_VARINT). Both carry identical block-max
    metadata, so the query path is codec-agnostic above the decoder.
    """
    order = np.argsort(ids, kind="stable")
    ids_in = np.asarray(ids, dtype=np.int64)
    tfs_in = np.asarray(tfs, dtype=np.int64)
    ids = ids_in[order]
    tfs = tfs_in[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    pos_per_posting: list | None = None
    if positions_concat is not None:
        pos_all = np.asarray(positions_concat, dtype=np.int64)
        in_starts = np.concatenate(([0], np.cumsum(tfs_in)[:-1]))
        pos_per_posting = [
            pos_all[in_starts[j]: in_starts[j] + tfs_in[j]] for j in order
        ]
    n = ids.size
    codec = CODEC_RAW if n < min_compress_postings else CODEC_VARINT
    out = []
    for b0 in range(0, n, block_size):
        sl = slice(b0, min(b0 + block_size, n))
        bids, btfs, bdls = ids[sl], tfs[sl], dls[sl]
        if pos_per_posting is not None:
            bpos = (
                np.concatenate(pos_per_posting[sl])
                if btfs.sum()
                else np.empty(0, dtype=np.int64)
            )
            poss_b = encode_positions(btfs, bpos)
        else:
            poss_b = b""
        if codec == CODEC_VARINT:
            deltas = np.diff(bids).astype(np.uint64)  # strictly increasing
            enc = (
                varint_encode(deltas),
                varint_encode(btfs.astype(np.uint64)),
                varint_encode(bdls.astype(np.uint64)),
            )
        else:
            enc = (
                bids[1:].astype("<i8").tobytes(),
                btfs.astype("<i4").tobytes(),
                bdls.astype("<i4").tobytes(),
            )
        out.append(
            (
                b0 // block_size,
                int(bids.size),
                int(bids[0]),
                int(bids[-1]),
                enc[0],
                enc[1],
                enc[2],
                int(btfs.max()),
                int(bdls.min()),
                int(btfs.sum()),
                codec,
                poss_b,
            )
        )
    return out



def decode_block_ids(first_id: int, n: int, ids_buf: bytes, codec: int = CODEC_VARINT) -> np.ndarray:
    """Inverse of the id half of `encode_posting_blocks` for one block."""
    ids = np.empty(n, dtype=np.int64)
    ids[0] = first_id
    if n > 1:
        if codec == CODEC_VARINT:
            deltas = varint_decode(ids_buf, n - 1).astype(np.int64)
            np.cumsum(deltas, out=ids[1:])
            ids[1:] += first_id
        else:
            ids[1:] = np.frombuffer(ids_buf, dtype="<i8")
    return ids


def decode_block_tfs(n: int, tfs_buf: bytes, codec: int = CODEC_VARINT) -> np.ndarray:
    if codec == CODEC_VARINT:
        return varint_decode(tfs_buf, n).astype(np.int64)
    return np.frombuffer(tfs_buf, dtype="<i4").astype(np.int64)


def decode_block_dls(n: int, dls_buf: bytes, codec: int = CODEC_VARINT) -> np.ndarray:
    if codec == CODEC_VARINT:
        return varint_decode(dls_buf, n).astype(np.int64)
    return np.frombuffer(dls_buf, dtype="<i4").astype(np.int64)


def decode_blocks_batch(first_ids, last_ids, ns, ids_bufs, tfs_bufs, dls_bufs, codecs=None):
    """Decode MANY blocks of one term in a single vectorized pass.

    Blocks must be in ascending id order (their id ranges are disjoint by
    construction); codecs may be mixed (merged segments can carry both
    tiers). Returns (ids, tfs, dls) int64 arrays of total length sum(ns).
    Per codec tier the decode is fully batched: for varint blocks the id
    reconstruction uses one global cumsum — the delta at each block start is
    ``first_id[j] - last_id[j-1]`` of the previous block in the SAME tier
    (> 0 because block ranges ascend) — no per-block Python loop.
    """
    first_ids = np.asarray(first_ids, dtype=np.int64)
    last_ids = np.asarray(last_ids, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    nblocks = ns.size
    if codecs is None:
        codecs = np.zeros(nblocks, dtype=np.int64)
    else:
        codecs = np.asarray(codecs, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))

    ids = np.empty(total, dtype=np.int64)
    tfs = np.empty(total, dtype=np.int64)
    dls = np.empty(total, dtype=np.int64)

    def positions(sel: np.ndarray) -> np.ndarray:
        """Flat output positions covered by the selected blocks, in order."""
        reps = ns[sel]
        offs = np.repeat(starts[sel], reps)
        intra = np.arange(int(reps.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        return offs + intra

    for codec in np.unique(codecs):
        sel = codecs == codec
        f, l, nn = first_ids[sel], last_ids[sel], ns[sel]
        sub_total = int(nn.sum())
        sub_starts = np.concatenate(([0], np.cumsum(nn)[:-1]))
        ib = [b for b, s in zip(ids_bufs, sel) if s]
        tb = [b for b, s in zip(tfs_bufs, sel) if s]
        db = [b for b, s in zip(dls_bufs, sel) if s]
        if codec == CODEC_VARINT:
            deltas = varint_decode(b"".join(ib), int((nn - 1).sum()))
            delta_full = np.empty(sub_total, dtype=np.int64)
            mask = np.ones(sub_total, dtype=bool)
            mask[sub_starts] = False
            delta_full[mask] = deltas.astype(np.int64)
            delta_full[sub_starts[0]] = f[0]
            delta_full[sub_starts[1:]] = f[1:] - l[:-1]
            sub_ids = np.cumsum(delta_full)
            sub_tfs = varint_decode(b"".join(tb), sub_total).astype(np.int64)
            sub_dls = varint_decode(b"".join(db), sub_total).astype(np.int64)
        else:
            sub_ids = np.empty(sub_total, dtype=np.int64)
            rest = np.frombuffer(b"".join(ib), dtype="<i8")
            mask = np.ones(sub_total, dtype=bool)
            mask[sub_starts] = False
            sub_ids[mask] = rest
            sub_ids[sub_starts] = f
            sub_tfs = np.frombuffer(b"".join(tb), dtype="<i4").astype(np.int64)
            sub_dls = np.frombuffer(b"".join(db), dtype="<i4").astype(np.int64)
        if sel.all():
            ids[:], tfs[:], dls[:] = sub_ids, sub_tfs, sub_dls
        else:
            pos = positions(sel)
            ids[pos] = sub_ids
            tfs[pos] = sub_tfs
            dls[pos] = sub_dls
    return ids, tfs, dls
