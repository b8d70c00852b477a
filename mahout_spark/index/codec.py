"""Posting-block codec: delta-gap + LEB128 varint, fully numpy-vectorized.

The north-star index format (BASELINE.json): per (term, shard) the postings
are sorted by doc_id, cut into fixed-size blocks, and each block stores

    doc_ids  -> delta-gaps (first value absolute), varint bytes
    tfs      -> varint bytes
    doclens  -> varint bytes   (exact BM25 needs the true doc length;
                                storing it beside the posting avoids a
                                doc_id join at query time)

plus per-block metadata (count, first_docid, block_max_docid,
block_max_score) that enables block skipping — the scaled-up descendant of
the reference's low-score vector pruning
(MahoutTermFinderMwkSnptRefactoredCluster.java:709-733).

Both encode and decode are vectorized end-to-end (no per-value Python):
encode computes per-value byte counts with shift loops over the whole array,
then scatters payload bits with repeat/arange index math; decode segments
the byte stream on continuation bits and reassembles with add.reduceat.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array; returns (buffer, byte_offsets[n+1]) where
    value i occupies buffer[offsets[i]:offsets[i+1]]. The offsets make the
    single vectorized pass sliceable into arbitrary sub-ranges — the
    whole-batch encoder (index/build.py) encodes millions of values once
    and slices per block, instead of one numpy call per tiny block."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes needed per value: 1 + floor(bits/7)
    nbytes = np.ones(n, dtype=np.int64)
    rest = vals >> _SEVEN
    while rest.any():
        nbytes += (rest > 0)
        rest >>= _SEVEN
    total = int(nbytes.sum())
    starts = np.cumsum(nbytes) - nbytes
    owner = np.repeat(np.arange(n), nbytes)
    idx_within = (np.arange(total) - np.repeat(starts, nbytes)).astype(np.uint64)
    payload = (vals[owner] >> (idx_within * _SEVEN)) & _MASK7
    cont = idx_within < (nbytes[owner] - 1).astype(np.uint64)
    out = (payload | (cont.astype(np.uint64) << _SEVEN)).astype(np.uint8)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[:-1] = starts
    offsets[-1] = total
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (any integer dtype)."""
    buf, _ = varint_encode_offsets(values)
    return buf


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    lengths = np.diff(ends, prepend=-1)
    starts = ends - lengths + 1
    idx_within = (np.arange(len(b)) - np.repeat(starts, lengths)).astype(np.uint64)
    contrib = (b.astype(np.uint64) & _MASK7) << (idx_within * _SEVEN)
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first absolute)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    out = v.copy()
    out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_doc_block(doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray):
    """One block (doc_ids sorted ascending) -> (bytes, bytes, bytes)."""
    return (
        varint_encode(delta_encode(doc_ids)),
        varint_encode(tfs),
        varint_encode(doclens),
    )


def decode_doc_block(doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes):
    """-> (doc_ids uint64, tfs uint64, doclens uint64)."""
    return (
        delta_decode(varint_decode(doc_bytes)),
        varint_decode(tf_bytes),
        varint_decode(dl_bytes),
    )


def segmented_delta_decode(gaps: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Vectorized inverse of per-segment delta encoding: ``gaps`` holds the
    concatenation of many delta streams, each segment's FIRST value absolute
    (the encoder resets the delta at every segment start). One global
    cumsum + a per-segment correction restores all segments at once — no
    per-segment Python loop, which matters because positional postings have
    one segment per posting (millions per shard)."""
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    if len(g) == 0:
        return g
    total = np.cumsum(g, dtype=np.uint64)
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    # correction[i] = total just BEFORE element i's segment began
    corr_vals = np.where(
        seg_starts > 0, total[np.maximum(seg_starts - 1, 0)], np.uint64(0)
    ).astype(np.uint64)
    seg_lens = np.diff(np.concatenate([seg_starts, [len(g)]]))
    return total - np.repeat(corr_vals, seg_lens)


def decode_positions_block(pos_counts_bytes: bytes, positions_bytes: bytes):
    """Positional payload of one block -> (counts uint64, flat absolute
    positions uint64). ``counts[i]`` positions belong to posting i (counts
    are stored explicitly rather than assumed == tf so synthetic positionless
    terms — e.g. ``lang:<x>`` tags, tf=1 / 0 positions — round-trip)."""
    counts = varint_decode(pos_counts_bytes)
    gaps = varint_decode(positions_bytes)
    starts = (np.cumsum(counts) - counts).astype(np.int64)
    return counts, segmented_delta_decode(gaps, starts)
