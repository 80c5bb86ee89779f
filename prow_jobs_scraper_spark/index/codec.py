"""Posting-block codec: delta-gap + varint (PForDelta-style), numpy-vectorized.

The reference's index compression lives inside Lucene (FOR/PForDelta posting
blocks, invisible to its app code — SURVEY.md §4 "Compression"). This module
is our explicit, from-scratch equivalent: posting lists are cut into
``BLOCK_SIZE``-doc blocks; doc_ids are strictly increasing within a block and
stored as varint-encoded deltas from the block's first doc_id; term
frequencies and doc lengths are varint-encoded as-is. Everything is
numpy-vectorized — no per-row Python (BASELINE.json ``input_hint``).

Varint = LEB128: 7 payload bits per byte, high bit set on continuation
bytes. Encode/decode work on whole uint64 arrays:

- encode: per-value byte counts via threshold comparisons, exclusive-scan
  offsets, one flat byte write with shift/mask arithmetic.
- decode: terminator mask -> group ids via cumsum, per-byte contribution
  ``(b & 0x7f) << (7 * intra_index)`` accumulated with ``np.add.at``.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

# Thresholds where a uint64 needs one more varint byte: 2**7, 2**14, ... 2**63.
_VARINT_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def varint_sizes(v: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte counts for a uint64 array."""
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _VARINT_THRESHOLDS:
        more = v >= t
        if not more.any():
            break
        nbytes += more
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array into bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_sizes(v)
    total = int(nbytes.sum())
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # global byte position -> owning value index and intra-value byte index
    owner = np.repeat(np.arange(v.size, dtype=np.int64), nbytes)
    intra = np.arange(total, dtype=np.int64) - starts[owner]
    shifted = v[owner] >> (7 * intra).astype(np.uint64)
    payload = (shifted & np.uint64(0x7F)).astype(np.uint8)
    cont = (intra < (nbytes[owner] - 1)).astype(np.uint8) << 7
    return (payload | cont).tobytes()


def varint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end)[:-1]
    n_groups = int(is_end.sum())
    starts = np.zeros(n_groups, dtype=np.int64)
    # start of group g = 1 + end position of group g-1
    end_pos = np.flatnonzero(is_end)
    starts[1:] = end_pos[:-1] + 1
    intra = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * intra).astype(np.uint64)
    out = np.zeros(n_groups, dtype=np.uint64)
    np.add.at(out, group, contrib)
    if count is not None and n_groups != count:
        raise ValueError(f"varint stream held {n_groups} values, expected {count}")
    return out


def delta_encode(doc_ids: np.ndarray) -> tuple[int, bytes]:
    """Encode strictly-increasing int64 doc_ids as (first_id, varint gaps).

    Gaps are ``diff(doc_ids)`` (>=1 for strictly increasing input); the
    first element is returned out-of-band so gap values stay small.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return 0, b""
    gaps = np.empty(0, dtype=np.uint64)
    if ids.size > 1:
        if (ids[1:] <= ids[:-1]).any():
            raise ValueError("doc_ids must be strictly increasing within a block")
        # gap arithmetic in uint64: doc_ids span the full signed range
        # (xxhash64 keys), so a signed diff can overflow; two's-complement
        # wraparound of the unsigned subtraction is exact for sorted input.
        u = ids.view(np.uint64)
        gaps = u[1:] - u[:-1]
    return int(ids[0]), varint_encode(gaps)


def delta_decode(first_id: int, gap_bytes: bytes, count: int) -> np.ndarray:
    """Inverse of :func:`delta_encode` -> int64 doc_id array of ``count``."""
    if count == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(count, dtype=np.uint64)
    out[0] = np.int64(first_id).view(np.uint64)  # wraparound-safe
    if count > 1:
        gaps = varint_decode(gap_bytes, count - 1)
        out[1:] = out[0] + np.cumsum(gaps, dtype=np.uint64)
    return out.view(np.int64)


def bm25_term_scores(
    tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Textbook BM25 per-posting partial score (float64, vectorized).

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); Lucene's
    published defaults k1=1.2, b=0.75 are applied by callers. We score in
    float64 everywhere (engine, oracle) so ranks are reproducible.
    """
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int = BLOCK_SIZE,
):
    """Cut one term's postings (sorted by doc_id) into compressed blocks.

    Yields dict rows ready for the ``postings`` table:
    ``block_id, n_docs, first_doc_id, last_doc_id, doc_gaps, tf_bytes,
    dl_bytes, block_max_score``. ``block_max_score`` is the exact max BM25
    partial score inside the block (dl known at encode time), used for
    block-max pruning at query time.
    """
    n = doc_ids.size
    for blk, start in enumerate(range(0, n, block_size)):
        end = min(start + block_size, n)
        ids = doc_ids[start:end]
        tf = tfs[start:end]
        dl = dls[start:end]
        first, gap_bytes = delta_encode(ids)
        scores = bm25_term_scores(tf, dl, idf, avgdl, k1, b)
        tf_bytes = varint_encode(tf.astype(np.uint64))
        dl_bytes = varint_encode(dl.astype(np.uint64))
        yield {
            "block_id": blk,
            "n_docs": int(end - start),
            "first_doc_id": first,
            "last_doc_id": int(ids[-1]),
            "doc_gaps": gap_bytes,
            "tf_bytes": tf_bytes,
            "dl_bytes": dl_bytes,
            "block_max_score": float(scores.max()),
            # block-level rollups so term_stats/metrics never re-read the
            # binary payloads (df = Σ n_docs, cf = Σ sum_tf over blocks)
            "sum_tf": int(tf.sum()),
            "n_bytes": len(gap_bytes) + len(tf_bytes) + len(dl_bytes),
        }


def encode_group_blocks(
    term_ids: np.ndarray,
    salts: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode ALL (term, salt) posting groups of one partition at once.

    Input: postings sorted by (term_id, doc_id) — salts are doc-range
    prefixes of doc_id, so they are automatically contiguous and ascending
    within each term. Output: column arrays for every block of every
    (term, salt) group, with the three varint streams returned as (int32
    offsets, flat bytes) pairs ready for zero-copy Arrow binary arrays.

    No per-block Python: the per-block cost of the row-at-a-time path
    (~120 µs/block, dominating the whole index build on Zipfian
    vocabularies where most blocks hold <10 postings) collapses into a
    handful of whole-array numpy passes. Semantics identical to
    :func:`encode_blocks` per (term, salt) (tested equal).
    """
    m = doc_ids.size
    out: dict = {}
    if m == 0:
        z32 = np.empty(0, dtype=np.int32)
        z64 = np.empty(0, dtype=np.int64)
        empty_off = np.zeros(1, dtype=np.int32)
        for k in ("gaps", "tf", "dl"):
            out[k] = (empty_off, b"")
        out.update(term_id=z64, salt=z32, block_id=z32, n_docs=z32,
                   first_doc_id=z64, last_doc_id=z64,
                   block_max=np.empty(0), sum_tf=z64, n_bytes=z32)
        return out

    t_ids = np.ascontiguousarray(term_ids, dtype=np.int64)
    slt = np.ascontiguousarray(salts, dtype=np.int32)
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.uint64)
    dl = np.ascontiguousarray(dls, dtype=np.uint64)

    # (term, salt) group bounds -> within-group position -> block index
    grp_change = np.concatenate(
        ([True], (t_ids[1:] != t_ids[:-1]) | (slt[1:] != slt[:-1])))
    grp_starts = np.flatnonzero(grp_change)
    grp_start_rep = np.repeat(grp_starts, np.diff(
        np.concatenate((grp_starts, [m]))))
    pos_in_grp = np.arange(m, dtype=np.int64) - grp_start_rep
    blk_of_post = pos_in_grp // block_size
    blk_change = np.concatenate(
        ([True], grp_change[1:] | (blk_of_post[1:] != blk_of_post[:-1])))
    bs = np.flatnonzero(blk_change)          # block start positions
    be = np.concatenate((bs[1:], [m]))       # block end positions
    nb = bs.size

    out["term_id"] = t_ids[bs]
    out["salt"] = slt[bs]
    out["block_id"] = blk_of_post[bs].astype(np.int32)
    out["n_docs"] = (be - bs).astype(np.int32)
    out["first_doc_id"] = ids[bs]
    out["last_doc_id"] = ids[be - 1]

    # ---- gaps: uint64 wraparound diffs, dropping each block's first pos
    u = ids.view(np.uint64)
    d = np.empty(m, dtype=np.uint64)
    d[0] = 0
    d[1:] = u[1:] - u[:-1]
    keep = ~blk_change
    gaps = d[keep]
    if gaps.size and (gaps == 0).any():
        raise ValueError("doc_ids must be strictly increasing within a block")
    g_sizes = varint_sizes(gaps) if gaps.size else np.empty(0, dtype=np.int64)
    g_cum = np.concatenate(([0], np.cumsum(g_sizes)))
    if g_cum[-1] >= 2**31:  # int32 offsets below would silently wrap
        raise ValueError(
            f"encode group varint stream {g_cum[-1]} B exceeds int32 "
            "offsets — raise n_buckets/n_ranges so (tb, salt) groups shrink")
    # kept-index of block b's first gap = bs[b] - b  (one drop per block)
    g_offsets = np.concatenate(
        (g_cum[bs - np.arange(nb)], [g_cum[-1]])).astype(np.int32)
    out["gaps"] = (g_offsets, varint_encode(gaps))

    # ---- tf / dl: all positions kept, offsets at block bounds
    def stream(vals: np.ndarray) -> tuple[np.ndarray, bytes]:
        sizes = varint_sizes(vals)
        cum = np.concatenate(([0], np.cumsum(sizes)))
        if cum[-1] >= 2**31:
            raise ValueError(
                f"encode group varint stream {cum[-1]} B exceeds int32 "
                "offsets — raise n_buckets/n_ranges so groups shrink")
        offsets = np.concatenate((cum[bs], [cum[-1]])).astype(np.int32)
        return offsets, varint_encode(vals)

    out["tf"] = stream(tf)
    out["dl"] = stream(dl)

    scores = bm25_term_scores(tf, dl, 1.0, avgdl, k1, b)
    out["block_max"] = np.maximum.reduceat(scores, bs)
    out["sum_tf"] = np.add.reduceat(tf.astype(np.int64), bs)
    out["n_bytes"] = (
        np.diff(out["gaps"][0]) + np.diff(out["tf"][0]) + np.diff(out["dl"][0])
    ).astype(np.int32)
    return out


def decode_blocks_bulk(
    n_docs: np.ndarray,
    first_ids: np.ndarray,
    gap_bytes: list[bytes],
    tf_bytes: list[bytes],
    dl_bytes: list[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting blocks in three vectorized passes.

    Per-block decode (one varint_decode call per stream per block) costs
    ~ms-scale Python overhead per block and dominated single-hot-term
    query latency (measured 17 s for a 2000-block term). Here the byte
    streams are joined and decoded once each; doc_ids are rebuilt with a
    segmented cumsum (cumsum of [first_id, gaps...] per block, offset
    subtracted at block starts). Blocks must be passed in doc-id order
    per term for the output to be posting order.

    Returns (doc_ids int64, tfs uint64, dls uint64) concatenated across
    blocks.
    """
    nd = np.ascontiguousarray(n_docs, dtype=np.int64)
    m = int(nd.sum())
    if m == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.uint64))
    first_u = np.ascontiguousarray(first_ids, dtype=np.int64).view(np.uint64)
    starts = np.concatenate(([0], np.cumsum(nd)[:-1]))

    gaps_flat = varint_decode(b"".join(gap_bytes), int((nd - 1).sum()))
    tfs = varint_decode(b"".join(tf_bytes), m)
    dls = varint_decode(b"".join(dl_bytes), m)

    vals = np.empty(m, dtype=np.uint64)
    is_start = np.zeros(m, dtype=bool)
    is_start[starts] = True
    vals[is_start] = first_u
    vals[~is_start] = gaps_flat
    cs = np.cumsum(vals, dtype=np.uint64)
    prev_total = cs[starts] - first_u  # running sum before each block
    ids_u = cs - np.repeat(prev_total, nd)
    return ids_u.view(np.int64), tfs, dls


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one postings-table row -> (doc_ids int64, tfs u64, dls u64)."""
    n = int(row["n_docs"])
    ids = delta_decode(int(row["first_doc_id"]), row["doc_gaps"], n)
    tfs = varint_decode(row["tf_bytes"], n)
    dls = varint_decode(row["dl_bytes"], n)
    return ids, tfs, dls
