"""MurmurHash3 x86_32 — bit-parity with the reference's ``mmh3.hash``.

The reference derives its OpenSearch document ``_id``s as
``str(mmh3.hash("".join(strings)))`` (reference
src/prowjobsscraper/utils.py:24-27, used for step/usage ids at
src/prowjobsscraper/event.py:144,160). ``mmh3.hash`` is the standard
MurmurHash3 x86_32 (Austin Appleby, public domain), seed 0, returned as
a SIGNED 32-bit int. The engine's own keys stay xxhash64 (SURVEY §2.8 —
64-bit, Spark-native, JVM-side); this module exists purely so ids can be
emitted bit-identical to the reference's when migrating data between the
two systems.

Two forms:
- :func:`mmh3_x86_32` / :func:`generate_hash_from_strings` — scalar,
  pure Python, for client-side use and as the test oracle;
- :func:`mmh3_id_column` — a COLUMN form as a batch-vectorized pandas
  UDF: rows are packed into one padded uint8 matrix and the hash state
  advances word-position-by-word-position ACROSS all rows at once
  (numpy uint32 wraparound), so per-batch Python cost is O(max_words),
  not O(rows) — the same no-per-row-Python rule as every other UDF in
  this repo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def mmh3_x86_32(data: bytes | str, seed: int = 0) -> int:
    """Standard MurmurHash3 x86_32, signed 32-bit result (mmh3.hash
    semantics). Strings are hashed as their UTF-8 bytes."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    h = seed & _M32
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def generate_hash_from_strings(*strings: str) -> str:
    """Exact reference semantics (utils.py:24-27): concatenate, hash,
    stringify the signed int."""
    return str(mmh3_x86_32("".join(strings)))


def _rotl32_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mmh3_batch(encoded: pd.Series, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3 x86_32 over a Series of ``bytes`` rows.

    Rows are packed into one flat buffer; the 4-byte-word loop advances
    one WORD POSITION per iteration for every row simultaneously
    (masked on rows long enough), so Python-level iterations =
    max(words per row), independent of batch size. uint32 arithmetic
    wraps natively in numpy.
    """
    n_rows = len(encoded)
    lens = encoded.map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if n_rows == 0:
        return np.empty(0, dtype=np.int64)
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    maxlen = int(lens.max()) if n_rows else 0
    maxw = maxlen // 4 + 1  # +1 so the tail word always exists padded

    # padded[r, j] = byte j of row r (0 beyond the row's end)
    pos = np.arange(maxw * 4, dtype=np.int64)
    idx = offsets[:, None] + pos[None, :]
    in_row = pos[None, :] < lens[:, None]
    safe = np.minimum(idx, max(total - 1, 0))
    padded = np.where(in_row, flat[safe] if total else np.uint8(0),
                      np.uint8(0)).astype(np.uint32)
    words = (padded[:, 0::4] | (padded[:, 1::4] << np.uint32(8))
             | (padded[:, 2::4] << np.uint32(16))
             | (padded[:, 3::4] << np.uint32(24)))  # little-endian

    nblocks = lens // 4
    h = np.full(n_rows, seed, dtype=np.uint32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    for j in range(int(nblocks.max()) if n_rows else 0):
        active = nblocks > j
        if not active.any():
            break
        k = words[active, j] * c1
        k = _rotl32_vec(k, 15) * c2
        hj = h[active] ^ k
        hj = _rotl32_vec(hj, 13)
        h[active] = hj * np.uint32(5) + np.uint32(0xE6546B64)

    # tails (1-3 leftover bytes), vectorized by masking on tail length
    tail_len = (lens % 4).astype(np.int64)
    tw = words[np.arange(n_rows), nblocks]  # the padded word AT the tail
    k = np.zeros(n_rows, dtype=np.uint32)
    k = np.where(tail_len >= 3, k ^ (tw & np.uint32(0xFFFFFF)), k)
    k = np.where(tail_len == 2, k ^ (tw & np.uint32(0xFFFF)), k)
    k = np.where(tail_len == 1, k ^ (tw & np.uint32(0xFF)), k)
    has_tail = tail_len >= 1
    k = k * c1
    k = _rotl32_vec(k, 15) * c2
    h = np.where(has_tail, h ^ k, h)

    h ^= lens.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.view(np.int32).astype(np.int64)


def mmh3_id_column(*cols):
    """Column form of :func:`generate_hash_from_strings`: concatenate
    the given string columns (JVM-side concat), murmur3-x86-32 them in a
    batch-vectorized pandas UDF, return the signed value as a STRING —
    byte-identical to the reference's ``_id``s."""
    @F.pandas_udf(T.StringType())
    def mmh(joined: pd.Series) -> pd.Series:
        vals = _mmh3_batch(joined.fillna("").str.encode("utf-8"))
        return pd.Series(vals).astype(str)

    return mmh(F.concat_ws("", *[F.coalesce(c, F.lit("")) for c in cols]))
