"""Codec round-trip tests: property-shaped with fixed seeds (the style of
the reference's parametrized derived-field tests, SURVEY.md §5)."""

import numpy as np
import pytest

from prow_jobs_scraper_spark.index import codec


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 1000])
def test_varint_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    # mix magnitudes so 1..9-byte encodings are all exercised
    vals = (rng.integers(0, 1 << 62, size=n).astype(np.uint64)
            >> rng.integers(0, 60, size=n).astype(np.uint64))
    out = codec.varint_decode(codec.varint_encode(vals), n)
    assert np.array_equal(out, vals)


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, (1 << 35) - 1, (1 << 63) - 1,
         (1 << 64) - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


@pytest.mark.parametrize("seed", [3, 11])
def test_delta_roundtrip_including_negative_ids(seed):
    rng = np.random.default_rng(seed)
    # doc_ids are xxhash64 values: full signed int64 range
    ids = np.unique(rng.integers(-(1 << 62), 1 << 62, size=500, dtype=np.int64))
    first, gaps = codec.delta_encode(ids)
    out = codec.delta_decode(first, gaps, ids.size)
    assert np.array_equal(out, ids)


def test_delta_full_int64_span():
    # a single unsalted group spans the whole signed range (xxhash64 keys);
    # gaps larger than int64 max must round-trip (regression: signed diff
    # overflow)
    ids = np.array([-(1 << 63), -5, 0, 7, (1 << 63) - 1], dtype=np.int64)
    first, gaps = codec.delta_encode(ids)
    assert np.array_equal(codec.delta_decode(first, gaps, ids.size), ids)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 3], dtype=np.int64))


def test_encode_blocks_structure_and_roundtrip():
    rng = np.random.default_rng(42)
    ids = np.unique(rng.integers(-(1 << 40), 1 << 40, size=300, dtype=np.int64))
    n = ids.size
    tfs = rng.integers(1, 9, size=n).astype(np.uint64)
    dls = rng.integers(1, 60, size=n).astype(np.uint64)
    rows = list(codec.encode_blocks(ids, tfs, dls, idf=1.0, avgdl=20.0,
                                    k1=1.2, b=0.75, block_size=128))
    assert [r["n_docs"] for r in rows] == [128] * (n // 128) + (
        [n % 128] if n % 128 else [])
    got_ids, got_tfs, got_dls = [], [], []
    for r in rows:
        i, t, d = codec.decode_block(r)
        got_ids.append(i), got_tfs.append(t), got_dls.append(d)
        exp_max = codec.bm25_term_scores(t, d, 1.0, 20.0, 1.2, 0.75).max()
        assert r["block_max_score"] == pytest.approx(exp_max)
        assert r["first_doc_id"] == i[0] and r["last_doc_id"] == i[-1]
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    assert np.array_equal(np.concatenate(got_dls), dls)
