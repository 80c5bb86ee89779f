"""Property-based codec invariants (hypothesis): varint and delta-gap
round-trips over adversarial value distributions, and the batched group
encoder's bit-identity with the row-at-a-time reference encoder for any
(term, salt) layout. Complements the example-based tests in
test_codec.py the way SURVEY.md §5 item 4 prescribes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prow_jobs_scraper_spark.index import codec

u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr), len(vals))
    assert out.tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.sets(i64, min_size=1, max_size=300))
def test_delta_roundtrip_any_id_spread(ids_set):
    ids = np.array(sorted(ids_set), dtype=np.int64)
    first, gaps = codec.delta_encode(ids)
    out = codec.delta_decode(first, gaps, ids.size)
    assert out.tolist() == ids.tolist()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),        # term_id
            st.sets(i64, min_size=1, max_size=40),         # doc ids
        ),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=7),                 # block_size
)
def test_group_encoder_matches_reference(groups, block_size):
    rng = np.random.default_rng(0)
    t_l, i_l, tf_l, dl_l = [], [], [], []
    for tid, ids in sorted(groups):
        ids = np.array(sorted(ids), dtype=np.int64)
        t_l.append(np.full(ids.size, tid, dtype=np.int64))
        i_l.append(ids)
        tf_l.append(rng.integers(1, 1 << 40, ids.size).astype(np.uint64))
        dl_l.append(rng.integers(1, 1 << 20, ids.size).astype(np.uint64))
    T_, I_ = np.concatenate(t_l), np.concatenate(i_l)
    TF, DL = np.concatenate(tf_l), np.concatenate(dl_l)

    g = codec.encode_group_blocks(
        T_, np.zeros(T_.size, dtype=np.int32), I_, TF, DL,
        avgdl=20.0, k1=1.2, b=0.75, block_size=block_size)
    go, gd = g["gaps"]
    to_, td = g["tf"]
    do_, dd = g["dl"]
    k = 0
    for tid in np.unique(T_):
        m = T_ == tid
        for r in codec.encode_blocks(I_[m], TF[m], DL[m], 1.0, 20.0,
                                     1.2, 0.75, block_size):
            assert g["term_id"][k] == tid
            assert g["block_id"][k] == r["block_id"]
            assert g["n_docs"][k] == r["n_docs"]
            assert g["first_doc_id"][k] == r["first_doc_id"]
            assert g["last_doc_id"][k] == r["last_doc_id"]
            assert bytes(gd[go[k]:go[k + 1]]) == r["doc_gaps"]
            assert bytes(td[to_[k]:to_[k + 1]]) == r["tf_bytes"]
            assert bytes(dd[do_[k]:do_[k + 1]]) == r["dl_bytes"]
            assert abs(g["block_max"][k] - r["block_max_score"]) < 1e-12
            assert g["sum_tf"][k] == r["sum_tf"]
            assert g["n_bytes"][k] == r["n_bytes"]
            # decode round-trip of the batched bytes
            ids_rt = codec.delta_decode(
                int(g["first_doc_id"][k]), bytes(gd[go[k]:go[k + 1]]),
                int(g["n_docs"][k]))
            assert ids_rt.tolist() == I_[m][
                r["block_id"] * block_size:
                r["block_id"] * block_size + int(r["n_docs"])].tolist()
            k += 1
    assert k == g["term_id"].size
