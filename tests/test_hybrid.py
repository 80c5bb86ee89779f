"""Hybrid retrieval (BM25 + dense ANN, RRF fusion) tests.

rrf_fuse is hand-checked against the RRF formula on constructed lists;
hybrid_topk is checked end-to-end against a pandas reimplementation over
the driver's sf0.001 documents/embeddings tables (aligned id spaces).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from prow_jobs_scraper_spark.search.hybrid import hybrid_topk, rrf_fuse

SF_DIR = "/root/testdata/sf0.001"


def test_rrf_fuse_hand_check(spark):
    # list A ranks: x=1, y=2, z=3 ; list B ranks: y=1, w=2
    a = spark.createDataFrame(
        [(10, 3.0), (11, 2.0), (12, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(11, 0.9), (13, 0.8)], "doc_id long, cosine double")
    got = rrf_fuse([(a, "score"), (b, "cosine")], k=10).toPandas()
    want = {
        10: 1 / 61, 11: 1 / 62 + 1 / 61, 12: 1 / 63, 13: 1 / 62,
    }
    got_map = dict(zip(got["doc_id"], got["rrf_score"]))
    assert set(got_map) == set(want)
    for d, s in want.items():
        assert abs(got_map[d] - s) < 1e-12, d
    # doc 11 (in both lists) must fuse highest
    assert got.iloc[0]["doc_id"] == 11
    assert got.set_index("doc_id")["n_lists"].to_dict() == {
        10: 1, 11: 2, 12: 1, 13: 1}


def test_rrf_fuse_rank_ties_break_on_id(spark):
    # equal scores inside one list: rank order (and thus contribution)
    # must break on id ascending -> deterministic
    a = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (4, 1.0)], "doc_id long, score double")
    got = rrf_fuse([(a, "score")], k=3).toPandas()
    assert got["doc_id"].tolist() == [3, 4, 5]
    assert np.allclose(got["rrf_score"], [1 / 61, 1 / 62, 1 / 63])


def test_rrf_fuse_k_zero_empty(spark):
    a = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    assert rrf_fuse([(a, "score")], k=0).count() == 0


def _pandas_hybrid(docs: pd.DataFrame, emb: pd.DataFrame, terms: list[str],
                   qv: np.ndarray, k: int, k_each: int) -> pd.DataFrame:
    """Independent reimplementation: BM25(OR) + cosine lists -> RRF."""
    import math
    import re

    toks = [re.findall(r"[a-z0-9_]+", (t or "").lower())
            for t in docs["text"]]
    n = len(docs)
    avgdl = float(np.mean([len(x) for x in toks]))
    tf = {t: np.array([x.count(t) for x in toks], dtype=float) for t in terms}
    dfs = {t: int((tf[t] > 0).sum()) for t in terms}
    live = [t for t in terms if dfs[t] > 0]
    dl = np.array([len(x) for x in toks], dtype=float)
    denom = 1.2 * (0.25 + 0.75 * dl / avgdl)
    score = np.zeros(n)
    for t in live:
        idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        score += idf * tf[t] * 2.2 / (tf[t] + denom)
    hit = np.zeros(n, dtype=bool)
    for t in live:
        hit |= tf[t] > 0
    bm = pd.DataFrame({"doc_id": docs["doc_id"], "s": score})[hit]
    bm = bm.sort_values(["s", "doc_id"], ascending=[False, True]).head(k_each)
    bm["rank"] = np.arange(1, len(bm) + 1)

    m = np.stack([np.asarray(v, dtype=float) for v in emb["embedding"]])
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    sim = pd.DataFrame({"doc_id": emb["vec_id"], "s": cos})
    sim = sim.sort_values(["s", "doc_id"], ascending=[False, True]).head(k_each)
    sim["rank"] = np.arange(1, len(sim) + 1)

    u = pd.concat([bm[["doc_id", "rank"]], sim[["doc_id", "rank"]]])
    u["contrib"] = 1.0 / (60 + u["rank"])
    f = u.groupby("doc_id", as_index=False).agg(
        rrf_score=("contrib", "sum"), n_lists=("contrib", "size"))
    f = f.sort_values(["rrf_score", "doc_id"], ascending=[False, True])
    return f.head(k).reset_index(drop=True)


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def sf_emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_hybrid_topk_matches_pandas_reference(spark, sf_docs, sf_emb):
    qv = np.asarray(
        sf_emb.where("vec_id = 0").select("embedding").first()[0],
        dtype=float)
    got = hybrid_topk(sf_docs, sf_emb, "key agg", [float(x) for x in qv],
                      k=10, k_each=20).toPandas()
    want = _pandas_hybrid(sf_docs.toPandas(), sf_emb.toPandas(),
                          ["agg", "key"], qv, k=10, k_each=20)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["rrf_score"], want["rrf_score"],
                               rtol=1e-12)
    assert got["n_lists"].tolist() == want["n_lists"].tolist()


def test_hybrid_both_lists_boost(spark, sf_docs, sf_emb):
    qv = np.asarray(
        sf_emb.where("vec_id = 0").select("embedding").first()[0],
        dtype=float)
    got = hybrid_topk(sf_docs, sf_emb, "key agg", [float(x) for x in qv],
                      k=40, k_each=20).toPandas()
    # every fused doc appears in >=1 list; any doc in both lists must
    # outrank the best doc-in-one-list only when its contribution says so
    assert set(got["n_lists"]) <= {1, 2}
    assert (got["rrf_score"] > 0).all()
