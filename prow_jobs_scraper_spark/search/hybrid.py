"""Hybrid retrieval: lexical BM25 + dense-vector ANN fused with
Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Büttcher, SIGIR 2009):
``score(d) = Σ_lists 1 / (c + rank_d)`` over the lists that contain d,
with the standard c = 60. This is the fusion modern hybrid LLM-retrieval
stacks ship (Elasticsearch 8.x exposes the same ``rrf`` rank constructor
over bm25 + knn subqueries), and the natural counterpart for this
engine's two retrieval families: the compressed-index BM25 paths
(:mod:`.compressed`) and the ANN paths (:mod:`..operators.similarity`).

Scale: fusion operates on the RETRIEVED LISTS, never the corpus — each
input frame is a top-k_each result (k_each rows, driver-bounded), so the
rank windows and the fuse groupBy touch O(n_lists × k_each) rows total.
The expensive work stays inside the retrieval paths, which carry their
own 100 TB designs (block-max pruned index reads, partition-pruned ANN
probes).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_C = 60  # the constant from the RRF paper; ES default too


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    k: int,
    c: int = DEFAULT_RRF_C,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse result lists -> top-k ``(id, rrf_score, n_lists)``.

    ``ranked``: (frame, score_col) pairs; each frame is one retriever's
    top-k_each list carrying ``id_col`` and its own score column. Ranks
    are assigned INSIDE each list by (score desc, id asc) — the single-
    partition window is bounded by k_each rows, not corpus size (this is
    a fuse over retrieved lists, never a corpus sort). Ties in the fused
    score break on id ascending, so results are deterministic.
    """
    spark = ranked[0][0].sparkSession if ranked else None
    if not ranked or k <= 0:
        if spark is None:
            raise ValueError("rrf_fuse needs at least one ranked list")
        return spark.createDataFrame(
            [], f"{id_col} long, rrf_score double, n_lists long")
    contribs = []
    for frame, score_col in ranked:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        contribs.append(
            frame.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(float(c))
                               + F.row_number().over(w))).alias("contrib"),
            )
        )
    u = reduce(DataFrame.unionByName, contribs)
    return (
        u.groupBy(id_col)
        .agg(F.sum("contrib").alias("rrf_score"),
             F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_topk(
    docs_df: DataFrame,
    emb_df: DataFrame,
    query_text: str,
    query_vec: list[float],
    k: int,
    k_each: int | None = None,
    c: int = DEFAULT_RRF_C,
    operator: str = "or",
    emb_id_col: str = "vec_id",
) -> DataFrame:
    """One-call hybrid search: naive BM25 over ``docs_df`` + exact cosine
    over ``emb_df`` (ids aligned with doc_ids), RRF-fused top-k.

    ``k_each`` (default 2k) is each retriever's list depth — the standard
    over-retrieve before fusion. For repeated queries swap the naive BM25
    side for :func:`..compressed.search_topk` and the brute-force side
    for a persisted ANN probe; the fusion is retriever-agnostic.
    """
    from prow_jobs_scraper_spark.operators.similarity import (  # noqa: PLC0415
        brute_force_topk,
    )
    from prow_jobs_scraper_spark.search.naive import (  # noqa: PLC0415
        naive_bm25_topk,
    )

    k_each = k_each or 2 * k
    lex = naive_bm25_topk(docs_df, query_text, k_each, operator=operator)
    dense = (
        brute_force_topk(emb_df, query_vec, k_each, id_col=emb_id_col)
        .withColumnRenamed(emb_id_col, "doc_id")
    )
    return rrf_fuse([(lex, "score"), (dense, "cosine")], k, c=c)
