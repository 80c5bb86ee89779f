"""Naive BM25 top-k: a pure DataFrame plan, no index required.

This is the P1 slice from SURVEY.md §7 and the engine-internal oracle for
the compressed path (three-way agreement: naive == compressed == numpy
oracle). Semantics = reference's analyzed conjunctive match + BM25
(src/jobsautoreport/query.py:47-74,105-111 — ES ``match``/``operator:
and``); plan = tokenize (Catalyst regexp) → explode → filter to query
terms → per-doc tf → broadcast-join tiny idf dim → conjunctive groupBy →
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prow_jobs_scraper_spark.functions.tokenize import tokenize_column, tokenize_text
from prow_jobs_scraper_spark.index.build import BM25Params, with_doc_ids


def naive_bm25_topk(
    docs_df: DataFrame,
    query_text: str,
    k: int,
    params: BM25Params | None = None,
    operator: str = "and",
    post_filter: str | None = None,
) -> DataFrame:
    """Top-k ``(doc_id, score)`` over a corpus frame.

    ``docs_df`` either already carries ``(doc_id, text)`` (any table with
    an int64 key — e.g. a ``documents`` table) or is a raw transcripts
    frame, in which case the engine key xxhash64(conv_id, turn_idx) is
    attached. ``operator="and"`` (the reference's ES ``match`` with
    ``operator: and``): empty 2-column frame when the query has no terms
    or any term is missing from the corpus. ``operator="or"`` (the ES
    ``match`` default): corpus-absent terms are dropped and any doc
    containing at least one surviving term qualifies.

    ``post_filter``: ES bool-query filter context — a SQL predicate over
    ``docs_df``'s columns restricting which docs may enter the top-k;
    scoring statistics (idf/avgdl/n_docs) stay corpus-global, exactly as
    an ES ``filter`` clause never affects ``match`` scores.
    """
    params = params or BM25Params()
    spark = docs_df.sparkSession
    q_terms = sorted(set(tokenize_text(query_text)))
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not q_terms:
        return empty

    if "doc_id" not in docs_df.columns:
        docs_df = with_doc_ids(docs_df)
    docs = docs_df.select("doc_id", tokenize_column(F.col("text")).alias("tokens"))
    # ONE stats job: corpus size, avgdl AND every query term's df come
    # from a single scan (df_t = Σ array_contains(tokens, t)) instead of
    # a scalar agg plus a separate df agg over the exploded stream
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size("tokens")).alias("avgdl"),
        *[F.sum(F.array_contains("tokens", t).cast("long")).alias(f"df_{i}")
          for i, t in enumerate(q_terms)],
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    if n_docs == 0:
        return empty
    dfs = {t: int(row[f"df_{i}"] or 0) for i, t in enumerate(q_terms)}
    if operator == "and":
        if any(dfs[t] == 0 for t in q_terms):
            return empty
    else:
        q_terms = [t for t in q_terms if dfs[t] > 0]  # OR: drop absent
        if not q_terms:
            return empty

    flat = (
        docs.select("doc_id", F.size("tokens").alias("dl"),
                    F.explode("tokens").alias("term"))
        .where(F.col("term").isin(q_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    import math  # noqa: PLC0415

    idf_dim = spark.createDataFrame(
        [(t, math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)))
         for t in q_terms],
        "term string, idf double",
    )
    k1, b = params.k1, params.b
    scored = flat.join(F.broadcast(idf_dim), "term").withColumn(
        "part_score",
        F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("part_score").alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"))
    if operator == "and":  # AND: keep only docs hitting every term
        agg = agg.where(F.col("n_terms_hit") == len(q_terms))
    # (implicit else — OR: any term hit qualifies, no filter)
    if post_filter:  # filter BEFORE the top-k, never the scores
        agg = agg.join(docs_df.where(post_filter).select("doc_id"),
                       "doc_id", "left_semi")
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
