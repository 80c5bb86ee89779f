"""Compressed-index BM25 top-k with block skipping + block-max pruning.

Query lifecycle (cf. SURVEY.md §3.2 "ours"):

1. analyze the query with the engine tokenizer (same as index build);
2. broadcast-size lookup of the query terms in ``term_stats`` (term-bucket
   ``tb`` directory pruning + Parquet min/max on ``term``) — conjunctive
   semantics: any missing term short-circuits to an empty result;
3. scan only the matching posting blocks (again tb-pruned);
4. one distributed scoring pass grouped by ``salt`` — every term's
   postings were range-partitioned on the SAME doc-id ranges at build
   time, so each salt group holds all query terms' postings for one doc
   range: a co-partitioned conjunctive merge with zero replication;
5. per-salt numpy kernel: decode the rarest term, then for each further
   term decode only blocks whose [first_doc_id, last_doc_id] span touches
   surviving candidates (searchsorted block skipping); single-term queries
   process blocks in descending block-max order and stop once the k-th
   score exceeds the next block's upper bound (block-max pruning);
6. local top-k per salt → global ``orderBy(score desc, doc_id).limit(k)``
   (TakeOrderedAndProject).

Rank-identity: float64 everywhere, same formula and tie order as the
naive path and the numpy oracle (three-way agreement enforced in tests).
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prow_jobs_scraper_spark.functions.tokenize import tokenize_text
from prow_jobs_scraper_spark.index import codec
from prow_jobs_scraper_spark.index.build import IndexPaths, term_bucket_expr


def _tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float):
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-12)))


def _decode_term(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all of one term's blocks in a salt group (already doc-ordered
    across blocks: salts are disjoint ranges, blocks disjoint within)."""
    ids_l, tf_l, dl_l = [], [], []
    for row in pdf.sort_values("first_doc_id").itertuples(index=False):
        n = int(row.n_docs)
        ids_l.append(codec.delta_decode(int(row.first_doc_id), row.doc_gaps, n))
        tf_l.append(codec.varint_decode(row.tf_bytes, n))
        dl_l.append(codec.varint_decode(row.dl_bytes, n))
    return (np.concatenate(ids_l), np.concatenate(tf_l), np.concatenate(dl_l))


def _single_term_topk(
    pdf: pd.DataFrame, idf: float, k: int, avgdl: float, k1: float, b: float
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned scan of one term inside one salt group."""
    blocks = pdf.sort_values("block_max_tf_norm", ascending=False)
    best_ids = np.empty(0, dtype=np.int64)
    best_scores = np.empty(0, dtype=np.float64)
    kth = -math.inf
    for row in blocks.itertuples(index=False):
        ub = idf * float(row.block_max_tf_norm)
        if len(best_ids) >= k and ub < kth:
            break  # no remaining block can beat the current k-th score
        n = int(row.n_docs)
        ids = codec.delta_decode(int(row.first_doc_id), row.doc_gaps, n)
        tfs = codec.varint_decode(row.tf_bytes, n)
        dls = codec.varint_decode(row.dl_bytes, n)
        scores = idf * _tf_norm(tfs, dls, avgdl, k1, b)
        all_ids = np.concatenate([best_ids, ids])
        all_scores = np.concatenate([best_scores, scores])
        order = np.lexsort((all_ids, -all_scores))[:k]
        best_ids, best_scores = all_ids[order], all_scores[order]
        if len(best_ids) >= k:
            kth = best_scores[-1]
    return best_ids, best_scores


def search_topk(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int,
) -> DataFrame:
    """Top-k ``(doc_id, score)`` from the compressed index at ``index_dir``."""
    paths = IndexPaths(index_dir)
    with open(paths.meta) as f:
        meta = json.load(f)
    n_docs, avgdl = int(meta["n_docs"]), float(meta["avgdl"])
    k1, b, n_buckets = float(meta["k1"]), float(meta["b"]), int(meta["n_buckets"])

    empty = spark.createDataFrame([], "doc_id long, score double")
    q_terms = sorted(set(tokenize_text(query_text)))
    if not q_terms or n_docs == 0:
        return empty

    terms_dim = spark.createDataFrame([(t,) for t in q_terms], "term string")
    buckets = [
        int(r["tb"])
        for r in terms_dim.select(
            term_bucket_expr(F.col("term"), n_buckets).alias("tb")
        ).distinct().collect()
    ]
    # term_stats holds the (term -> term_id, df) mapping; the postings
    # table is keyed by term_id only (no strings in the data plane)
    stats = (
        spark.read.parquet(paths.term_stats)
        .where(F.col("tb").isin(buckets) & F.col("term").isin(q_terms))
        .select("term", "term_id", "df")
        .collect()
    )
    dfs = {r["term"]: int(r["df"]) for r in stats}
    tid_of = {r["term"]: int(r["term_id"]) for r in stats}
    if any(t not in dfs for t in q_terms):
        return empty  # conjunctive AND: a missing term kills the query
    idfs = {
        tid_of[t]: math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in q_terms
    }
    terms_by_rarity = [
        tid_of[t] for t in sorted(q_terms, key=lambda t: (dfs[t], t))
    ]
    q_term_ids = list(tid_of.values())

    blocks = (
        spark.read.parquet(paths.postings)
        .where(F.col("tb").isin(buckets) & F.col("term_id").isin(q_term_ids))
        .select("term_id", "salt", "block_id", "n_docs", "first_doc_id",
                "last_doc_id", "doc_gaps", "tf_bytes", "dl_bytes",
                "block_max_tf_norm")
    )

    n_q = len(q_terms)

    def score_salt(pdf: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        })
        by_term = {t: g for t, g in pdf.groupby("term_id")}
        if len(by_term) < n_q:
            return out_empty  # some term has no postings in this doc range

        if n_q == 1:
            t = terms_by_rarity[0]
            ids, scores = _single_term_topk(by_term[t], idfs[t], k, avgdl, k1, b)
            return pd.DataFrame({"doc_id": ids, "score": scores})

        # rarest term defines the candidate set
        t0 = terms_by_rarity[0]
        cand_ids, cand_tfs, cand_dls = _decode_term(by_term[t0])
        scores = idfs[t0] * _tf_norm(cand_tfs, cand_dls, avgdl, k1, b)

        for t in terms_by_rarity[1:]:
            if cand_ids.size == 0:
                return out_empty
            g = by_term[t].sort_values("first_doc_id")
            firsts = g["first_doc_id"].to_numpy(dtype=np.int64)
            lasts = g["last_doc_id"].to_numpy(dtype=np.int64)
            # block skipping: decode only blocks whose range holds candidates
            lo = np.searchsorted(cand_ids, firsts, side="left")
            hi = np.searchsorted(cand_ids, lasts, side="right")
            touched = np.flatnonzero(hi > lo)
            if touched.size == 0:
                return out_empty
            sub = g.iloc[touched]
            ids_t, tfs_t, _ = _decode_term(sub)
            pos = np.searchsorted(ids_t, cand_ids)
            pos_c = np.minimum(pos, ids_t.size - 1)
            found = ids_t[pos_c] == cand_ids
            if not found.any():
                return out_empty
            scores = scores[found] + idfs[t] * _tf_norm(
                tfs_t[pos_c[found]], cand_dls[found], avgdl, k1, b
            )
            cand_ids, cand_dls = cand_ids[found], cand_dls[found]

        order = np.lexsort((cand_ids, -scores))[:k]
        return pd.DataFrame({"doc_id": cand_ids[order], "score": scores[order]})

    local = blocks.groupBy("salt").applyInPandas(
        score_salt, schema="doc_id long, score double"
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
