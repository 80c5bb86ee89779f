"""Brute-force BM25 oracle (pandas/numpy) — the tests' source of truth.

Plays the role OpenSearch plays for the reference (its tests mock the ES
boundary and assert golden outputs — SURVEY.md §5): an independent,
obviously-correct implementation the Spark engine must rank-match.

Semantics under test:
- tokenizer identical to the engine's (:mod:`..functions.tokenize`);
- conjunctive match: doc qualifies iff it contains EVERY distinct query
  term (ES ``match`` with ``operator: and`` — reference
  src/jobsautoreport/query.py:47-74,105-111);
- textbook BM25, Lucene's published defaults k1=1.2, b=0.75,
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)); repeated query terms count
  once (analyzer dedup);
- total order (score desc, doc_id asc), float64 throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from prow_jobs_scraper_spark.functions.tokenize import tokenize_pandas, tokenize_text

K1 = 1.2
B = 0.75


def bm25_oracle_topk(
    docs: pd.DataFrame, query_text: str, k: int, k1: float = K1, b: float = B,
    operator: str = "and"
) -> pd.DataFrame:
    """Score ``docs(doc_id:int64, text:str)`` against ``query_text``.

    Returns the top-k frame ``(doc_id, score)`` ordered by
    (score desc, doc_id asc). ``operator="and"`` (ES ``match`` with
    ``operator: and``): empty frame when any query term is absent from
    the corpus; a doc qualifies iff it contains every term.
    ``operator="or"`` (ES ``match`` default): corpus-absent terms are
    dropped, a doc qualifies if it contains ANY surviving term, scores
    sum over the terms it contains.
    """
    q_terms = sorted(set(tokenize_text(query_text)))
    out_empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
    if not q_terms:
        return out_empty

    tokens = tokenize_pandas(docs["text"])
    dls = tokens.str.len().to_numpy(dtype=np.float64)
    n_docs = len(docs)
    avgdl = float(dls.mean()) if n_docs else 0.0
    doc_ids = docs["doc_id"].to_numpy(dtype=np.int64)

    conj = operator == "and"
    scores = np.zeros(n_docs, dtype=np.float64)
    match = np.ones(n_docs, dtype=bool) if conj else np.zeros(n_docs, dtype=bool)
    for term in q_terms:
        tf = tokens.apply(lambda ts, t=term: ts.count(t)).to_numpy(dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            if conj:
                return out_empty
            continue  # OR: an absent term just contributes nothing
        match = (match & (tf > 0)) if conj else (match | (tf > 0))
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        denom = tf + k1 * (1.0 - b + b * dls / np.maximum(avgdl, 1e-12))
        scores += np.where(tf > 0, idf * tf * (k1 + 1.0) / np.maximum(denom, 1e-12), 0.0)

    hit = np.flatnonzero(match)
    if hit.size == 0:
        return out_empty
    order = np.lexsort((doc_ids[hit], -scores[hit]))[:k]
    sel = hit[order]
    return pd.DataFrame({"doc_id": doc_ids[sel], "score": scores[sel]}).reset_index(
        drop=True
    )
