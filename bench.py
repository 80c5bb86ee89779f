#!/usr/bin/env python
"""Benchmark harness — the engine's feedback loop.

Measures, on ``local[$SPARK_GRAFT_CPUS]`` (default 32) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1):

1. headline analytical queries from ``__spark_entry__.queries()`` — each
   executed end-to-end to the noop sink (full plan runs, nothing collected);
2. the flagship north-rule pipeline: synthetic ``transcripts`` corpus →
   salted compressed inverted-index build (turns/sec) → BM25 top-k over the
   reference query set (mean + p95 latency);
3. scaling evidence (sandbox proxy for the N → 4N executor rule): the SAME
   index-build job + input at ``local[8]`` and ``local[32]``; reports
   throughput at both plus efficiency = (T8_elapsed / T32_elapsed) / 4.
   Skip with SPARK_GRAFT_SKIP_SCALING=1 when iterating.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "build": {...}, "query_latency": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# corpus size for the flagship build/query/scaling measurements
N_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "1000000"))

HEADLINE = [
    "bm25_topk",
    "pricing_summary",
    "top_failing_users",
    "anti_join_customers",
    "cost_by_segment",
    "top_revenue_orders",
    "flakiness_users",
    "dedup_keep_first",
    "trends_weekly",
    "time_range_filter",
    "conjunctive_match",
    "exact_dedup",
    "minhash_candidates",
    "token_counts",
    "quality",
    "language_id",
    "similarity_topk",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_to_sink(df) -> None:
    """Execute the full plan without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def _session(cores: int, shuffle_partitions: int | None = None):
    from prow_jobs_scraper_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local[{cores}]",
        cores=cores,
        shuffle_partitions=shuffle_partitions or cores,
    )


# headline + warm-latency sets run >=2 interleaved passes and report the
# per-entry MINIMUM (same protocol the scaling block already uses): the
# host's bursty CPU steal made round-2's single-sample headline read as a
# uniform 1.5x regression on unchanged queries. Interleaving (pass 1 all
# queries, pass 2 all queries, ...) decorrelates a steal burst from any
# single entry; min-of-N is the noise-robust estimator under one-sided
# interference. Raw samples ride along so the artifact shows the spread.
HEADLINE_REPS = int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "2"))


def bench_queries(spark) -> tuple[dict[str, float], dict[str, list[float]]]:
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(max(1, HEADLINE_REPS)):
        for name in HEADLINE:
            t0 = time.time()
            _run_to_sink(qmap[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
    return {name: min(v) for name, v in samples.items()}, samples


def _materialize_corpus(spark, path: str) -> None:
    from prow_jobs_scraper_spark.synth import synth_transcripts

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_transcripts(spark, N_TURNS, seed=42, n_partitions=32).write.mode(
            "overwrite"
        ).parquet(path)


def bench_flagship(spark, corpus_path: str) -> tuple[dict, dict]:
    """Index build throughput + BM25 query latency on the built index."""
    from prow_jobs_scraper_spark.index.build import BuildConfig, build_index
    from prow_jobs_scraper_spark.search.compressed import search_topk
    from prow_jobs_scraper_spark.synth import reference_query_set

    transcripts = spark.read.parquet(corpus_path)
    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        t0 = time.time()
        metrics = build_index(
            spark, transcripts, idx_dir, BuildConfig(n_ranges=32, n_buckets=16)
        )
        build_sec = time.time() - t0
        build = {
            "n_turns": metrics["n_docs"],
            "build_sec": round(build_sec, 3),
            "turns_per_sec": round(metrics["n_docs"] / build_sec, 1),
            "postings_per_sec": round(metrics.get("postings_per_sec", 0.0), 1),
            "skew_ratio_max": round(metrics.get("skew_ratio_max", 1.0), 3),
        }

        # warm latency: interleaved min-of-N per query (see HEADLINE_REPS)
        qset = reference_query_set()
        lat_samples: dict[str, list[float]] = {q["query_id"]: [] for q in qset}
        for _ in range(max(1, HEADLINE_REPS)):
            for q in qset:
                t0 = time.time()
                search_topk(spark, idx_dir, q["query_text"], q["k"]).collect()
                lat_samples[q["query_id"]].append(
                    round(time.time() - t0, 4))
        lat = sorted(min(v) for v in lat_samples.values())
        p95 = lat[min(len(lat) - 1, int(round(0.95 * len(lat))) - 1)]
        from prow_jobs_scraper_spark.search.compressed import search_topk_many

        batch_samples = []
        for _ in range(max(1, HEADLINE_REPS)):
            t0 = time.time()
            search_topk_many(spark, idx_dir, qset).collect()
            batch_samples.append(round(time.time() - t0, 4))
        query_latency = {
            "n_queries": len(lat),
            "mean_sec": round(sum(lat) / len(lat), 4),
            "p95_sec": round(p95, 4),
            "max_sec": round(lat[-1], 4),
            "batch_all_queries_sec": min(batch_samples),
            "batch_samples_sec": batch_samples,
            "per_query_samples_sec": lat_samples,
        }
        return build, query_latency
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def bench_ann(spark) -> dict:
    """Persisted-ANN payoff: index build once, then repeated queries are
    partition-pruned probes; versus the one-shot path that recomputes
    signatures over the full corpus per query (the round-1 defect)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from prow_jobs_scraper_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
        ivf_topk,
        load_ivf_centroids,
    )

    # the sf embeddings table is tiny (500 rows) — synthesize a corpus
    # big enough that probe-vs-full-scan is data-bound, not job-overhead
    n_vecs = int(os.environ.get("SPARK_GRAFT_BENCH_VECS", "100000"))
    dim, n_lists, n_probe = 64, 64, 8

    def gen(batches):
        import numpy as np  # noqa: PLC0415
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
            m = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    emb = (
        spark.range(n_vecs).repartition(CPUS)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )
    qs = [[float(x) for x in r["embedding"]]
          for r in emb.where(F.col("vec_id") < 8).collect()]
    d = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        t0 = time.time()
        build_ivf_index(emb, d, n_lists=n_lists)
        build_sec = time.time() - t0
        C = load_ivf_centroids(spark, d)
        # warm one probe (plan/codegen), then time the rest
        ivf_probe_topk(spark, d, qs[0], 10, n_probe=n_probe,
                       centroids=C).collect()
        t0 = time.time()
        for q in qs:
            ivf_probe_topk(spark, d, q, 10, n_probe=n_probe,
                           centroids=C).collect()
        probe_sec = (time.time() - t0) / len(qs)
        t0 = time.time()
        for q in qs[:2]:
            ivf_topk(emb, q, 10, n_lists=n_lists, n_probe=n_probe).collect()
        oneshot_sec = (time.time() - t0) / 2
        return {
            "n_vecs": n_vecs,
            "build_sec": round(build_sec, 3),
            "probe_mean_sec": round(probe_sec, 4),
            "oneshot_mean_sec": round(oneshot_sec, 4),
            "n_queries": len(qs),
            "speedup_vs_oneshot": round(
                oneshot_sec / max(probe_sec, 1e-9), 2),
        }
    except Exception as exc:  # noqa: BLE001
        return {"error": str(exc)[:200]}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _scale_worker(cores: int, corpus_path: str) -> None:
    """Subprocess entry: one build at local[cores], JSON on stdout."""
    from prow_jobs_scraper_spark.index.build import BuildConfig, build_index

    spark = _session(cores, shuffle_partitions=cores)
    transcripts = spark.read.parquet(corpus_path)
    idx_dir = tempfile.mkdtemp(prefix=f"bench_scale_{cores}_")
    try:
        t0 = time.time()
        m = build_index(
            spark, transcripts, idx_dir, BuildConfig(n_ranges=32, n_buckets=16)
        )
        elapsed = time.time() - t0
        print(json.dumps({
            "elapsed_sec": round(elapsed, 3),
            "turns_per_sec": round(m["n_docs"] / elapsed, 1),
        }))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


# parallelism levels; override e.g. SPARK_GRAFT_SCALE_LEVELS=1,4 to
# measure an N->4N pair at low absolute parallelism (least affected by
# the host's >8-thread ceiling, BASELINE.md "Measured results" §1)
SCALE_LEVELS = tuple(
    int(x) for x in
    os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8,32").split(","))
# >=3 interleaved reps by default: the host shows bursty CPU steal, so
# single-sample scaling numbers are noise (round-1 verdict asked that the
# bench artifact itself carry the multi-sample evidence, min-of-N)
SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))


def bench_scaling(corpus_path: str) -> dict:
    """Same build job + same input at three parallelism levels (N vs 4N
    proxy pairs: 2->8 and 8->32).

    Each run executes in its own subprocess so no JVM heap or allocator
    state leaks between levels. Levels are interleaved across SCALE_REPS
    repetitions and the per-level MINIMUM elapsed is reported: the
    sandbox host shows bursty external CPU steal (same-command reruns
    vary up to 2x), and min-of-N is the standard noise-robust estimator
    under one-sided interference. All raw samples are reported too.
    """
    import subprocess

    samples: dict[int, list] = {c: [] for c in SCALE_LEVELS}
    for _ in range(SCALE_REPS):
        for cores in SCALE_LEVELS:
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--scale-worker", str(cores), corpus_path],
                    capture_output=True, text=True, timeout=900,
                )
                lines = [ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")]
                if lines:
                    samples[cores].append(json.loads(lines[-1]))
            except Exception:
                continue  # a lost sample must never lose the bench line
    best = {
        c: min(samples[c], key=lambda r: r["elapsed_sec"])
        for c in SCALE_LEVELS if samples[c]
    }
    out: dict = {
        f"local{c}": {**best[c],
                      "all_elapsed_sec": [r["elapsed_sec"] for r in samples[c]]}
        for c in best
    }
    for lo, hi in zip(SCALE_LEVELS, SCALE_LEVELS[1:]):
        if lo in best and hi in best:
            sp = best[hi]["turns_per_sec"] / best[lo]["turns_per_sec"]
            out[f"speedup_{lo}_to_{hi}"] = round(sp, 3)
            out[f"efficiency_{lo}_to_{hi}"] = round(sp / (hi // lo), 3)
    return out


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--scale-worker":
        _scale_worker(int(sys.argv[2]), sys.argv[3])
        return

    corpus_path = os.path.join(
        tempfile.gettempdir(), f"bench_transcripts_{N_TURNS}"
    )

    spark = _session(CPUS)
    _materialize_corpus(spark, corpus_path)
    # warm up the JVM + Python workers so the first timed query doesn't
    # absorb session startup (worker spawn, codegen, broadcast machinery)
    _run_to_sink(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
        .selectExpr("doc_id", "lower(text) t")
    )
    queries, query_samples = bench_queries(spark)
    build, query_latency = bench_flagship(spark, corpus_path)
    ann = bench_ann(spark)
    spark.stop()

    scaling: dict = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        try:
            scaling = bench_scaling(corpus_path)
        except Exception as exc:  # noqa: BLE001
            scaling = {"error": str(exc)[:200]}

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "queries_samples": query_samples,
        "headline_reps": max(1, HEADLINE_REPS),
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "build": build,
        "query_latency": query_latency,
        "ann": ann,
        "scaling": scaling,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
