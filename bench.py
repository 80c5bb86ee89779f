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
HEADLINE_REPS = int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "3"))


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


def bench_positions(spark, corpus_path: str) -> dict:
    """Positions-sidecar cost disclosure (round-3 verdict stretch #8):
    a warm baseline build and a ``store_positions=True`` build run
    BACK-TO-BACK on the same corpus + config (warm-vs-warm, so the
    multiplier isn't polluted by first-build JVM/codegen warm-up),
    reporting the build-time multiplier and the sidecar's on-disk bytes
    next to the postings bytes — the numbers behind the documented
    trade-off (phrase verify without corpus access vs size/build cost).
    """
    from prow_jobs_scraper_spark.index.build import BuildConfig, build_index

    def _tree_bytes(root: str) -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                total += os.path.getsize(os.path.join(dirpath, fn))
        return total

    transcripts = spark.read.parquet(corpus_path)
    base_d = tempfile.mkdtemp(prefix="bench_posbase_")
    pos_d = tempfile.mkdtemp(prefix="bench_posidx_")
    try:
        t0 = time.time()
        build_index(spark, transcripts, base_d,
                    BuildConfig(n_ranges=32, n_buckets=16))
        base_sec = time.time() - t0
        t0 = time.time()
        build_index(spark, transcripts, pos_d,
                    BuildConfig(n_ranges=32, n_buckets=16,
                                store_positions=True))
        pos_sec = time.time() - t0
        postings_b = _tree_bytes(os.path.join(pos_d, "postings"))
        sidecar_b = _tree_bytes(os.path.join(pos_d, "positions"))
        return {
            "baseline_build_sec": round(base_sec, 3),
            "build_sec": round(pos_sec, 3),
            "build_multiplier_vs_baseline": round(
                pos_sec / max(base_sec, 1e-9), 3),
            "postings_bytes": postings_b,
            "positions_bytes": sidecar_b,
            "positions_to_postings_ratio": round(
                sidecar_b / max(postings_b, 1), 3),
        }
    except Exception as exc:  # noqa: BLE001
        return {"error": str(exc)[:200]}
    finally:
        shutil.rmtree(base_d, ignore_errors=True)
        shutil.rmtree(pos_d, ignore_errors=True)


# ---- host-contention instrumentation (round-3 verdict #6): every
# scaling sample carries machine-checkable calm/contended evidence, so
# the efficiency claim cites calm-window pairs instead of narrative.
_PROBE_ITERS = 2_000_000


def _cpu_probe_sec() -> float:
    """Fixed single-thread pure-Python workload — wall time is a direct
    probe of host CPU contention (no IO, no JVM, no allocation).
    Best-of-2 so a single scheduler hiccup doesn't mislabel a sample."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = 0
        for i in range(_PROBE_ITERS):
            x += i * i
        best = min(best, time.perf_counter() - t0)
    return best


def _read_steal() -> tuple[float, float]:
    """(steal_jiffies, total_jiffies) from the aggregate /proc/stat cpu
    line; 0 steal on hosts that don't expose it."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [float(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0.0), sum(vals)
    except Exception:  # noqa: BLE001
        return 0.0, 0.0


# a sample is CALM when its probes stay within this factor of the quiet
# baseline AND /proc/stat steal during the sample stays under 2%
_PROBE_CALM_FACTOR = float(os.environ.get("SPARK_GRAFT_CALM_FACTOR", "1.3"))
_STEAL_CALM_PCT = float(os.environ.get("SPARK_GRAFT_CALM_STEAL", "2.0"))


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


# parallelism levels — the default holds TWO true N->4N pairs (1->4 at
# low absolute parallelism, least affected by the host's >8-thread
# memory-bus ceiling, and 8->32 at the ceiling; BASELINE.md "Measured
# results" §1). Override with SPARK_GRAFT_SCALE_LEVELS=...
SCALE_LEVELS = tuple(
    int(x) for x in
    os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4,8,32").split(","))
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

    # initial probes (the block may START contended — the baseline is
    # finalized post-hoc as the best probe seen ANYWHERE in the block,
    # so a busy start can't make the calm rule lenient)
    all_probes = [_cpu_probe_sec() for _ in range(3)]

    samples: dict[int, list] = {c: [] for c in SCALE_LEVELS}
    for _ in range(SCALE_REPS):
        for cores in SCALE_LEVELS:
            try:
                steal0, total0 = _read_steal()
                probe_before = _cpu_probe_sec()
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--scale-worker", str(cores), corpus_path],
                    capture_output=True, text=True, timeout=900,
                )
                probe_after = _cpu_probe_sec()
                steal1, total1 = _read_steal()
                all_probes += [probe_before, probe_after]
                lines = [ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")]
                if lines:
                    rec = json.loads(lines[-1])
                    steal_pct = (100.0 * (steal1 - steal0)
                                 / max(total1 - total0, 1.0))
                    rec.update({
                        "steal_pct": round(steal_pct, 3),
                        "probe_before_sec": round(probe_before, 4),
                        "probe_after_sec": round(probe_after, 4),
                    })
                    samples[cores].append(rec)
            except Exception:
                continue  # a lost sample must never lose the bench line

    probe_base = min(all_probes)
    for recs in samples.values():
        for rec in recs:
            worst = max(rec["probe_before_sec"], rec["probe_after_sec"])
            rec["calm"] = bool(
                rec["steal_pct"] < _STEAL_CALM_PCT
                and worst < probe_base * _PROBE_CALM_FACTOR)

    def _best(recs: list) -> dict:
        return min(recs, key=lambda r: r["elapsed_sec"])

    best = {c: _best(samples[c]) for c in SCALE_LEVELS if samples[c]}
    calm_best = {
        c: _best([r for r in samples[c] if r.get("calm")])
        for c in SCALE_LEVELS
        if any(r.get("calm") for r in samples[c])
    }
    out: dict = {
        f"local{c}": {
            **best[c],
            "all_elapsed_sec": [r["elapsed_sec"] for r in samples[c]],
            "samples": samples[c],
        }
        for c in best
    }
    out["probe_base_sec"] = round(probe_base, 4)
    out["calm_rule"] = (
        f"steal_pct < {_STEAL_CALM_PCT} and probe <= "
        f"{_PROBE_CALM_FACTOR}x quiet baseline")
    # report every true N->4N pair among the levels (the north rule's
    # shape); fall back to consecutive levels if none exists
    pairs = [(lo, hi) for lo in SCALE_LEVELS for hi in SCALE_LEVELS
             if hi == 4 * lo]
    if not pairs:
        pairs = list(zip(SCALE_LEVELS, SCALE_LEVELS[1:]))
    for lo, hi in pairs:
        if lo in best and hi in best:
            sp = best[hi]["turns_per_sec"] / best[lo]["turns_per_sec"]
            out[f"speedup_{lo}_to_{hi}"] = round(sp, 3)
            out[f"efficiency_{lo}_to_{hi}"] = round(sp / (hi / lo), 3)
        if lo in calm_best and hi in calm_best:
            # the HEADLINE pair: both samples individually verified calm
            sp = (calm_best[hi]["turns_per_sec"]
                  / calm_best[lo]["turns_per_sec"])
            out[f"calm_speedup_{lo}_to_{hi}"] = round(sp, 3)
            out[f"calm_efficiency_{lo}_to_{hi}"] = round(
                sp / (hi / lo), 3)
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
    positions = {}
    if os.environ.get("SPARK_GRAFT_SKIP_POSITIONS") != "1":
        positions = bench_positions(spark, corpus_path)
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
        "positions_build": positions,
        "query_latency": query_latency,
        "ann": ann,
        "scaling": scaling,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
