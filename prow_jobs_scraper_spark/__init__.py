"""prow_jobs_scraper_spark — a from-scratch PySpark-native full-text index
and analytics engine with the query/data-processing capabilities of the
reference `pastequo/prow-jobs-scraper` (studied read-only; see SURVEY.md).

Not a port: the reference delegates indexing/search to OpenSearch/Lucene
and does analytics in single-process Python; this engine rebuilds those
capabilities as Spark DataFrame plans + Arrow-vectorized pandas UDFs over
columnar tables of multi-turn conversation transcripts:

- ``index``      — inverted-index build: vectorized tokenization, salted
                   repartition-by-term with explicit hot-term skew splits,
                   delta-gap + varint (PForDelta-style) compressed posting
                   blocks with block-max scores, per-partition lineage
                   manifests for resumable builds.
- ``search``     — BM25 top-k: naive DataFrame path (oracle-checkable) and
                   the compressed path with block-range skipping and
                   block-max pruning.
- ``operators``  — the reference's report/analytics operator inventory
                   (SURVEY.md §2) re-expressed as DataFrame plans, plus
                   training-data-pipeline ops (dedup, similarity search,
                   text QC, multimodal plumbing).
- ``functions``  — tokenizer + scalar expression helpers.
- ``oracle``     — brute-force numpy/pandas BM25 oracle used by tests.
"""

__version__ = "0.1.0"
