from prow_jobs_scraper_spark.oracle.bm25 import bm25_oracle_topk  # noqa: F401
