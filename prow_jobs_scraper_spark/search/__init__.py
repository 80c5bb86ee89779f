from prow_jobs_scraper_spark.search.compressed import search_topk  # noqa: F401
from prow_jobs_scraper_spark.search.naive import naive_bm25_topk  # noqa: F401
