from prow_jobs_scraper_spark.index import codec  # noqa: F401
from prow_jobs_scraper_spark.index.build import (  # noqa: F401
    BM25Params,
    IndexPaths,
    build_index,
)
