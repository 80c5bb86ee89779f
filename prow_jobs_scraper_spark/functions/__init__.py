from prow_jobs_scraper_spark.functions.tokenize import (  # noqa: F401
    TOKEN_PATTERN,
    tokenize_column,
    tokenize_pandas,
    tokenize_text,
)
