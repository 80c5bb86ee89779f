"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() runs on sf0.01 through BOTH Spark and DuckDB; row
count, column names, and (order-insensitively sorted) values must match."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        if "datetime" in str(pdf[c].dtype):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True)


ORACLE_KEYS = sorted(E.oracle_sql().keys())


def test_oracle_keys_subset_of_queries():
    assert set(E.oracle_sql()) <= set(E.queries())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(E.queries()[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.sql(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(
                w.to_numpy().dtype, np.floating):
            np.testing.assert_allclose(
                g.to_numpy(dtype=np.float64), w.to_numpy(dtype=np.float64),
                rtol=1e-9, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            assert g.tolist() == w.tolist(), f"{name}.{c} values differ"


def test_rows_only_queries_run(spark):
    for name, fn in E.queries().items():
        if name in E.oracle_sql() or name == "transcripts_bm25_compressed":
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_transcripts_bm25_compressed_entry(spark):
    df = E.queries()["transcripts_bm25_compressed"](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) > 0 and list(pdf.columns) == ["doc_id", "score"]


def test_entry_smoke(spark):
    df = E.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(pdf.columns) == ["doc_id", "rank", "score"]
