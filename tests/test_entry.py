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


def test_every_query_has_an_oracle(spark):
    # round-3 goal: zero rows-only entries — every queries() key must
    # carry a DuckDB oracle (the driver's strong check)
    missing = [n for n in E.queries() if n not in E.oracle_sql()]
    assert missing == [], missing


def test_bm25_compressed_entry_matches_naive_entry(spark):
    # the compressed entry answers the SAME query as bm25_topk from the
    # built index — rank and rounded score must agree exactly
    want = E.queries()["bm25_topk"](spark, SF_DIR).toPandas()
    got = E.queries()["bm25_compressed_topk"](spark, SF_DIR).toPandas()
    assert list(got.columns) == ["mode", "doc_id", "rank", "score"]
    for mode in ("and", "or"):  # both kernels vs both naive plans
        g = got[got["mode"] == mode].reset_index(drop=True)
        w = want[want["mode"] == mode].reset_index(drop=True)
        assert len(g) > 0
        assert g["doc_id"].tolist() == w["doc_id"].tolist(), mode
        assert g["score"].tolist() == w["score"].tolist(), mode


def test_entry_smoke(spark):
    df = E.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(pdf.columns) == ["mode", "doc_id", "rank", "score"]
