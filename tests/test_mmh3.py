"""F8 murmur3 parity (reference utils.py:24-27): the scalar
implementation against published MurmurHash3 x86_32 vectors, the
batch-vectorized column UDF against the scalar, and the reference's
exact _id recipe."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prow_jobs_scraper_spark.functions.mmh3 import (
    _mmh3_batch,
    generate_hash_from_strings,
    mmh3_id_column,
    mmh3_x86_32,
)

# published vectors: mmh3's own README anchors hash("foo"); the others
# are the widely-cited x86_32/seed-0 SMHasher values
VECTORS = {
    "": 0,
    "foo": -156908512,
    "hello": 613153351,                 # 0x248bfa47
    "abc": -1277324294,                 # 0xb3dd93fa signed
    "The quick brown fox jumps over the lazy dog":
        np.int32(np.uint32(0x2E4FF723)).item(),
}


def test_known_vectors():
    for s, want in VECTORS.items():
        assert mmh3_x86_32(s) == want, s


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=30))
def test_batch_matches_scalar(texts):
    got = _mmh3_batch(pd.Series(texts).str.encode("utf-8"))
    want = [mmh3_x86_32(t) for t in texts]
    assert list(got) == want


def test_reference_id_recipe():
    # str(mmh3.hash("".join(strings))) — concatenation BEFORE hashing,
    # so the recipe is order-sensitive and separator-free
    assert generate_hash_from_strings("a", "b") == str(mmh3_x86_32("ab"))
    assert (generate_hash_from_strings("a", "b")
            != generate_hash_from_strings("b", "a"))
    assert generate_hash_from_strings("foo") == "-156908512"


def test_column_udf_matches_scalar(spark):
    rows = [("b1", "install"), ("b2", "deploy"), ("", ""),
            ("héllo", "wörld"), ("x" * 60, "y" * 3), (None, "z")]
    df = spark.createDataFrame(rows, "build_id string, name string")
    got = (df.withColumn("id", mmh3_id_column(F.col("build_id"),
                                              F.col("name")))
             .select("id").toPandas()["id"].tolist())
    want = [generate_hash_from_strings(a or "", b or "") for a, b in rows]
    assert got == want
