"""Pins for the round-13 optimization internals: the ADC fold respelling
must be bit-identical, pin_schema must pin exactly what createDataFrame
pinned, and the query-scoped persist registry must actually release the
previous query's blocks (VERDICT r12 item 5)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE


def test_adc_seqfold_bitwise_equals_zipwith_spelling(spark):
    """pq.adc_distance (sequence-fold over one flat LUT literal) must be
    BIT-IDENTICAL to the r12 aggregate(zip_with(codes, lut2d)) spelling
    on every input shape: full-length codes, short arrays (NULL via
    element_at out-of-range == zip_with null-padding), empty arrays, and
    NULL code cells."""
    import numpy as np
    from pyspark.sql import functions as F

    from opengauss_vectordb_spark.vector.pq import PqCodebooks

    rng = np.random.default_rng(13)
    books = PqCodebooks(rng.normal(size=(16, 16, 4)))
    qvec = [float(x) for x in rng.normal(size=64)]

    rows = []
    for i in range(200):
        codes = [int(x) for x in rng.integers(0, 16, size=16)]
        rows.append((i, codes))
    rows.append((200, [int(x) for x in rng.integers(0, 16, size=7)]))  # short
    rows.append((201, []))  # empty
    rows.append((202, [None] + [3] * 15))  # NULL cell
    df = spark.createDataFrame(rows, "id INT, codes ARRAY<INT>")

    lut2d = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in row])
            for row in books.adc_lut(qvec)
        ]
    )
    picked = F.zip_with(F.col("codes"), lut2d, lambda c, t: F.element_at(t, c + 1))
    old = F.sqrt(F.aggregate(picked, F.lit(0.0), lambda a, x: a + x))

    got = df.select(
        "id",
        old.alias("r12"),
        books.adc_distance(F.col("codes"), qvec).alias("r13"),
    ).collect()
    for r in got:
        assert (r.r12 is None) == (r.r13 is None), r
        if r.r12 is not None:
            import struct

            assert struct.pack("<d", r.r12) == struct.pack("<d", r.r13), r


def test_dsum_digits_bitwise_equals_dsum_on_kdp_grid(spark):
    """dsum_digits(col, d) must be BIT-IDENTICAL to
    CAST(SUM(CAST(col AS DECIMAL(18,6))) AS DOUBLE) on columns whose
    true values have ≤d decimal digits within the documented magnitude
    bound — including the linreg syy shape: squares of 2-dp money values
    up to ~1.1e5 (y² ~1.2e10, over dsum6's bound but exact at 4 dp)."""
    import random
    import struct

    from pyspark.sql import functions as F

    from opengauss_vectordb_spark.operators._util import dsum, dsum_digits

    rng = random.Random(113)
    rows = []
    for i in range(4000):
        g = i % 7
        # 2-dp money value in [0, 110000], like l_extendedprice
        y = rng.randrange(0, 11_000_000) / 100.0
        rows.append((g, y * y))              # exact 4-dp square
        if i % 17 == 0:
            rows.append((g, None))           # NULLs ignored by both
    rows.append((99, None))                  # all-NULL group
    df = spark.createDataFrame(rows, "g INT, v DOUBLE")
    got = (
        df.groupBy("g")
        .agg(dsum(F.col("v"), "slow"), dsum_digits(F.col("v"), 4, "fast"))
        .collect()
    )
    assert len(got) == 8
    for r in got:
        assert (r.slow is None) == (r.fast is None), r
        if r.slow is not None:
            assert struct.pack("<d", r.slow) == struct.pack("<d", r.fast), r


def test_pin_schema_pins_what_createdataframe_pinned(spark):
    from opengauss_vectordb_spark.operators._util import pin_schema

    schema = "k INT, name STRING, total DOUBLE, n BIGINT"
    df = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, 2 AS c, 3 AS d"
    )
    pinned = pin_schema(df, schema)
    want = spark.createDataFrame([], schema)
    assert [(f.name, f.dataType) for f in pinned.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    row = pinned.collect()[0]
    assert (row.k, row.name, row.total, row.n) == (1, "x", 2.0, 3)
    with pytest.raises(ValueError):
        pin_schema(df, "only INT, three STRING, cols DOUBLE")


def test_scoped_persist_releases_previous_querys_blocks(spark):
    """Building query B must unpersist what query A scoped; rebuilding A
    itself must NOT (the bench's min-of-N reuse).  Uses the CacheManager
    because scoped persists register there while localCheckpoints do
    not."""
    from opengauss_vectordb_spark import registry

    registry.load_all_queries()
    from opengauss_vectordb_spark.registry import QUERIES

    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    assert cm.isEmpty()

    QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE)  # scopes a DISK_ONLY persist
    assert not cm.isEmpty(), "expected a scoped persist to register"
    QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE)  # same name: blocks stay
    assert not cm.isEmpty()
    QUERIES["tpch_q6"](spark, SF_SMOKE)  # different query: blocks released
    assert cm.isEmpty(), "previous query's scoped blocks must be released"
