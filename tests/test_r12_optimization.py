"""Round-12 optimization pins: internals changed for performance must
keep their contracts (OPTIMIZATION_r12.md documents each change)."""

from __future__ import annotations

from .conftest import SF_CORRECT


def test_table_handle_cache_returns_same_lazy_plan(spark):
    """catalog.table() memoizes the DataFrame HANDLE per
    (session, sf_dir, name) — ~90 ms of py4j/footer overhead per call
    was ~1/3 of bench wall time.  The cache must return the identical
    lazy plan (same results), stay keyed per sf_dir, and never eagerly
    materialize (it is plan reuse, not result caching)."""
    from opengauss_vectordb_spark.catalog import table

    a = table(spark, SF_CORRECT, "nation")
    b = table(spark, SF_CORRECT, "nation")
    assert a is b, "second call must hit the handle cache"
    other = table(spark, "/root/testdata/sf0.001", "nation")
    assert other is not a, "cache must be keyed per sf_dir"
    assert a.count() == b.count() == 25
    # not persisted/cached data: storage level stays NONE
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk
    # events keeps its nanos→NTZ conversion through the cache
    ev = table(spark, SF_CORRECT, "events")
    assert ev is table(spark, SF_CORRECT, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
