"""The main correctness gate, mirroring the driver: every registered
query with an oracle must match DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from opengauss_vectordb_spark import registry

registry.load_all_queries()

from opengauss_vectordb_spark.registry import ORACLES, QUERIES  # noqa: E402

from .conftest import SF_CORRECT  # noqa: E402
from .oracle_harness import compare  # noqa: E402

ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    # the driver hashes decimal REPRESENTATIONS, not values (the r4
    # incremental_agg_merge red): decimal is fine internally, but every
    # RETURNED column must be cast to DOUBLE per the registry
    # determinism convention (registry.py docstring)
    from pyspark.sql.types import ArrayType, DecimalType, MapType

    # cast_semantics is exempt: its decimal output IS the behavior
    # under test, and it holds a green driver-gate row from r1
    exempt = name == "cast_semantics"
    if not exempt:
        decs = [f.name for f in df.schema.fields
                if isinstance(f.dataType, DecimalType)]
        assert not decs, (
            f"{name} returns DECIMAL column(s) {decs} — cast the final "
            "column(s) to DOUBLE in both the Spark query and the oracle"
        )
        # the driver's canonicalizer cannot sort rows containing LIST
        # cells (r5 array_funcs2 ERR): no ARRAY/MAP in returned schemas
        # — serialize via array_join / array_to_string on both sides
        arrs = [f.name for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType))]
        assert not arrs, (
            f"{name} returns ARRAY/MAP column(s) {arrs} — serialize to "
            "strings on both sides (registry convention)"
        )
    problems = compare(df, ORACLES[name], SF_CORRECT, check_repr=not exempt)
    assert not problems, f"{name}: " + "; ".join(problems)


NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0
