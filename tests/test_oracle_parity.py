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
    problems = compare(df, ORACLES[name], SF_CORRECT)
    assert not problems, f"{name}: " + "; ".join(problems)


NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0
