"""Central query registry — the engine's operator inventory surface.

Every operator from SURVEY.md §2 that we claim is represented here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB can execute over the same parquet tables. The driver's correctness
gate runs both and hash-compares.

Determinism conventions (so Spark and DuckDB hash-match bit-for-bit):
  * SUM over doubles is order-dependent → cast each row's value to
    DECIMAL(18,6) BEFORE aggregating (exact, associative), cast the exact
    decimal sum to DOUBLE at the end. Per-row double arithmetic is IEEE
    and evaluates identically in both engines.
  * AVG = decimal-sum cast to double, divided (double IEEE) by COUNT.
  * Ordered+limited output must sort by a tie-broken unique key.
  * Timestamps are cast to DATE (or grouped via year()/date_trunc) in
    outputs to avoid tz-representation deltas.
  * Every computed column is aliased identically in both dialects.
  * NO RETURNED COLUMN may be DecimalType — ON EITHER SIDE: the driver
    hashes decimal representations, not values (r4's
    incremental_agg_merge red was bit-identical values under a
    DECIMAL(28,6) output type; r5's source_mix_rebalance red was a bare
    ``0.25`` ORACLE literal, DECIMAL(3,2) in DuckDB). Decimal
    internally, DOUBLE out — and CAST bare fractional literals in the
    oracle SQL too.
  * NO RETURNED COLUMN may be ARRAY/MAP typed — on either side: the
    driver's row canonicalizer sorts rows in pandas and dies on
    unhashable list cells (r5's array_funcs2 ERR). Serialize with
    array_join (Spark) / array_to_string (DuckDB).
  Both rules are enforced per-query by tests/test_oracle_parity.py: the
  Spark schema is checked directly and the oracle's raw fetched values
  are scanned for Decimal/list cells (cast_semantics exempt).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-SQL equivalent
    (omit for non-SQL-expressible ops → driver runs rows-only check).

    Every registered build runs inside a persist scope (r13, VERDICT r12
    item 5): building query B releases the persisted blocks query A
    scoped via ``_util.scoped_persist`` — the blocks a query persists
    for its own multi-consumer plan stay alive through its action(s) and
    are dropped when the NEXT query builds, so a long session holds at
    most one query's worth of persisted storage instead of accumulating
    DISK_ONLY blocks across hundreds of queries."""

    def deco(fn: QueryFn) -> QueryFn:
        import functools

        from .operators._util import begin_query_scope

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            begin_query_scope(name)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all_queries() -> None:
    """Import every operator module so its @query decorators run."""
    from .operators import (  # noqa: F401
        bformat,
        contrib_funcs,
        copy_stmt,
        create_aggregate,
        create_function,
        db4ai,
        dblink,
        ddl_tables,
        dedup,
        do_block,
        functions_ext,
        fuzzy,
        gin_index,
        gist_index,
        matview,
        merge,
        multimodal,
        packages,
        partition_ddl,
        portal,
        prepared,
        pg_types,
        pipeline,
        plpgsql,
        plpython,
        range_types,
        relational,
        rls,
        schemas,
        setops_windows,
        skew,
        stats,
        text,
        timecapsule,
        triggers,
        user_types,
    )
    from .functions import udtf  # noqa: F401
    from .sources import zorder  # noqa: F401
    from .streaming import batch_windows  # noqa: F401
    from .vector import queries as vector_queries  # noqa: F401
