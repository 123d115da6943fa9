"""ANALYZE — table/column statistics (the pg_statistic surface).

Reference: `optimizer/commands/analyze.cpp` (8,506 LoC) — samples the
relation (default_statistics_target × 300 rows), runs
`std_typanalyze`-driven per-column computation (:2184), and stores
stanullfrac / stawidth / stadistinct / MCV arrays / histogram bounds
into pg_statistic (:4416-4418). The planner's selectivity estimates
read these.

Spark-first shape:

* One aggregation pass per analyzed column computes n_rows, null_frac,
  n_distinct, min/max; the MCV is a groupBy(count) top-1 with a
  value tie-break. Each column's aggregate is a tiny partial/final
  pass; columns union into one per-column-row frame (pg_stats shape).
* Scale: ANALYZE's own answer is SAMPLING — `analyze_table(...,
  sample_rows=N)` bounds the scan with the same deterministic
  hash-order draw the engine's other samplers use, and
  `exact_distinct=False` swaps countDistinct for HyperLogLog
  approx_count_distinct (the 100 TB default; the reference's
  stadistinct is itself an estimate). The gate runs full-scan/exact so
  DuckDB can oracle it bit-for-bit.
* Engine.sql accepts ``ANALYZE <table>`` / ``ANALYZE <table> (cols)``;
  results cache on the engine (`Engine.statistics`) — the planner-
  facing consumer is `Engine.suggest_broadcast`, which reads n_rows to
  decide whether a dimension is safely below the broadcast threshold
  (the selectivity-consumer analogue).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ._util import status_frame

_STATS_SCHEMA = (
    "col_name STRING, n_rows BIGINT, null_frac DOUBLE, n_distinct BIGINT,"
    " mcv_val STRING, mcv_freq DOUBLE, min_val STRING, max_val STRING"
)


def analyze_column(
    df: DataFrame, col: str, exact_distinct: bool = True
) -> DataFrame:
    """One pg_stats row for `col`: n_rows, null_frac (stanullfrac),
    n_distinct (stadistinct), top-1 MCV + frequency, min/max (the
    2-bound histogram degenerate). Values render as strings so rows
    for heterogeneous column types union into one frame."""
    c = F.col(col)
    ndv = (
        F.count_distinct(c) if exact_distinct else F.approx_count_distinct(c)
    )
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c).alias("n_nonnull"),
        ndv.cast("bigint").alias("n_distinct"),
        F.min(c).cast("string").alias("min_val"),
        F.max(c).cast("string").alias("max_val"),
    )
    mcv = (
        df.filter(c.isNotNull())
        .groupBy(c.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("v").cast("string"))
        .limit(1)
        .select(F.col("v").cast("string").alias("mcv_val"), "cnt")
    )
    return base.crossJoin(mcv).select(
        F.lit(col).alias("col_name"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(
            (F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"), 6
        ).alias("null_frac"),
        "n_distinct",
        "mcv_val",
        F.round(F.col("cnt") / F.col("n_nonnull"), 6).alias("mcv_freq"),
        "min_val",
        "max_val",
    )


def analyze_table(
    df: DataFrame,
    columns: list[str],
    sample_rows: int | None = None,
    id_col: str | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """pg_stats frame for `columns`. With sample_rows set, statistics
    come from a deterministic hash-order sample (analyze.cpp's
    bounded-sample protocol — stats are estimates by design there
    too); the caller-visible schema is identical either way."""
    if sample_rows is not None:
        key = id_col or df.columns[0]
        df = (
            df.orderBy(F.md5(F.col(key).cast("string")))
            .limit(sample_rows)
        )
    out = None
    for col in columns:
        part = analyze_column(df, col, exact_distinct=exact_distinct)
        out = part if out is None else out.unionByName(part)
    return out


def histogram_bounds(df: DataFrame, col: str, buckets: int = 10) -> list:
    """Equi-depth histogram bounds (pg_statistic's stavalues for
    STATISTIC_KIND_HISTOGRAM): exact percentiles at k/buckets."""
    fracs = [i / buckets for i in range(buckets + 1)]
    row = df.agg(
        F.expr(
            f"percentile({col}, array({', '.join(str(f) for f in fracs)}))"
        ).alias("b")
    ).collect()[0]
    return list(row.b)


def analyze_composite(df: DataFrame, cols: list[str]) -> DataFrame:
    """One extended-statistics row for the column GROUP (the
    reference's multi-column statistics — analyze.cpp's ES path):
    composite n_distinct, composite null fraction (a composite NULL is
    ALL members null, analyze.cpp:7561), and the top-1 multi-column
    MCV rendered as a '|'-joined string.  Same schema as
    analyze_column so single and extended rows union into one
    pg_stats frame."""
    all_null = None
    for c in cols:
        n = F.col(c).isNull()
        all_null = n if all_null is None else (all_null & n)
    combo = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(all_null, 1).otherwise(0)).alias("n_compnull"),
        F.count_distinct(*[F.col(c) for c in cols])
        .cast("bigint").alias("n_distinct"),
    )
    mcv = (
        df.filter(~all_null)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), combo)
        .limit(1)
        .select(combo.alias("mcv_val"), "cnt")
    )
    name = "(" + ",".join(cols) + ")"
    return base.crossJoin(mcv).select(
        F.lit(name).alias("col_name"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(F.col("n_compnull") / F.col("n_rows"), 6)
        .alias("null_frac"),
        "n_distinct",
        "mcv_val",
        F.round(
            F.col("cnt") / (F.col("n_rows") - F.col("n_compnull")), 6
        ).alias("mcv_freq"),
        F.lit(None).cast("string").alias("min_val"),
        F.lit(None).cast("string").alias("max_val"),
    )


# ------------------------------------------------------------------ DDL

_ANALYZE = re.compile(
    r"^\s*ANALYZE\s+(?:VERBOSE\s+)?(?P<table>\w+)\s*"
    r"(?:\(\s*(?P<cols>[\w\s,]+)\))?\s*;?\s*$",
    re.IGNORECASE,
)
# ALTER TABLE t ADD/DELETE STATISTICS ((a, b)) — the reference's
# extended-statistics declaration (gram.y:4807/4814
# ADD_P/DELETE_P STATISTICS '(' opt_multi_name_list ')')
_ADD_STATS = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>\w+)\s+ADD\s+STATISTICS\s*"
    r"\(\s*\(\s*(?P<cols>[\w\s,]+?)\s*\)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_DEL_STATS = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>\w+)\s+DELETE\s+STATISTICS\s*"
    r"\(\s*\(\s*(?P<cols>[\w\s,]+?)\s*\)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_EXT_STATS_SELECT = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+pg_ext_stats\s*;?\s*$", re.IGNORECASE
)


def _resolve_table(engine, name: str) -> DataFrame:
    if name in engine.managed_tables.tables:
        return engine.managed_tables.read(name)
    return engine.table(name)


def try_handle_stmt(engine, query: str) -> DataFrame | None:
    m = _EXT_STATS_SELECT.match(query)
    if m:
        rows = []
        for tbl, combos in sorted(engine.ext_stats.items()):
            for combo in combos:
                key = "(" + ",".join(combo) + ")"
                st = engine.statistics.get(tbl, {}).get(key)
                rows.append((
                    tbl, key,
                    st["n_rows"] if st else None,
                    st["n_distinct"] if st else None,
                    st["null_frac"] if st else None,
                    st["mcv_val"] if st else None,
                    st["mcv_freq"] if st else None,
                ))
        return engine.spark.createDataFrame(
            rows or [("", "", 0, 0, 0.0, "", 0.0)][:0],
            "tablename STRING, stakey STRING, n_rows BIGINT,"
            " n_distinct BIGINT, null_frac DOUBLE, mcv_val STRING,"
            " mcv_freq DOUBLE",
        )
    m = _ADD_STATS.match(query)
    if m:
        name = m.group("table").lower()
        _resolve_table(engine, name)  # existence check
        combo = tuple(
            c.strip().lower() for c in m.group("cols").split(",")
        )
        if len(combo) < 2:
            raise ValueError(
                "extended statistics take at least two columns"
            )
        combos = engine.ext_stats.setdefault(name, [])
        if combo not in combos:
            combos.append(combo)
        return status_frame(engine.spark, ("ADD STATISTICS", name, ",".join(combo)), "tag STRING, tbl STRING, cols STRING",)
    m = _DEL_STATS.match(query)
    if m:
        name = m.group("table").lower()
        combo = tuple(
            c.strip().lower() for c in m.group("cols").split(",")
        )
        combos = engine.ext_stats.get(name, [])
        existed = combo in combos
        if existed:
            combos.remove(combo)
            engine.statistics.get(name, {}).pop(
                "(" + ",".join(combo) + ")", None
            )
        return status_frame(engine.spark, ("DELETE STATISTICS", name, ",".join(combo), existed), "tag STRING, tbl STRING, cols STRING, existed BOOLEAN",)
    m = _ANALYZE.match(query)
    if m is None:
        return None
    name = m.group("table").lower()
    df = _resolve_table(engine, name)
    cols = (
        [c.strip() for c in m.group("cols").split(",")]
        if m.group("cols")
        else df.columns
    )
    stats = analyze_table(df, cols)
    # declared extended-statistics groups ride along with ANALYZE
    # (the reference computes ES in the same ANALYZE pass)
    for combo in engine.ext_stats.get(name, []):
        if all(c in df.columns for c in combo):
            stats = stats.unionByName(analyze_composite(df, list(combo)))
    rows = stats.collect()
    engine.statistics[name] = {r.col_name: r.asDict() for r in rows}
    return engine.spark.createDataFrame(rows, _STATS_SCHEMA)


# ---------------------------------------------------------------- queries

from ..catalog import table  # noqa: E402
from ..registry import query  # noqa: E402


def _col_stats_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND((COUNT(*) - COUNT({col})) * 1.0 / COUNT(*), 6)
             AS null_frac,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           (SELECT CAST(v AS VARCHAR) FROM (
              SELECT {col} AS v, COUNT(*) AS cnt FROM orders
              WHERE {col} IS NOT NULL GROUP BY {col}
              ORDER BY cnt DESC, CAST({col} AS VARCHAR) LIMIT 1))
             AS mcv_val,
           (SELECT ROUND(cnt * 1.0 / (SELECT COUNT({col}) FROM orders), 6)
            FROM (
              SELECT COUNT(*) AS cnt FROM orders
              WHERE {col} IS NOT NULL GROUP BY {col}
              ORDER BY cnt DESC, CAST({col} AS VARCHAR) LIMIT 1))
             AS mcv_freq,
           CAST(MIN({col}) AS VARCHAR) AS min_val,
           CAST(MAX({col}) AS VARCHAR) AS max_val
    FROM orders
    """


_ANALYZE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


@query(
    "analyze_table_stats",
    " UNION ALL ".join(_col_stats_sql(c) for c in _ANALYZE_COLS)
    + " ORDER BY col_name",
)
def analyze_table_stats(spark, sf_dir):
    """ANALYZE end-to-end (analyze.cpp :2184 std_typanalyze →
    pg_statistic :4416): per-column n_rows / stanullfrac / stadistinct
    / top-1 MCV + frequency / min-max over three orders columns, via
    the Engine's ``ANALYZE orders (cols)`` statement. The oracle
    recomputes every statistic independently in SQL — a hash match
    proves the whole stats pipeline (including the MCV count-then-value
    tie-break that makes the top-1 deterministic). Exercised at full
    scan + exact NDV so the comparison is exact; the sampled/approx
    operating point for 100 TB is the same code path
    (test_analyze_sampling)."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    out = eng.sql("ANALYZE orders (o_orderstatus, o_orderpriority, o_custkey)")
    assert "orders" in eng.statistics  # cached for the planner consumer
    return out.orderBy("col_name")


# --- Count-Min Sketch corpus counter (sketch family beside HLL) -----------

_CMS_EPS = 0.0001   # over-count bound: est <= exact + eps * N
_CMS_CONF = 0.99
_CMS_SEED = 42
_CMS_PROBES = ("the", "a", "of", "and", "to")  # text.py STOPWORDS


@query(
    "sketch_count_min_tokens",
    f"""
    WITH probes(tok) AS (
      VALUES {", ".join(f"('{t}')" for t in sorted(_CMS_PROBES))}
    ),
    toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents
    ),
    exact AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE t IN {str(_CMS_PROBES)} GROUP BY t
    )
    SELECT p.tok, COALESCE(e.n, 0) AS exact_n,
           TRUE AS no_undercount, TRUE AS within_eps
    FROM probes p LEFT JOIN exact e ON e.t = p.tok
    ORDER BY p.tok
    """,
)
def sketch_count_min_tokens(spark, sf_dir):
    """Count-Min Sketch token counting (Cormode & Muthukrishnan 2005)
    — the third mergeable sketch beside HLL (distinct) and KLL-style
    approx-percentile: Spark's native count_min_sketch aggregate builds
    the sketch distributed (cell-wise-additive merge, so the result is
    independent of partitioning), the ~100 KB summary ships to the
    driver, and point queries come from the JVM sketch.  The oracle
    pins the CMS guarantee against exact counts: estimates never
    undercount and overcount by at most eps x total tokens.  Reference:
    no CMS (its sketch surface is HLL, roaringbitmap_*); sketch-family
    LLM-pipeline extension.

    Scale: one map-side combinable aggregate over the exploded tokens —
    the shuffle carries partial sketches (width x depth counters), not
    token rows; queries are O(depth) driver lookups."""
    from .text import tokens as _tokens

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    row = toks.agg(
        F.count_min_sketch(
            F.col("tok"), F.lit(_CMS_EPS), F.lit(_CMS_CONF),
            F.lit(_CMS_SEED),
        ).alias("s"),
        F.count(F.lit(1)).alias("n_total"),
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row.s))
    )
    exact = {
        r.tok: r.exact_n
        for r in toks.filter(F.col("tok").isin(*_CMS_PROBES))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n")).collect()
    }
    bound = _CMS_EPS * row.n_total
    out = [
        (
            t,
            int(exact.get(t, 0)),
            cms.estimateCount(t) >= exact.get(t, 0),
            cms.estimateCount(t) <= exact.get(t, 0) + bound,
        )
        for t in sorted(_CMS_PROBES)
    ]
    return spark.createDataFrame(
        out,
        "tok STRING, exact_n BIGINT, no_undercount BOOLEAN,"
        " within_eps BOOLEAN",
    )


@query(
    "extended_statistics_scan",
    """
    WITH base AS (
      SELECT o_orderstatus, o_orderpriority FROM orders
      WHERE o_orderkey <= 4000
    ),
    grp AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM base GROUP BY o_orderstatus, o_orderpriority
    ),
    top1 AS (
      SELECT o_orderstatus || '|' || o_orderpriority AS mcv_val, cnt
      FROM grp
      ORDER BY cnt DESC, o_orderstatus || '|' || o_orderpriority
      LIMIT 1
    )
    SELECT '(o_orderstatus,o_orderpriority)' AS stakey,
           CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM grp) AS BIGINT) AS n_distinct,
           CAST(0.0 AS DOUBLE) AS null_frac,
           mcv_val,
           CAST(ROUND(cnt * 1.0 / (SELECT COUNT(*) FROM base), 6)
                AS DOUBLE) AS mcv_freq
    FROM top1
    """,
)
def extended_statistics_scan(spark, sf_dir):
    """Multi-column (extended) statistics end-to-end (gram.y:4807
    ALTER TABLE ... ADD STATISTICS ((a, b)); analyze.cpp's ES pass —
    composite ndv, composite-NULL fraction per :7561, multi-column
    MCV): declare the group on a managed copy, ANALYZE computes it in
    the same pass as the single-column rows, pg_ext_stats serves it
    back.  The oracle recomputes composite ndv and the top-1 group
    directly.  Scale: ONE extra groupBy per declared group inside the
    ANALYZE job — the estimator's cost, not the query path's."""
    import shutil
    import tempfile

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="es_gate_")
    eng.managed_tables.root = tmp
    try:
        eng.sql(
            "CREATE TABLE es_t AS SELECT o_orderstatus,"
            " o_orderpriority FROM orders WHERE o_orderkey <= 4000"
        )
        eng.sql(
            "ALTER TABLE es_t ADD STATISTICS"
            " ((o_orderstatus, o_orderpriority))"
        )
        eng.sql("ANALYZE es_t")
        out = eng.sql("SELECT * FROM pg_ext_stats")
        rows = [
            (r.stakey, r.n_rows, r.n_distinct, float(r.null_frac),
             r.mcv_val, float(r.mcv_freq))
            for r in out.collect()
        ]
        eng.sql("DROP TABLE es_t PURGE")
        return spark.createDataFrame(
            rows,
            "stakey STRING, n_rows BIGINT, n_distinct BIGINT,"
            " null_frac DOUBLE, mcv_val STRING, mcv_freq DOUBLE",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
