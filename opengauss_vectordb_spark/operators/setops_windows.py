"""Set operations, window functions, grouping sets, ordered-set aggregates,
scalar function families, and the long-tail operator surface of SURVEY.md
§2.4-§2.7:

  SetOp (nodeSetOp.cpp / vecsetop.cpp)         → intersect/except/union
  WindowAgg (nodeWindowAgg.cpp, windowfuncs.cpp)→ rank/lag/frames/ntile
  GROUPING SETS / ROLLUP / CUBE (gram.y:24424) → rollup()/cube()
  ordered-set aggs (orderedsetaggs.cpp:222)    → percentile/median
  first/last (first_last_agg.cpp)              → min_by/max_by
  string_agg/array_agg (varlena.cpp)           → collect_list + sort
  conditional funcs (a_compat.cpp: nvl/decode) → native Spark SQL fns
  string/date/JSON families (§2.7)             → near-1:1 Spark builtins
  SampleScan REPEATABLE (nodeSamplescan.cpp)   → md5-hash deterministic
  RecursiveUnion (nodeRecursiveunion.cpp)      → driver-side fixpoint loop
  StartWithOp CONNECT BY (nodeStartWithOp.cpp) → iterative self-join
  Limit/Offset (nodeLimit.cpp)                 → limit()/offset()
  ValuesScan (nodeValuesscan.cpp)              → createDataFrame
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ._util import status_frame, dsum, dsum6, sql_dsum

# --- set operations (nodeSetOp.cpp: INTERSECT/EXCEPT hashed or sorted) ----


@query(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect(spark, sf_dir):
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "setop_except",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    ORDER BY custkey
    """,
)
def setop_except(spark, sf_dir):
    # ordering customers minus positive-balance customers: non-empty on
    # the synthetic data (the original "customers without orders" form
    # was vacuously empty — every customer has orders — so its gate row
    # hash-matched an empty oracle and proved nothing)
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c).orderBy("custkey")


@query(
    "setop_union_distinct",
    """
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) u GROUP BY nationkey ORDER BY nationkey
    """,
)
def setop_union_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


# --- window functions (nodeWindowAgg.cpp; adt/windowfuncs.cpp) ------------


@query(
    "window_topn_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3 ORDER BY o_orderpriority, rn
    """,
)
def window_topn_per_group(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_moving_frames",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving3_total,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_moving_frames(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(price_dec)
        .over(w.rowsBetween(-2, W.currentRow))
        .cast("double")
        .alias("moving3_total"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("cust_orders"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_rank_dist",
    """
    SELECT s_suppkey, s_acctbal,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def window_rank_dist(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("s_suppkey")


@query(
    "window_first_last_value",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_value(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w_full).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    ).orderBy("o_custkey", "o_orderkey")


# --- grouping sets / rollup / cube (gram.y:24424-24441; nodeAgg phases) ---


@query(
    "agg_rollup",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def agg_rollup(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            (F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")).alias(
                "gid"
            ),
            F.count(F.lit(1)).alias("n"),
            dsum6(F.col("o_totalprice"), "total"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n", "total")
        .orderBy(
            "gid",
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n, {sql_dsum('l_quantity', 'qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum6(F.col("l_quantity"), "qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "qty")
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- DISTINCT aggregates (nodeAgg.cpp DISTINCT-inside-aggregate) ----------


@query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.sum_distinct(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- ordered-set aggregates (orderedsetaggs.cpp:222,278; median_aggs.cpp) -


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.9) AS p90,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("p25"),
            F.percentile("l_quantity", 0.5).alias("p50"),
            F.percentile("l_quantity", 0.9).alias("p90"),
            F.median("l_quantity").alias("median_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_percentiles",
    """
    WITH ex AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS exact_p50,
             quantile_cont(l_extendedprice, 0.9) AS exact_p90,
             quantile_cont(l_extendedprice, 0.1) AS exact_p10
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, exact_p50, exact_p90,
           TRUE AS p50_in_envelope, TRUE AS p90_in_envelope,
           TRUE AS p10_in_envelope
    FROM ex ORDER BY l_returnflag
    """,
)
def agg_approx_percentiles(spark, sf_dir):
    """approx_percentile — the sketch-based quantile the 100 TB path uses
    (one pass, mergeable state, no per-group sort; Spark's
    Greenwald-Khanna vs the reference's exact ordered-set aggregate
    percentile_cont, orderedsetaggs.cpp:222). Sketch internals are
    engine-specific, so — like the HLL gate — the compared values are
    the EXACT quantiles plus booleans asserting each approx estimate
    landed within 5% relative error of exact (deterministic: the sketch
    is a pure merge-order-insensitive function of the input multiset at
    a fixed accuracy parameter)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        F.percentile("l_extendedprice", 0.9).alias("exact_p90"),
        F.percentile("l_extendedprice", 0.1).alias("exact_p10"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_a50"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("_a90"),
        F.percentile_approx("l_extendedprice", 0.1, 10000).alias("_a10"),
    )
    within = lambda a, e: F.abs(a - e) <= 0.05 * F.abs(e)  # noqa: E731
    return agg.select(
        "l_returnflag",
        "exact_p50",
        "exact_p90",
        within(F.col("_a50"), F.col("exact_p50")).alias("p50_in_envelope"),
        within(F.col("_a90"), F.col("exact_p90")).alias("p90_in_envelope"),
        within(F.col("_a10"), F.col("exact_p10")).alias("p10_in_envelope"),
    ).orderBy("l_returnflag")


@query(
    "agg_mode_percentile_disc",
    """
    WITH c AS (
      SELECT l_returnflag AS flag, l_quantity AS q, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ), m AS (
      SELECT flag, q, cnt,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cnt DESC, q)
               AS rn,
             SUM(cnt) OVER (PARTITION BY flag ORDER BY q) AS cum,
             SUM(cnt) OVER (PARTITION BY flag) AS tot
      FROM c
    )
    SELECT flag,
           MAX(CASE WHEN rn = 1 THEN q END) AS mode_qty,
           MAX(CASE WHEN rn = 1 THEN cnt END) AS mode_n,
           MIN(CASE WHEN cum * 2 >= tot THEN q END) AS p50_disc
    FROM m GROUP BY flag ORDER BY flag
    """,
)
def agg_mode_percentile_disc(spark, sf_dir):
    """mode() and percentile_disc(0.5) (orderedsetaggs.cpp:278,222) with
    an explicit deterministic tie-break (highest count, then smallest
    value) instead of engine-specific mode internals — the distributed
    shape is a count aggregation plus two windows over the (group,
    value) pairs, i.e. cardinality of distinct values, not rows."""
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("q")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wp = W.partitionBy("flag")
    m = c.select(
        "flag",
        "q",
        "cnt",
        F.row_number()
        .over(wp.orderBy(F.col("cnt").desc(), F.col("q")))
        .alias("rn"),
        F.sum("cnt").over(wp.orderBy("q")).alias("cum"),
        F.sum("cnt").over(wp).alias("tot"),
    )
    return (
        m.groupBy("flag")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("q"))).alias("mode_qty"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt"))).alias("mode_n"),
            F.min(
                F.when(F.col("cum") * 2 >= F.col("tot"), F.col("q"))
            ).alias("p50_disc"),
        )
        .orderBy("flag")
    )


@query(
    "agg_stddev_var",
    """
    SELECT o_orderstatus,
           ROUND(stddev_samp(o_totalprice), 4) AS sd_samp,
           ROUND(var_samp(o_totalprice), 4) AS v_samp,
           ROUND(stddev_pop(o_totalprice), 4) AS sd_pop,
           ROUND(var_pop(o_totalprice), 4) AS v_pop
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_stddev_var(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_samp"),
            F.round(F.var_samp("o_totalprice"), 4).alias("v_samp"),
            F.round(F.stddev_pop("o_totalprice"), 4).alias("sd_pop"),
            F.round(F.var_pop("o_totalprice"), 4).alias("v_pop"),
        )
        .orderBy("o_orderstatus")
    )


# --- first/last → min_by/max_by (adt/first_last_agg.cpp) ------------------


@query(
    "agg_min_max_by",
    """
    SELECT o_orderpriority,
           min_by(o_orderkey, strftime(o_orderdate, '%Y%m%d') || '-'
                  || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS first_orderkey,
           max_by(o_orderkey, strftime(o_orderdate, '%Y%m%d') || '-'
                  || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS last_orderkey,
           max_by(o_custkey, printf('%018.2f', o_totalprice) || '-'
                  || lpad(CAST(o_custkey AS VARCHAR), 12, '0')) AS biggest_spender
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_min_max_by(spark, sf_dir):
    # min_by/max_by need a totally-ordered key for determinism under ties
    # (duplicate dates / prices); a fixed-width sortable string composite
    # (value + unique key) orders identically in every engine.
    o = table(spark, sf_dir, "orders")
    date_key = F.concat(
        F.date_format("o_orderdate", "yyyyMMdd"),
        F.lit("-"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    price_key = F.concat(
        F.format_string("%018.2f", F.col("o_totalprice")),
        F.lit("-"),
        F.lpad(F.col("o_custkey").cast("string"), 12, "0"),
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", date_key).alias("first_orderkey"),
            F.max_by("o_orderkey", date_key).alias("last_orderkey"),
            F.max_by("o_custkey", price_key).alias("biggest_spender"),
        )
        .orderBy("o_orderpriority")
    )


# --- string_agg / array_agg (varlena.cpp, array_userfuncs.cpp) ------------


@query(
    "agg_orderby_sql_text",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
           string_agg(n_name, '|' ORDER BY n_nationkey DESC)
             AS by_key_desc,
           array_to_string(array_agg(n_name ORDER BY n_name), '/')
             AS names_arr
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_orderby_sql_text(spark, sf_dir):
    """PG's ORDER-BY-INSIDE-AGGREGATE spelling as SQL TEXT through
    Engine.sql (varlena.cpp string_agg / array_userfuncs.cpp
    array_agg; `_rewrite_agg_orderby` in functions/sql_compat.py):
    string_agg lowers to Spark's native listagg WITHIN GROUP (DESC
    keys ride through), array_agg to a struct-keyed array_sort
    projection.  DuckDB runs the PG spelling VERBATIM as the oracle,
    so a green row proves order, separator, and key-direction parity.

    Scale: both lower to Spark's own ordered-aggregate machinery —
    one partial/final aggregation, order resolved inside the
    aggregate buffer, no extra shuffle."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql("""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
               string_agg(n_name, '|' ORDER BY n_nationkey DESC)
                 AS by_key_desc,
               array_to_string(array_agg(n_name ORDER BY n_name), '/')
                 AS names_arr
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """)


@query(
    "agg_string_array",
    """
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def agg_string_array(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


# --- conditional functions (a_compat.cpp: nvl/nvl2/decode; misc.cpp) ------


@query(
    "conditional_funcs",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(redacted)') AS segment,
           GREATEST(c_acctbal, 0.0) AS pos_bal,
           LEAST(c_acctbal, 1000.0) AS capped_bal,
           CASE c_nationkey % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                ELSE 'gamma' END AS decoded,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'ok' ELSE 'rich' END AS bucket
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def conditional_funcs(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    # nvl/nvl2/decode exist in Spark SQL under their PG/Oracle names
    # (a_compat.cpp parity); expressed here via the expr() SQL surface.
    return c.select(
        "c_custkey",
        F.expr("nvl(nullif(c_mktsegment, 'BUILDING'), '(redacted)')").alias("segment"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"),
        F.least("c_acctbal", F.lit(1000.0)).alias("capped_bal"),
        F.expr(
            "decode(c_nationkey % 3, 0, 'alpha', 1, 'beta', 'gamma')"
        ).alias("decoded"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "ok")
        .otherwise("rich")
        .alias("bucket"),
    ).orderBy("c_custkey")


# --- scalar function families (§2.7): string / date / JSON ----------------


@query(
    "string_funcs",
    """
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           substring(p_name, 1, 8) AS sub8,
           length(p_name) AS len,
           replace(p_type, 'O', '0') AS repl,
           split_part(p_brand, '#', 2) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           reverse(p_brand) AS rev,
           strpos(p_name, 'a') AS pos_a,
           concat(p_brand, ':', p_type) AS tagged,
           trim(' x ') AS trimmed,
           translate(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
           array_to_string(list_transform(string_split(lower(p_name), ' '),
               w -> upper(w[1]) || w[2:]), ' ') AS name_initcap,
           substr(p_brand, 1, 1) || 'XX' || substr(p_brand, 4)
             AS brand_overlay,
           repeat(p_brand, 2) AS brand_twice,
           left(p_name, 3) AS name_left3,
           right(p_name, 3) AS name_right3,
           ascii(upper(substring(p_name, 1, 1))) AS first_ascii,
           chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS chr_k
    FROM part WHERE p_partkey <= 50 ORDER BY p_partkey
    """,
)
def string_funcs(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 8).alias("sub8"),
        F.length("p_name").alias("len"),
        F.expr("replace(p_type, 'O', '0')").alias("repl"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.reverse("p_brand").alias("rev"),
        F.instr(F.col("p_name"), "a").alias("pos_a"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tagged"),
        F.trim(F.lit(" x ")).alias("trimmed"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias("lowered_vowels"),
        F.initcap("p_name").alias("name_initcap"),
        F.overlay(F.col("p_brand"), F.lit("XX"), F.lit(2), F.lit(2)).alias(
            "brand_overlay"
        ),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.expr("left(p_name, 3)").alias("name_left3"),
        F.expr("right(p_name, 3)").alias("name_right3"),
        F.ascii(F.upper(F.substring("p_name", 1, 1))).alias("first_ascii"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias(
            "chr_k"
        ),
    ).orderBy("p_partkey")


@query(
    "date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           day(o_orderdate) AS dy, quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
             AS days_to_y2k,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           (year(o_orderdate) * 12 + month(o_orderdate))
             - (1995 * 12 + 1) AS whole_months_since_95,
           make_date(1995, month(o_orderdate), 15) AS made,
           (CAST(o_orderdate AS DATE) < DATE '1997-01-01'
            AND DATE '1996-01-01' < CAST(o_orderdate AS DATE) + 90)
             AS overlaps_1996,
           dayofweek(CAST(o_orderdate AS DATE)) AS dow
    FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey
    """,
)
def date_funcs(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.last_day(d).alias("month_end"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (1995 * 12 + 1)
        ).alias("whole_months_since_95"),
        F.make_date(F.lit(1995), F.month("o_orderdate"), F.lit(15)).alias(
            "made"
        ),
        # (start1, end1) OVERLAPS (start2, end2) spelled as the
        # half-open-interval conjunction both engines agree on
        ((d < F.lit("1997-01-01").cast("date"))
         & (F.lit("1996-01-01").cast("date") < F.date_add(d, 90))).alias(
            "overlaps_1996"
        ),
        # PG/DuckDB convention: Sunday=0 (Spark's dayofweek is Sunday=1)
        (F.dayofweek(d) - 1).alias("dow"),
    ).orderBy("o_orderkey")


@query(
    "json_funcs",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_funcs(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k.cast("decimal(18,6)")).cast("double").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --- math functions (float.cpp / numeric.cpp / int.cpp) -------------------


@query(
    "math_funcs",
    """
    SELECT o_orderkey,
           ROUND(abs(o_totalprice - 100000.0), 2) AS dist_from_100k,
           CAST(CEIL(o_totalprice) AS BIGINT) AS ceiled,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS floored,
           ROUND(o_totalprice, -2) AS to_hundreds,
           ROUND(sqrt(o_totalprice), 6) AS sqrt_price,
           ROUND(ln(o_totalprice), 6) AS ln_price,
           ROUND(log10(o_totalprice), 6) AS log10_price,
           ROUND(power(o_totalprice, 0.5), 6) AS pow_half,
           MOD(o_orderkey, 7) AS mod7,
           CAST(SIGN(o_totalprice - 150000.0) AS INTEGER) AS sign_vs_150k,
           ROUND(sin(o_orderkey * 0.1), 6) AS sin_k,
           ROUND(atan2(CAST(o_orderkey AS DOUBLE), 10.0), 6) AS atan2_k,
           ROUND(cbrt(o_totalprice), 6) AS cbrt_price,
           ROUND(exp(o_orderkey * 0.01), 6) AS exp_k,
           CAST(factorial(CAST(o_orderkey % 10 AS INTEGER)) AS BIGINT)
             AS fact_mod10,
           CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 400000.0 THEN 9
                ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1
           END AS price_bucket
    FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey
    """,
)
def math_funcs(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(tp - 100000.0), 2).alias("dist_from_100k"),
        F.ceil(tp).alias("ceiled"),
        F.floor(tp).alias("floored"),
        F.round(tp, -2).alias("to_hundreds"),
        F.round(F.sqrt(tp), 6).alias("sqrt_price"),
        F.round(F.log(tp), 6).alias("ln_price"),
        F.round(F.log10(tp), 6).alias("log10_price"),
        F.round(F.pow(tp, 0.5), 6).alias("pow_half"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.signum(tp - 150000.0).cast("int").alias("sign_vs_150k"),
        F.round(F.sin(F.col("o_orderkey") * 0.1), 6).alias("sin_k"),
        F.round(
            F.atan2(F.col("o_orderkey").cast("double"), F.lit(10.0)), 6
        ).alias("atan2_k"),
        F.round(F.cbrt(tp), 6).alias("cbrt_price"),
        F.round(F.exp(F.col("o_orderkey") * 0.01), 6).alias("exp_k"),
        F.factorial((F.col("o_orderkey") % 10).cast("int")).alias(
            "fact_mod10"
        ),
        F.width_bucket(tp, F.lit(0.0), F.lit(400000.0), F.lit(8)).alias(
            "price_bucket"
        ),
    ).orderBy("o_orderkey")


# --- hashing / encoding (adt/encode.cpp) ----------------------------------


@query(
    "hash_encode_funcs",
    """
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           to_base64(encode(c_mktsegment)) AS seg_b64,
           hex(encode(c_mktsegment)) AS seg_hex,
           sha256(c_name) AS name_sha256,
           decode(from_base64(to_base64(encode(c_name)))) AS b64_roundtrip
    FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey
    """,
)
def hash_encode_funcs(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 20)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.base64(F.col("c_mktsegment").cast("binary")).alias("seg_b64"),
        F.upper(F.hex(F.col("c_mktsegment").cast("binary"))).alias("seg_hex"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
        F.unbase64(F.base64(F.col("c_name").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
    ).orderBy("c_custkey")


# --- deterministic sample (nodeSamplescan.cpp BERNOULLI REPEATABLE) -------


@query(
    "sample_deterministic",
    """
    SELECT COUNT(*) AS sample_size,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sample_bal
    FROM customer
    WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '29'
    """,
)
def sample_deterministic(spark, sf_dir):
    # BERNOULLI(~16%) REPEATABLE: md5 of the key is a seeded uniform hash
    # that both engines compute identically — a portable REPEATABLE sample.
    c = table(spark, sf_dir, "customer")
    return c.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 2)
        < "29"
    ).agg(
        F.count(F.lit(1)).alias("sample_size"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("double")
        .alias("sample_bal"),
    )


# --- limit / offset (nodeLimit.cpp; Spark 3.4+ offset) --------------------


@query(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(10)
    )


# --- VALUES scan (nodeValuesscan.cpp) -------------------------------------


@query(
    "values_scan",
    """
    SELECT v.region_name, COUNT(n.n_nationkey) AS nations
    FROM (VALUES ('ASIA'), ('EUROPE'), ('ATLANTIS')) AS v(region_name)
    LEFT JOIN region r ON r.r_name = v.region_name
    LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY v.region_name ORDER BY v.region_name
    """,
)
def values_scan(spark, sf_dir):
    v = spark.createDataFrame(
        [("ASIA",), ("EUROPE",), ("ATLANTIS",)], ["region_name"]
    )
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        v.join(F.broadcast(r), v.region_name == r.r_name, "left_outer")
        .join(F.broadcast(n), F.col("n_regionkey") == F.col("r_regionkey"), "left_outer")
        .groupBy("region_name")
        .agg(F.count("n_nationkey").alias("nations"))
        .orderBy("region_name")
    )


# --- full outer join (JOIN_FULL in vechashjoin.cpp:639-670) ---------------


@query(
    "join_full_outer",
    """
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COUNT(DISTINCT c.c_custkey) AS customers,
           COUNT(DISTINCT s.s_suppkey) AS suppliers
    FROM (SELECT * FROM customer WHERE c_nationkey < 10) c
    FULL OUTER JOIN (SELECT * FROM supplier WHERE s_nationkey >= 5) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
    ORDER BY nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") >= 5)
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"))
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.countDistinct("s_suppkey").alias("suppliers"),
        )
        .orderBy("nationkey")
    )


# --- recursive union (nodeRecursiveunion.cpp): WITH RECURSIVE fixpoint ----


@query(
    "recursive_series",
    """
    WITH RECURSIVE t(n, fact) AS (
      SELECT 1, 1
      UNION ALL
      SELECT n + 1, fact * (n + 1) FROM t WHERE n < 12
    )
    SELECT n, fact FROM t ORDER BY n
    """,
)
def recursive_series(spark, sf_dir):
    # Driver-side fixpoint loop — the Spark-native RecursiveUnion: iterate
    # until the working table is empty (here a bounded arithmetic series).
    current = status_frame(spark, (1, 1), "n INT, fact INT")
    acc = current
    for _ in range(11):
        current = current.select(
            (F.col("n") + 1).alias("n"), (F.col("fact") * (F.col("n") + 1)).alias("fact")
        ).filter(F.col("n") <= 12)
        acc = acc.unionAll(current)
    return acc.orderBy("n")


@query(
    "bucketed_join_colocated",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def bucketed_join_colocated(spark, sf_dir):
    """Fact-to-fact join over hash-bucketed tables (bucketpruning.cpp /
    Stream redistribute parity, sources/bucketed.py): orders and lineitem
    are pre-bucketed+sorted on the join key, so the equi-join runs with
    ZERO pre-join exchanges and no sort — the write-once shuffle is
    amortized over every later join, which is the layout a 100 TB
    deployment would use. Results are identical to the plain join (the
    oracle); the plan difference is pinned in test_plan_quality."""
    from ..sources.bucketed import bucketed_tables

    ob, lb = bucketed_tables(spark, sf_dir)
    o = spark.table(ob)
    li = spark.table(lb)
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum6(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "recursive_cte_native",
    """
    WITH RECURSIVE up(start_k, k, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey <= 40
      UNION ALL
      SELECT start_k, k // 2, depth + 1 FROM up WHERE k > 1
    )
    SELECT start_k, MAX(depth) AS steps_to_root,
           CAST(SUM(k) AS BIGINT) AS path_sum
    FROM up GROUP BY start_k ORDER BY start_k
    """,
)
def recursive_cte_native(spark, sf_dir):
    """RecursiveUnion (nodeRecursiveunion.cpp) through Spark 4's native
    WITH RECURSIVE — data-dependent depth (each part walks its binary
    ancestry k -> k div 2 until the root), which a bounded driver loop
    cannot express; the engine iterates the working table to fixpoint.
    Complements `recursive_series` (driver-side fixpoint strategy)."""
    table(spark, sf_dir, "part").createOrReplaceTempView("rec_part_src")
    return spark.sql(
        """
        WITH RECURSIVE up(start_k, k, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM rec_part_src
          WHERE p_partkey <= 40
          UNION ALL
          SELECT start_k, k div 2, depth + 1 FROM up WHERE k > 1
        )
        SELECT start_k, MAX(depth) AS steps_to_root,
           CAST(SUM(k) AS BIGINT) AS path_sum
        FROM up GROUP BY start_k ORDER BY start_k
        """
    )


# --- START WITH / CONNECT BY (nodeStartWithOp.cpp): hierarchy walk --------


@query(
    "connect_by_hierarchy",
    """
    WITH RECURSIVE h(nodekey, label, lvl, path) AS (
      SELECT r_regionkey, r_name, 1, r_name FROM region
      UNION ALL
      SELECT n.n_nationkey, n.n_name, h.lvl + 1, h.path || '/' || n.n_name
      FROM nation n JOIN h ON n.n_regionkey = h.nodekey AND h.lvl = 1
    )
    SELECT label, lvl, path FROM h ORDER BY lvl, label
    """,
)
def connect_by_hierarchy(spark, sf_dir):
    # CONNECT BY over the region→nation hierarchy as an iterative
    # self-join with an accumulated LEVEL and SYS_CONNECT_BY_PATH.
    r = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("nodekey"),
        F.col("r_name").alias("label"),
        F.lit(1).alias("lvl"),
        F.col("r_name").alias("path"),
    )
    n = table(spark, sf_dir, "nation")
    level2 = (
        n.join(r, n.n_regionkey == r.nodekey)
        .select(
            F.col("n_nationkey").alias("nodekey"),
            F.col("n_name").alias("label"),
            (F.col("lvl") + 1).alias("lvl"),
            F.concat(F.col("path"), F.lit("/"), F.col("n_name")).alias("path"),
        )
    )
    return r.unionAll(level2).select("label", "lvl", "path").orderBy("lvl", "label")


@query(
    "connect_by_path_funcs",
    """
    WITH l1 AS (
      SELECT r_regionkey AS nodekey, r_name AS label, 1 AS lvl,
             '/' || r_name AS path, r_name AS root
      FROM region
    ), l2 AS (
      SELECT n.n_nationkey AS nodekey, n.n_name AS label, 2 AS lvl,
             h.path || '/' || n.n_name AS path, h.root AS root
      FROM nation n JOIN l1 h ON n.n_regionkey = h.nodekey
    ), l3 AS (
      SELECT s.s_suppkey AS nodekey, s.s_name AS label, 3 AS lvl,
             h.path || '/' || s.s_name AS path, h.root AS root
      FROM supplier s JOIN l2 h ON s.s_nationkey = h.nodekey
      WHERE s.s_suppkey < 40
    ), h AS (
      SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
    )
    SELECT label, lvl, path, root FROM h ORDER BY path
    """,
)
def connect_by_path_funcs(spark, sf_dir):
    """START WITH / CONNECT BY path functions (parse_startwith.cpp):
    SYS_CONNECT_BY_PATH(label, '/') accumulates the root-to-node path
    and CONNECT_BY_ROOT carries the anchor row's value down the walk —
    both are just columns threaded through the iterative level join, the
    same shape nodeStartWithOp.cpp materializes per pseudo-column. Walk:
    region → nation → supplier (3 levels)."""
    r = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("nodekey"),
        F.col("r_name").alias("label"),
        F.lit(1).alias("lvl"),
        F.concat(F.lit("/"), F.col("r_name")).alias("path"),
        F.col("r_name").alias("root"),
    )
    n = table(spark, sf_dir, "nation")
    l2 = n.join(r, n.n_regionkey == r.nodekey).select(
        F.col("n_nationkey").alias("nodekey"),
        F.col("n_name").alias("label"),
        F.lit(2).alias("lvl"),
        F.concat(F.col("path"), F.lit("/"), F.col("n_name")).alias("path"),
        F.col("root"),
    )
    s = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 40)
    l3 = s.join(l2, s.s_nationkey == l2.nodekey).select(
        F.col("s_suppkey").alias("nodekey"),
        F.col("s_name").alias("label"),
        F.lit(3).alias("lvl"),
        F.concat(F.col("path"), F.lit("/"), F.col("s_name")).alias("path"),
        F.col("root"),
    )
    return (
        r.unionAll(l2)
        .unionAll(l3)
        .select("label", "lvl", "path", "root")
        .orderBy("path")
    )


@query(
    "start_with_sql_text",
    """
    WITH RECURSIVE hier AS (
      SELECT CAST(r_regionkey + 1 AS BIGINT) AS id,
             CAST(0 AS BIGINT) AS pid, r_name AS name FROM region
      UNION ALL
      SELECT CAST(10 + n_nationkey AS BIGINT),
             CAST(n_regionkey + 1 AS BIGINT), n_name FROM nation
    ),
    walk AS (
      SELECT id, pid, name, 1 AS lvl, '/' || name AS path, name AS root
      FROM hier WHERE pid = 0
      UNION ALL
      SELECT h.id, h.pid, h.name, w.lvl + 1, w.path || '/' || h.name,
             w.root
      FROM hier h JOIN walk w ON h.pid = w.id
    )
    SELECT w.name, w.lvl, w.path, w.root,
           CASE WHEN EXISTS (SELECT 1 FROM walk c WHERE c.pid = w.id)
                THEN 0 ELSE 1 END AS isleaf
    FROM walk w ORDER BY path
    """,
)
def start_with_sql_text(spark, sf_dir):
    """START WITH / CONNECT BY as SQL TEXT through Engine.sql
    (parse_startwith.cpp transformStartWith; the sw_basic.sql regress
    family): the hierarchical clause compiles to Spark's native WITH
    RECURSIVE — the same CTE transform the reference performs before
    planning — with LEVEL, SYS_CONNECT_BY_PATH, CONNECT_BY_ROOT and
    CONNECT_BY_ISLEAF threaded through the recursion as accumulated
    columns (operators/start_with.py).  The oracle is the hand-written
    recursive CTE, so a green row proves the whole desugar: anchor
    selection, join direction (PRIOR id = pid), per-level accumulation,
    and the isleaf anti-join.

    Scale: each level is ONE distributed equi-join of the base relation
    against the frontier — the exact plan the reference's own transform
    yields, with AQE sizing every level's shuffle."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS gate_sw_hier")
    eng.sql("""
        CREATE TABLE gate_sw_hier AS
        SELECT CAST(r_regionkey + 1 AS BIGINT) AS id,
               CAST(0 AS BIGINT) AS pid, r_name AS name FROM region
        UNION ALL
        SELECT CAST(10 + n_nationkey AS BIGINT),
               CAST(n_regionkey + 1 AS BIGINT), n_name FROM nation
    """)
    return eng.sql("""
        SELECT name, LEVEL AS lvl,
               sys_connect_by_path(name, '/') AS path,
               connect_by_root(name) AS root,
               connect_by_isleaf AS isleaf
        FROM gate_sw_hier
        START WITH pid = 0
        CONNECT BY PRIOR id = pid
        ORDER BY path
    """)


# --- approx count distinct (hll_function.cpp:560,590) — rows-only check ---


@query(
    "hll_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_suppliers,
           TRUE AS parts_in_envelope,
           TRUE AS suppliers_in_envelope
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def hll_approx_distinct(spark, sf_dir):
    """hll_cardinality (hll_function.cpp:560): HLL sketches are
    engine-specific (Spark's HLL++ vs the reference's hll.cpp) so the
    estimate itself cannot be value-compared; instead the gated output
    carries the EXACT distinct counts plus booleans asserting the sketch
    estimate landed within a 5% envelope of them (deterministic: HLL++
    is a pure, merge-order-independent function of the input set). The
    oracle computes the exact counts and expects the envelope to hold.
    pytest pins the tighter ≤2% rsd envelope."""
    li = table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx.cast("double") - exact.cast("double"))
        <= 0.05 * exact.cast("double")
    )
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("_as"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        within(F.col("_ap"), F.col("exact_parts")).alias("parts_in_envelope"),
        within(F.col("_as"), F.col("exact_suppliers")).alias(
            "suppliers_in_envelope"
        ),
    ).orderBy("l_returnflag")


@query(
    "hll_union_reaggregate",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS union_in_envelope
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def hll_union_reaggregate(spark, sf_dir):
    """hll_union_agg / hll_cardinality (hll_function.cpp:560,590): build
    per-(flag,status) HLL sketches, then UNION the sketches per flag and
    estimate — the sketch-reaggregation path that lets 100 TB rollups
    reuse finer-grained sketches instead of rescanning raw data. Engine
    sketches differ bit-wise from the reference's hll.cpp, so the gated
    values are the EXACT per-flag counts plus a boolean asserting the
    sketch-union estimate landed within 5% of exact (deterministic:
    sketch registers are max-merged, so union order is immaterial).
    pytest additionally pins union estimate == direct estimate."""
    li = table(spark, sf_dir, "lineitem")
    per_status = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
    )
    unioned = per_status.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx"),
        F.sum("n").alias("n_rows"),
    )
    return (
        unioned.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "exact_parts",
            (
                F.abs(F.col("_approx").cast("double") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("union_in_envelope"),
        )
        .orderBy("l_returnflag")
    )


# --- pivot (conditional aggregation; vec_agg suites exercise the CASE
# form — Spark's pivot() produces the same plan) -----------------------


@query(
    "pivot_status_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
             AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
             AS qty_F
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_status_counts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
        )
        .select(
            "l_returnflag",
            F.col("O_cnt").alias("O"),
            F.col("F_cnt").alias("F"),
            F.col("O_qty").alias("qty_O"),
            F.col("F_qty").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


# --- bool_and/bool_or/bit_and/bit_or aggregates (builtin_funcs.ini) -------


@query(
    "agg_bool_bit",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           bit_and(o_orderkey) AS key_bit_and,
           bit_or(o_custkey % 256) AS cust_bit_or
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool_bit(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bit_and("o_orderkey").alias("key_bit_and"),
            F.bit_or(F.col("o_custkey") % 256).alias("cust_bit_or"),
        )
        .orderBy("o_orderstatus")
    )


# --- null ordering semantics (SURVEY §7: PG defaults NULLS LAST on ASC,
# Spark defaults NULLS FIRST — always explicit in this engine) -------------


@query(
    "null_ordering",
    """
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer WHERE c_custkey <= 40
    ORDER BY seg ASC NULLS LAST, c_custkey
    """,
)
def null_ordering(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 40)
    return c.select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    ).orderBy(F.col("seg").asc_nulls_last(), F.col("c_custkey"))


# --- RANGE frames (nodeWindowAgg.cpp:710-753 value-based frames) ----------


@query(
    "window_range_frame",
    """
    SELECT s_suppkey, s_acctbal,
           COUNT(*) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)
             AS peers_within_500,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6)))
                OVER (ORDER BY s_acctbal
                      RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_band_total
    FROM supplier ORDER BY s_suppkey
    """,
)
def window_range_frame(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal"))
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w.rangeBetween(-500, 500)).alias("peers_within_500"),
        F.sum(F.col("s_acctbal").cast("decimal(18,6)"))
        .over(w.rangeBetween(-500, W.currentRow))
        .cast("double")
        .alias("trailing_band_total"),
    ).orderBy("s_suppkey")


# --- corr / covar (Pearson) via exact scaled sums -------------------------
# Both engines' native corr() accumulate floating moments in engine-
# specific orders; to be hash-identical the five sufficient statistics
# (n, Σx, Σy, Σx², Σxy, Σy²) are accumulated EXACTLY: values scaled to
# integers (prices have 2 decimals → ×100 is exact) summed as
# DECIMAL(38,0), then the closed-form computed in double.


@query(
    "agg_corr_covar",
    """
    WITH j AS (
      SELECT o.o_orderstatus AS st,
             CAST(CAST(l.l_quantity * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0)) AS x,
             CAST(CAST(l.l_extendedprice * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0)) AS y
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), s AS (
      SELECT st, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM j GROUP BY st
    )
    SELECT st AS o_orderstatus, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
           ROUND((n * sxy - sx * sy) / (n * CAST(n - 1 AS DOUBLE)) / 10000.0, 4)
             AS covar_samp_qty_price
    FROM s ORDER BY o_orderstatus
    """,
)
def agg_corr_covar(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    x = (F.col("l_quantity") * 100).cast("decimal(18,0)").cast("decimal(38,0)")
    y = (F.col("l_extendedprice") * 100).cast("decimal(18,0)").cast("decimal(38,0)")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderstatus").alias("st"), x.alias("x"), y.alias("y")
    )
    s = j.groupBy("st").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("st").alias("o_orderstatus"),
        "n",
        F.round(num / den, 6).alias("corr_qty_price"),
        F.round(num / (n * (n - 1).cast("double")) / 10000.0, 4).alias(
            "covar_samp_qty_price"
        ),
    ).orderBy("o_orderstatus")


# --- json_build_object / jsonb round-trip / json_each expansion -------------


@query(
    "json_build_each",
    """
    SELECT o_orderkey, k, v FROM (
      SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v
      FROM orders WHERE o_orderkey <= 60
      UNION ALL
      SELECT o_orderkey, 'status' AS k, o_orderstatus AS v
      FROM orders WHERE o_orderkey <= 60
    ) kv
    ORDER BY o_orderkey, k
    """,
)
def json_build_each(spark, sf_dir):
    """json_build_object → jsonb round-trip → json_each expansion
    (adt/json.cpp json_build_object, jsonfuncs.cpp json_each).

    Builds a real JSON document per order with to_json(struct(...)),
    parses it back as map<string,string> (the jsonb object model), and
    explodes to (key, value) rows — the reference's lateral
    ``json_each(j)``. The serialize/parse/explode chain is all Catalyst
    (JsonToStructs/Explode), no Python, and runs map-side only: the
    single narrow pipeline scan→project→generate has zero exchanges
    before the output sort.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 60)
    js = F.to_json(
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    m = F.from_json(js, "map<string,string>")
    return (
        o.select("o_orderkey", F.explode(m).alias("k", "v"))
        .orderBy("o_orderkey", "k")
    )


# --- explicit GROUPING SETS (gram.y:24424-24441 parses GROUPING SETS
# separately from ROLLUP/CUBE; planned as sorted-agg phases) ---------------


@query(
    "agg_grouping_sets",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def agg_grouping_sets(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_ogs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM _ogs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


@query(
    "agg_regression",
    """
    SELECT o_orderpriority,
           CAST(regr_count(o_totalprice, o_custkey % 100)
                AS BIGINT) AS n,
           ROUND(regr_slope(o_totalprice, o_custkey % 100), 6) AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey % 100), 6)
             AS intercept,
           ROUND(regr_avgx(o_totalprice, o_custkey % 100), 6) AS avgx,
           ROUND(regr_avgy(o_totalprice, o_custkey % 100), 6) AS avgy
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_regression(spark, sf_dir):
    """PG regr_* bivariate aggregate family (builtin_funcs.ini
    regr_slope/intercept/count/avgx/avgy) — native in Spark SQL and
    DuckDB with identical two-pass-free single-aggregation semantics.
    One partial/final hash aggregate; the shuffle carries the five
    moment accumulators per group, not rows."""
    o = table(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 100
    y = F.col("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "regr_count(o_totalprice, o_custkey % 100)"
            )
            .cast("bigint")
            .alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_avgx(y, x), 6).alias("avgx"),
            F.round(F.regr_avgy(y, x), 6).alias("avgy"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_filter_clause",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
             AS big_total,
           CAST(MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'O')
                AS DATE) AS last_open
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_filter_clause(spark, sf_dir):
    """PG's aggregate FILTER (WHERE ...) clause — native SQL in Spark
    and DuckDB; each filtered aggregate is one conditional accumulator
    inside the same single partial/final hash-aggregate pass (NOT one
    scan per filter)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_agg_filter_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
                 AS big_total,
               CAST(MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'O')
                    AS DATE) AS last_open
        FROM _agg_filter_orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "distinct_on",
    """
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    """,
)
def distinct_on(spark, sf_dir):
    """PG's DISTINCT ON (k): first row per key under the query's ORDER
    BY — each customer's most recent order here. Spark has no DISTINCT
    ON; the engine states it as the standard row_number()=1 rewrite,
    which is also how the reference's planner models it (Unique over
    sorted input). One shuffle on the key, bounded heap per group."""
    from pyspark.sql import Window as W2

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W2.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


@query(
    "window_ratio_to_report",
    """
    SELECT o_orderpriority, o_orderkey,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,6)) /
                 SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                   OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6)
             AS ratio
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def window_ratio_to_report(spark, sf_dir):
    """Oracle's RATIO_TO_REPORT window function (A_FORMAT compat
    surface): each row's share of its partition total. Stated as
    value / SUM() OVER (partition) with the exact-decimal convention —
    the partition sum is shuffle-order independent, the division is
    per-row IEEE."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    from pyspark.sql import Window as W2

    dec = F.col("o_totalprice").cast("decimal(18,6)")
    total = F.sum(dec).over(W2.partitionBy("o_orderpriority"))
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.round((dec / total).cast("double"), 6).alias("ratio"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


# --- GROUPS frames (nodeWindowAgg.cpp FRAMEOPTION_GROUPS) — a frame mode
# Spark's window API does NOT expose; emulated by ranking peer groups
# with dense_rank and running a RANGE frame over the rank values (peers
# share a rank, so rank-distance == group-distance, which is exactly the
# GROUPS semantics). The (a)-composition strategy from the brief: an
# operator Spark lacks, expressed through operators it has. ----------------


@query(
    "window_groups_frame",
    """
    WITH e AS (
      SELECT user_id, event_id, value, CAST(ts AS DATE) AS d
      FROM events WHERE user_id < 5
    ), g AS (
      SELECT user_id, d, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM e GROUP BY user_id, d
    ), gw AS (
      SELECT user_id, d,
             n + COALESCE(LAG(n) OVER w, 0) AS n2,
             s + COALESCE(LAG(s) OVER w, 0) AS s2
      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY d)
    )
    SELECT e.user_id AS user_id, e.event_id AS event_id, e.value AS value,
           CAST(gw.n2 AS BIGINT) AS n_two_days,
           CAST(gw.s2 AS DOUBLE) AS sum_two_days
    FROM e JOIN gw ON gw.user_id = e.user_id AND gw.d = e.d
    ORDER BY user_id, event_id
    """,
)
def window_groups_frame(spark, sf_dir):
    """GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW (peer-group frames —
    the third SQL:2011 frame mode, in the reference's window executor
    but absent from Spark's API): per user, aggregates over the current
    ts-date peer group and the one before it. Emulation: dense_rank
    over the order key turns peer groups into consecutive integers,
    then a RANGE frame of width 1 over that rank IS the GROUPS frame
    (peers tie on rank). Two window passes over the same partitioning —
    one shuffle, no join. DuckDB (like Spark) has no GROUPS mode, so
    the oracle states the semantics a THIRD way: per-peer-group
    aggregates, LAG to the previous group, joined back to rows —
    agreement of the two independent formulations pins the frame
    semantics."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    d = F.col("ts").cast("date")
    wr = W.partitionBy("user_id").orderBy(d)
    ranked = ev.select(
        "user_id", "event_id", "value",
        F.dense_rank().over(wr).alias("_grp"),
    )
    wg = (
        W.partitionBy("user_id")
        .orderBy("_grp")
        .rangeBetween(-1, W.currentRow)
    )
    return (
        ranked.select(
            "user_id",
            "event_id",
            "value",
            F.count(F.lit(1)).over(wg).cast("bigint").alias("n_two_days"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(wg)
            .cast("double")
            .alias("sum_two_days"),
        )
        .orderBy("user_id", "event_id")
    )


# --- frame EXCLUDE clauses (SQL:2011; nodeWindowAgg.cpp FRAMEOPTION_
# EXCLUDE_*) — also absent from Spark's API; emulated by frame-sum
# arithmetic against the peer-group sum. DuckDB implements EXCLUDE
# natively, so the oracle is the real thing. ------------------------------


@query(
    "window_exclude_frame",
    """
    SELECT user_id, event_id, value,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      EXCLUDE CURRENT ROW), 0) AS DOUBLE) AS sum_excl_self,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      EXCLUDE GROUP), 0) AS DOUBLE) AS sum_excl_peers,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      EXCLUDE TIES), 0) AS DOUBLE) AS sum_excl_ties
    FROM events WHERE user_id < 5
    ORDER BY user_id, event_id
    """,
)
def window_exclude_frame(spark, sf_dir):
    """Frame EXCLUDE clauses (SQL:2011's fourth frame refinement —
    EXCLUDE CURRENT ROW / GROUP / TIES), absent from Spark's window
    API: emulated as exact-decimal arithmetic over two windows —
    running RANGE sum and the current peer-group sum:
      EXCLUDE CURRENT ROW = frame - value
      EXCLUDE GROUP       = frame - peer_sum
      EXCLUDE TIES        = frame - peer_sum + value
    One extra window over the same partitioning (same single shuffle).
    DuckDB implements EXCLUDE natively, so the oracle checks the
    emulation against a real implementation of the feature."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    d = F.col("ts").cast("date")
    vdec = F.col("value").cast("decimal(18,6)")
    run = (
        W.partitionBy("user_id")
        .orderBy(d)
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    peers = W.partitionBy("user_id", d)
    frame = F.sum(vdec).over(run)
    peer_sum = F.sum(vdec).over(peers)
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.coalesce(frame - vdec, zero)
            .cast("double")
            .alias("sum_excl_self"),
            F.coalesce(frame - peer_sum, zero)
            .cast("double")
            .alias("sum_excl_peers"),
            F.coalesce(frame - peer_sum + vdec, zero)
            .cast("double")
            .alias("sum_excl_ties"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "unpivot_metrics",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS total_price,
             CAST(year(o_orderdate) AS DOUBLE) AS order_year
      FROM orders WHERE o_orderkey <= 40
    )
    SELECT o_orderkey, metric, val
    FROM base UNPIVOT (val FOR metric IN (total_price, order_year))
    ORDER BY o_orderkey, metric
    """,
)
def unpivot_metrics(spark, sf_dir):
    """UNPIVOT — wide→long reshape (the inverse of pivot, SQL-standard
    since 2016 and in the reference's Oracle-compat surface): Spark
    expresses it as the stack() generator (or the 4.0 df.unpivot API);
    the oracle uses DuckDB's native UNPIVOT, so the gate checks the
    stack() encoding against a first-class implementation. Pure map
    work — each input row emits k rows, no shuffle before the sort."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 40)
    base = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("double").alias("order_year"),
    )
    return (
        base.unpivot(
            ["o_orderkey"],
            ["total_price", "order_year"],
            "metric",
            "val",
        )
        .orderBy("o_orderkey", "metric")
    )


@query(
    "setop_all_multiplicity",
    """
    WITH ia AS (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ), ea AS (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT op, custkey, n FROM (
      SELECT 'intersect_all' AS op, custkey, COUNT(*) AS n
      FROM ia GROUP BY custkey
      UNION ALL
      SELECT 'except_all' AS op, custkey, COUNT(*) AS n
      FROM ea GROUP BY custkey
    ) u ORDER BY op, custkey
    """,
)
def setop_all_multiplicity(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL — the multiplicity-preserving SetOp
    strategies (`executor/nodeSetOp.cpp:900` computes per-group counts
    on both inputs and emits min(l,r) / greatest(l-r,0) copies;
    `vecnode/vecsetop.cpp:980-995` is the batch variant). The distinct
    variants were gated in round 2 (`setop_intersect`/`setop_except`);
    this closes the ALL half. Spark's intersectAll/exceptAll implement
    the same per-group counting under a single hash aggregate — one
    shuffle on the compare key, no join explosion, safe at any scale.
    A customer with 3 'F' orders and 1 'O' order contributes 1 row to
    INTERSECT ALL and 2 rows to EXCEPT ALL, which the per-key counts
    pin exactly."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    ia = (
        f.intersectAll(open_)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "custkey", "n")
    )
    ea = (
        f.exceptAll(open_)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "custkey", "n")
    )
    return ia.unionAll(ea).orderBy("op", "custkey")


@query(
    "agg_ordered_concat",
    """
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderdate, o_orderkey)
             AS status_seq,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_totalprice DESC, o_orderkey)
             AS keys_by_price
    FROM orders WHERE o_custkey < 20
    GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def agg_ordered_concat(spark, sf_dir):
    """ORDER BY *inside* an aggregate, by a DIFFERENT column than the
    aggregated value (`executor/nodeAgg.cpp:113` — the sorted-transition
    path that makes string_agg(x ORDER BY y) well-defined; the round-2
    `agg_string_array` gate only ordered by the aggregated value
    itself, which any sort-after-collect fakes). Spark 4's listagg
    WITHIN GROUP (ORDER BY ...) is the 1:1 surface; the sort keys are
    tie-broken to a total order (date+key, price DESC+key) so both
    engines produce byte-identical sequences regardless of shuffle
    order — the same determinism convention as every collect_list in
    this repo."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.expr(
                "listagg(o_orderstatus, ',') "
                "WITHIN GROUP (ORDER BY o_orderdate, o_orderkey)"
            ).alias("status_seq"),
            F.expr(
                "listagg(CAST(o_orderkey AS STRING), ',') "
                "WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey)"
            ).alias("keys_by_price"),
        )
        .orderBy("o_custkey")
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) l
    WHERE c.c_custkey < 50
    ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
"""


@query("lateral_topn_per_group", _LATERAL_SQL)
def lateral_topn_per_group(spark, sf_dir):
    """LATERAL correlated subquery with ORDER BY + LIMIT — the
    parameterized-inner nested loop (`executor/nodeNestloop.cpp:662`
    with inner index path, GUC enable_index_nestloop
    `guc_sql.cpp:868`): for each outer row the inner subquery re-runs
    with the outer's key bound. The SAME SQL text runs on both engines
    (Spark ≥3.2 supports lateral correlated subqueries); Catalyst
    decorrelates the per-row LIMIT into a ranked window over one
    equi-join — exactly the rewrite you want at 100 TB, where a true
    row-at-a-time rebind would be a disaster and the window form is
    one shuffle on the join key."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@query(
    "window_filter_clause",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS finished_so_far,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_totalprice > 200000)
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
             AS big_total_so_far
    FROM orders WHERE o_custkey < 15
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_filter_clause(spark, sf_dir):
    """Aggregate FILTER (WHERE ...) over a WINDOW — SQL:2003's filtered
    window aggregate, which PG/openGauss run natively and Spark does
    NOT support in OVER position: the engine rewrites it as the
    conditional-expression aggregate (count → sum of 0/1, sum →
    when-guarded operand) over the same running frame, while the
    oracle uses DuckDB's native FILTER OVER — so the gate checks the
    rewrite against a first-class implementation. The guarded sum goes
    through exact decimal per the shuffle-order convention; a NULL
    (empty-filter) running sum stays NULL on both sides."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 15)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    finished = F.sum(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    ).over(w)
    big = (
        F.sum(
            F.when(
                F.col("o_totalprice") > 200000,
                F.col("o_totalprice").cast("decimal(18,2)"),
            )
        )
        .over(w)
        .cast("double")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        finished.alias("finished_so_far"),
        big.alias("big_total_so_far"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "agg_regression2",
    """
    SELECT o_orderpriority,
           ROUND(regr_r2(o_totalprice, o_custkey % 100), 6) AS r2,
           ROUND(regr_sxx(o_totalprice, o_custkey % 100), 2) AS sxx,
           ROUND(regr_syy(o_totalprice, o_custkey % 100) / 1e9, 4)
             AS syy_b,
           ROUND(regr_sxy(o_totalprice, o_custkey % 100) / 1e6, 4)
             AS sxy_m
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_regression2(spark, sf_dir):
    """The rest of PG's regr_* bivariate family (builtin_funcs.ini
    regr_r2/sxx/syy/sxy) — native one-pass moment aggregates in both
    Spark and DuckDB. The raw second moments span ~1e6 (sxx, integer
    x) to ~1e13 (syy, price variance), so the larger ones are scaled
    before rounding (syy/1e9, sxy/1e6): both engines' stable co-moment
    updates agree to ~1e-13 relative, orders of magnitude inside the
    rounded precision, while a fixed 6-dp round of a 1e13 value would
    demand bit-identical float sums. Same single partial/final
    hash-aggregate shape as agg_regression."""
    o = table(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 100
    y = F.col("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_sxx(y, x), 2).alias("sxx"),
            F.round(F.regr_syy(y, x) / 1e9, 4).alias("syy_b"),
            F.round(F.regr_sxy(y, x) / 1e6, 4).alias("sxy_m"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "recursive_cycle_detect",
    """
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, (n_nationkey + 5) % 25 AS dst FROM nation
    ),
    walk(start, node, depth, path) AS (
      SELECT src, src, 0, CONCAT('/', CAST(src AS VARCHAR), '/')
      FROM edges WHERE src < 5
      UNION ALL
      SELECT w.start, e.dst, w.depth + 1,
             CONCAT(w.path, CAST(e.dst AS VARCHAR), '/')
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE instr(w.path, CONCAT('/', CAST(e.dst AS VARCHAR), '/')) = 0
    )
    SELECT start, CAST(COUNT(*) AS BIGINT) AS cycle_len,
           CAST(SUM(node) AS BIGINT) AS node_sum
    FROM walk GROUP BY start ORDER BY start
    """,
)
def recursive_cycle_detect(spark, sf_dir):
    """WITH RECURSIVE over a cyclic graph with CYCLE detection
    (nodeRecursiveunion.cpp; the reference's recursive CTE surface plus
    the SQL:2016 CYCLE clause spelled as an explicit visited-path guard,
    the rewrite openGauss itself applies).  The edge relation
    k -> (k+5) mod 25 over nation partitions the keys into five
    5-cycles; without the path guard the fixpoint never terminates, so
    this pins that the engine's recursive iteration supports
    data-dependent termination predicates, not just monotone depth.

    Scale: the working table stays |starts| rows per iteration and the
    per-iteration join is a broadcast-size equi-join on the edge key;
    iteration depth equals the longest simple path, bounded by the
    guard.

    r13 A/B note (kept AS IS — OPTIMIZATION_r13.md): materializing the
    edge relation with localCheckpoint (+0.1 s for the extra job) and
    forcing BROADCAST in the recursive arm (+0.3 s — a fresh
    BroadcastExchange per iteration beats nothing here; the 25-row side
    already auto-broadcasts) both measured SLOWER than this shape at
    sf0.1; the per-iteration cost is the UnionLoop job floor, not the
    edge re-derivation."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("cyc_nation_src")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT n_nationkey AS src, (n_nationkey + 5) % 25 AS dst
          FROM cyc_nation_src
        ),
        walk(start, node, depth, path) AS (
          SELECT src, src, 0, CONCAT('/', CAST(src AS STRING), '/')
          FROM edges WHERE src < 5
          UNION ALL
          SELECT w.start, e.dst, w.depth + 1,
                 CONCAT(w.path, CAST(e.dst AS STRING), '/')
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE instr(w.path, CONCAT('/', CAST(e.dst AS STRING), '/')) = 0
        )
        SELECT start, COUNT(*) AS cycle_len,
               CAST(SUM(node) AS BIGINT) AS node_sum
        FROM walk GROUP BY start ORDER BY start
        """
    )
