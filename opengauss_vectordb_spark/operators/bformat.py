"""B-format (MySQL-compatibility) function tranche.

openGauss ships a B_FORMAT compatibility mode alongside the Oracle
A_FORMAT one (``DB_IS_CMPT(B_FORMAT)`` gates all over
``src/common/backend/parser/gram.y``).  The pieces exercised here are
the ones with real kernel implementations in the reference:

  * ``group_concat(DISTINCT x ORDER BY y SEPARATOR s)`` — grammar
    rewrites the separator into the arg list (``gram.y:27716-27733``),
    aggregate kernel ``utils/adt/varlena.cpp:6387-6428``
    (``group_concat_transfn``/``group_concat_finalfn``), catalog entry
    ``builtin_funcs.ini:3579``.
  * ``find_in_set(str, strlist)`` — ``utils/adt/set.cpp:1056``
    (``findinset``), catalog ``builtin_funcs.ini:2682``.
  * Oracle/MySQL ``instr(str, sub, pos, nth)`` 3- and 4-arg forms —
    ``utils/adt/varlena.cpp:7132-7188`` (``text_instr_3args`` /
    ``text_instr_4args``), catalog ``builtin_funcs.ini:4863-4866``.

Spark-first mapping: ``find_in_set`` is a Spark builtin; nth-occurrence
``instr`` is a higher-order ``filter(sequence(...))`` over candidate
positions (JVM-side, codegen'd — no Python UDF); ``group_concat`` is
``array_join`` over a sorted ``collect_set``/``collect_list`` (the
ORDER BY inside the aggregate becomes an explicit ``array_sort``, which
is also what makes the result deterministic under shuffle order — the
reference relies on the sort for the same reason).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _instr_nth(col: str, sub: str, pos: int, nth: int) -> F.Column:
    """Oracle ``instr(str, sub, pos, nth)`` for positive ``pos``:
    1-based position of the ``nth`` occurrence at-or-after ``pos``,
    0 when absent (varlena.cpp:7141 semantics).  Candidate positions
    are enumerated JVM-side with ``sequence``+``filter``; a substring
    probe past the end yields a short string that never equals ``sub``,
    so no bounds guard is needed."""
    return F.expr(
        f"coalesce(get(filter(sequence(1, length({col})),"
        f" i -> i >= {pos} AND substring({col}, i, {len(sub)}) = '{sub}'),"
        f" {nth - 1}), 0)"
    ).cast("int")


@query(
    "bformat_string_funcs",
    """
    SELECT p_partkey,
           CAST(coalesce(list_position(string_split(
                    replace(p_type, ' ', ','), ','), 'BRASS'), 0)
                AS INT) AS brass_slot,
           CAST(coalesce(
                    (list_filter(range(1, length(p_name) + 1),
                        i -> i >= 3
                         AND substr(p_name, CAST(i AS INT), 1) = 'o'))[2],
                    0) AS INT) AS o2_at,
           CAST(coalesce(
                    (list_filter(range(1, length(p_type) + 1),
                        i -> i >= 1
                         AND substr(p_type, CAST(i AS INT), 2) = 'ED'))[1],
                    0) AS INT) AS ed1_at
    FROM part WHERE p_partkey <= 60 ORDER BY p_partkey
    """,
)
def bformat_string_funcs(spark, sf_dir):
    """B-format scalar tranche: find_in_set over a comma list derived
    from p_type's words, plus 4-arg instr (2nd 'o' at-or-after position 3
    in p_name) and 3-arg instr (first 'ED' in p_type — nth=1 is exactly
    the 3-arg form, varlena.cpp:7137)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 60)
    return p.select(
        "p_partkey",
        F.expr("find_in_set('BRASS', replace(p_type, ' ', ','))")
        .cast("int")
        .alias("brass_slot"),
        _instr_nth("p_name", "o", 3, 2).alias("o2_at"),
        _instr_nth("p_type", "ED", 1, 1).alias("ed1_at"),
    ).orderBy("p_partkey")


@query(
    "bformat_group_concat",
    """
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
               AS segments,
           string_agg(c_name, ',' ORDER BY c_custkey) AS names,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey <= 120
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def bformat_group_concat(spark, sf_dir):
    """``group_concat`` both ways the reference's grammar accepts
    (gram.y:27716-27733): DISTINCT with ORDER BY and a custom
    SEPARATOR, and plain with ORDER BY on another key.  The ordered
    non-distinct form collects (order-key, value) structs and sorts
    before joining — struct sort order is the order-key prefix, so the
    result is shuffle-order independent, which is what lets this run
    identically on 1 or 1000 executors."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 120)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), "|"
            ).alias("segments"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(c_custkey, c_name))), s -> s.c_name)"
                ),
                ",",
            ).alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "bformat_convert_series",
    """
    SELECT i,
           CAST(i AS VARCHAR) AS s,
           CAST(CAST(i AS VARCHAR) AS BIGINT) * 2 AS d,
           CAST(i * 1.5 AS DOUBLE) AS f
    FROM generate_series(1, 20) AS g(i)
    ORDER BY i
    """,
)
def bformat_convert_series(spark, sf_dir):
    """B-format CONVERT + PG generate_series FunctionScan through SQL
    text (gram.y B-compat CONVERT grammar; MySQL public semantics;
    nodeFunctionscan.cpp): ``CONVERT(x, SIGNED/CHAR)`` translates to
    CAST, ``CONVERT(x USING cs)`` to the expression (UTF-8 end-to-end
    position), and ``FROM generate_series(a, b) AS g(i)`` rewrites to
    ``explode(sequence(...))`` — the oracle states the same query in
    DuckDB's native CAST/generate_series forms.

    Scale: pure text rewrites into codegen expressions; the series is
    one explode, no Python anywhere."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql(
        "SELECT i,"
        " CONVERT(i, CHAR) AS s,"
        " CONVERT(CONVERT(i, CHAR), SIGNED) * 2 AS d,"
        " CAST(CONVERT(i * 1.5, DOUBLE) AS DOUBLE) AS f"
        " FROM generate_series(1, 20) AS g(i)"
        " ORDER BY i"
    )


@query(
    "format_trunc_compat",
    """
    SELECT CAST(r_regionkey AS BIGINT) AS k,
           '"' || r_name || '": bal=''' ||
             CAST(r_regionkey * 1.5 AS DOUBLE) || ''' (' ||
             CAST(r_regionkey % 2 = 0 AS VARCHAR) || ')' AS label,
           CAST(CASE WHEN r_regionkey * 7.77 >= 0
                     THEN FLOOR(r_regionkey * 7.77 * 10) / 10
                     ELSE CEIL(r_regionkey * 7.77 * 10) / 10
                END AS DOUBLE) AS t1,
           CAST(CASE WHEN r_regionkey * -7.77 >= 0
                     THEN FLOOR(r_regionkey * -7.77)
                     ELSE CEIL(r_regionkey * -7.77)
                END AS DOUBLE) AS t0
    FROM region ORDER BY k
    """,
)
def format_trunc_compat(spark, sf_dir):
    """Census batch 4 in one row: PG format() with a literal template
    (adt/varlena.cpp text_format — %I quote_ident, %L quote_literal
    with the NULL spelling, %s empty-for-NULL, all compiled to ONE
    concat expression, no UDF) and numeric trunc toward zero
    (numeric.cpp trunc; sign-aware FLOOR/CEIL).  The DuckDB oracle
    builds the identical strings by hand — an independent rendering
    of the same rules.

    Scale: pure whole-stage codegen over the scan; format() never
    becomes a UDF."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql(
        "SELECT CAST(r_regionkey AS BIGINT) AS k,"
        " format('%I: bal=%L (%s)', r_name,"
        "        CAST(r_regionkey * 1.5 AS DOUBLE),"
        "        r_regionkey % 2 = 0) AS label,"
        " CAST(trunc(r_regionkey * 7.77, 1) AS DOUBLE) AS t1,"
        " CAST(trunc(r_regionkey * -7.77) AS DOUBLE) AS t0"
        " FROM region ORDER BY k"
    )


@query(
    "pg_datetime_format_models",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d1,
           strftime(CAST(o_orderdate AS DATE), '%b %d, %Y') AS d2,
           strftime(CAST(o_orderdate AS DATE), '%a') AS dow,
           CAST(o_orderdate AS DATE) AS rt,
           CAST(strftime(CAST(o_orderdate AS DATE), '%H%M%S')
                AS VARCHAR) AS hms
    FROM orders WHERE o_orderkey <= 200 ORDER BY k
    """,
)
def pg_datetime_format_models(spark, sf_dir):
    """PG/Oracle datetime format models in SQL TEXT
    (formatting.cpp's DCH table; ~700 regress uses across
    to_char/to_date/to_timestamp): 'YYYY-MM-DD', 'Mon DD, YYYY',
    'Dy', 'HH24MISS' render through one date_format after model
    translation, and to_date round-trips its own to_char output.
    Spark-native lowercase patterns pass through untouched (the
    case-based dialect detection).  The DuckDB oracle renders the
    same fields through strftime — an independent formatter.

    Scale: every call is ONE codegen'd date_format/to_date; the
    model translates at plan time, never per row."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql(
        "SELECT CAST(o_orderkey AS BIGINT) AS k,"
        " to_char(o_orderdate, 'YYYY-MM-DD') AS d1,"
        " to_char(o_orderdate, 'Mon DD, YYYY') AS d2,"
        " to_char(o_orderdate, 'Dy') AS dow,"
        " to_date(to_char(o_orderdate, 'YYYY-MM-DD'),"
        "         'YYYY-MM-DD') AS rt,"
        " to_char(o_orderdate, 'HH24MISS') AS hms"
        " FROM orders WHERE o_orderkey <= 200 ORDER BY k"
    )


@query(
    "insert_ignore_error",
    """
    SELECT k, v FROM (VALUES (5, 'a'), (15, 'b'), (7, 'c'))
      AS t(k, v)
    ORDER BY k
    """,
)
def insert_ignore_error(spark, sf_dir):
    """INSERT /*+ ignore_error */ — the B-format sql_ignore hint
    (regress ignore/ suite): rows the write-side validators would
    abort on (no matching partition here) FILTER out of the batch,
    the skipped count reports, and the surviving rows land routed.
    The oracle is the expected surviving set stated directly.

    Scale: the skip is the routing CASE's null-label filter fused
    into the write job — no extra pass over a clean batch; the
    skipped count costs two bounded count jobs only under the
    hint."""
    import shutil
    import tempfile

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="ig_gate_")
    eng.managed_tables.root = tmp
    try:
        eng.sql(
            "CREATE TABLE gate_ig (k INT, v TEXT)"
            " PARTITION BY RANGE (k) ("
            "  PARTITION p1 VALUES LESS THAN (10),"
            "  PARTITION p2 VALUES LESS THAN (20))"
        )
        r = eng.sql(
            "INSERT /*+ ignore_error */ INTO gate_ig VALUES"
            " (5, 'a'), (25, 'bad'), (15, 'b'), (7, 'c')"
        ).collect()[0]
        assert int(r.skipped) == 1, r
        rows = eng.sql(
            "SELECT k, v FROM gate_ig ORDER BY k"
        ).collect()
        return spark.createDataFrame(rows, "k INT, v STRING")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
