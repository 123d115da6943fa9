"""PG type-surface long tail — network (inet/cidr), geometric (point/
box), money, and enum semantics, plus the time-series gap-fill read
pattern and regexp set-returning functions.

Reference anchors (SURVEY.md §1.3 / §2.7):
  * inet/cidr/macaddr  — src/common/backend/utils/adt/network.cpp
  * point/box/distance — adt/geo_ops.cpp
  * money              — adt/cash.cpp (cash_in/cash_out/cash arithmetic)
  * enum ordering      — adt/enum.cpp (sort by declared position)
  * regexp SRFs        — adt/regexp.cpp (regexp_split_to_table,
                         regexp_matches)
  * TsStoreScan        — vecexecutor/vecnode/vectsstorescan.cpp (the
                         time-series store read path; gap-fill is the
                         canonical TS consumer pattern)

Spark-first stance: these PG types map to plain INT/STRUCT/DECIMAL/
STRING columns and every operation below is a native Column expression —
arithmetic, not UDFs — so the whole surface whole-stage-codegens and
scales linearly. IPv4 addresses are 32-bit ints with DIV/MOD octet
arithmetic (identical in every engine, no bit-twiddling extensions
needed); money is DECIMAL(18,2) so sums are exact and shuffle-order
independent; enums are declared-order arrays probed with array_position.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# ------------------------------------------------------------------ inet

# Deterministic synthetic IPv4 per order: 10.0.0.0/12 block + key offset.
_IP_BASE = 10 * 16777216  # 10.0.0.0


@query(
    "inet_funcs",
    f"""
    WITH t AS (
      SELECT o_orderkey AS k, {_IP_BASE} + (o_orderkey % 1048576) AS ip
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT k,
           (ip // 16777216) || '.' || ((ip // 65536) % 256) || '.'
             || ((ip // 256) % 256) || '.' || (ip % 256) AS host,
           24 AS masklen,
           (ip // 16777216) || '.' || ((ip // 65536) % 256) || '.'
             || ((ip // 256) % 256) || '.0/24' AS network,
           ip - (ip % 256) AS network_int,
           ((ip // 65536) = ({_IP_BASE} // 65536)) AS in_10_0_16,
           ip % 256 AS host_part
    FROM t ORDER BY k
    """,
)
def inet_funcs(spark, sf_dir):
    """inet/cidr semantics (network.cpp): host(), masklen(), network()
    truncation to the /24, and the `<<=` contained-in-cidr test against
    10.0.0.0/16 — all integer DIV/MOD octet arithmetic on an int-encoded
    address, fully codegen'd."""
    t = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.lit(_IP_BASE) + F.col("o_orderkey") % 1048576).alias("ip"),
        )
    )
    o1 = F.expr("ip div 16777216")
    o2 = F.expr("ip div 65536") % 256
    o3 = F.expr("ip div 256") % 256
    o4 = F.col("ip") % 256
    dot = F.lit(".")
    return t.select(
        "k",
        F.concat(o1, dot, o2, dot, o3, dot, o4).alias("host"),
        F.lit(24).alias("masklen"),
        F.concat(o1, dot, o2, dot, o3, F.lit(".0/24")).alias("network"),
        (F.col("ip") - o4).alias("network_int"),
        (F.expr("ip div 65536") == F.lit(_IP_BASE // 65536)).alias("in_10_0_16"),
        o4.alias("host_part"),
    ).orderBy("k")


# ------------------------------------------------------------- geometric


@query(
    "geo_point_funcs",
    """
    WITH pts AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT vec_id,
           ROUND(sqrt(x * x + y * y), 6) AS dist_origin,
           (x >= -0.5 AND x <= 0.5 AND y >= -0.5 AND y <= 0.5) AS in_unit_box,
           ROUND(sqrt((x - 0.25) * (x - 0.25) + (y - 0.25) * (y - 0.25)), 6)
             AS dist_q
    FROM pts
    ORDER BY dist_q, vec_id
    LIMIT 25
    """,
)
def geo_point_funcs(spark, sf_dir):
    """Geometric type ops (geo_ops.cpp): point <-> point distance,
    box @> point containment, nearest-25 to a query point — doubles and
    comparisons only, the same TakeOrderedAndProject shape as kNN."""
    pts = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.element_at("embedding", 1).cast("double").alias("x"),
            F.element_at("embedding", 2).cast("double").alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    return (
        pts.select(
            "vec_id",
            F.round(F.sqrt(x * x + y * y), 6).alias("dist_origin"),
            ((x >= -0.5) & (x <= 0.5) & (y >= -0.5) & (y <= 0.5)).alias(
                "in_unit_box"
            ),
            F.round(
                F.sqrt((x - 0.25) * (x - 0.25) + (y - 0.25) * (y - 0.25)), 6
            ).alias("dist_q"),
        )
        .orderBy("dist_q", "vec_id")
        .limit(25)
    )


# ----------------------------------------------------------------- money


@query(
    "money_funcs",
    """
    WITH raw(tag, m) AS (
      VALUES ('a', '$1,234.56'), ('b', '-$0.99'), ('c', '$1,000,000.00'),
             ('d', '$0.01'), ('e', '-$42.00')
    ), parsed AS (
      SELECT tag,
             CAST(replace(replace(replace(m, '$', ''), ',', ''), ' ', '')
                  AS DECIMAL(18,2)) AS amt
      FROM raw
    )
    SELECT tag,
           CAST(amt AS DOUBLE) AS amt,
           '$' || CAST(amt AS VARCHAR) AS cash_out,
           CAST(CAST(amt * 2 AS DECIMAL(18,2)) AS DOUBLE) AS doubled,
           CAST(CAST(SUM(amt) OVER () AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM parsed ORDER BY tag
    """,
)
def money_funcs(spark, sf_dir):
    """money semantics (cash.cpp): cash_in parses '$1,234.56' (sign,
    currency symbol, thousands separators) into an exact DECIMAL(18,2),
    arithmetic stays in decimal (never float — cents are exact), and
    cash_out formats back. The windowed total is decimal, so it is
    shuffle-order independent. Final numeric outputs are cast to DOUBLE
    (a stable primitive) because the gate's value-hash is representation
    sensitive: DECIMAL hashes differ across engines even when the values
    are identical."""
    from pyspark.sql import Window as W

    raw = spark.createDataFrame(
        [
            ("a", "$1,234.56"),
            ("b", "-$0.99"),
            ("c", "$1,000,000.00"),
            ("d", "$0.01"),
            ("e", "-$42.00"),
        ],
        "tag STRING, m STRING",
    )
    amt = F.regexp_replace("m", r"[$, ]", "").cast("decimal(18,2)")
    return (
        raw.select("tag", amt.alias("amt"))
        .select(
            "tag",
            F.col("amt").cast("double").alias("amt"),
            F.concat(F.lit("$"), F.col("amt").cast("string")).alias("cash_out"),
            (F.col("amt") * 2).cast("decimal(18,2)").cast("double").alias("doubled"),
            F.sum("amt")
            .over(W.partitionBy())
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total"),
        )
        .orderBy("tag")
    )


# ------------------------------------------------------------------ enum

_PRIORITY_ORDER = (
    "4-NOT SPECIFIED",  # deliberately non-lexicographic declared order
    "5-LOW",
    "3-MEDIUM",
    "2-HIGH",
    "1-URGENT",
)
_SQL_ENUM = "['" + "', '".join(_PRIORITY_ORDER) + "']"


@query(
    "enum_ordering",
    f"""
    WITH e AS (
      SELECT o_orderpriority AS prio,
             CAST(list_position({_SQL_ENUM}, o_orderpriority) AS BIGINT)
               AS enum_pos,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT prio, enum_pos, n,
           first_value(prio) OVER (ORDER BY enum_pos) AS enum_min,
           last_value(prio) OVER
             (ORDER BY enum_pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS enum_max
    FROM e ORDER BY enum_pos
    """,
)
def enum_ordering(spark, sf_dir):
    """enum semantics (enum.cpp): values sort by DECLARED position, not
    lexicographically — the declared-order array is the enum catalog and
    array_position is the comparison key; enum min/max follow that order.
    The order below is deliberately non-alphabetical to prove the sort
    key is the declaration, not the label."""
    from pyspark.sql import Window as W

    enum_arr = F.array(*[F.lit(v) for v in _PRIORITY_ORDER])
    e = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "prio",
            F.array_position(enum_arr, F.col("prio")).alias("enum_pos"),
            "n",
        )
    )
    w = W.orderBy("enum_pos")
    wfull = W.orderBy("enum_pos").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return e.select(
        "prio",
        "enum_pos",
        "n",
        F.first("prio").over(w).alias("enum_min"),
        F.last("prio").over(wfull).alias("enum_max"),
    ).orderBy("enum_pos")


# --------------------------------------------------------- TS gap-fill


@query(
    "tsstore_gapfill",
    """
    WITH series AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                    TIMESTAMP '2024-01-05 23:00:00',
                                    INTERVAL 1 HOUR)) AS bucket
    ), agg AS (
      SELECT date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        AND ts <  TIMESTAMP '2024-01-06 00:00:00'
      GROUP BY 1
    )
    SELECT s.bucket,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value,
           (a.bucket IS NULL) AS gap_filled
    FROM series s LEFT JOIN agg a ON s.bucket = a.bucket
    ORDER BY s.bucket
    """,
)
def tsstore_gapfill(spark, sf_dir):
    """Time-series gap-fill over the events store (TsStoreScan consumer
    pattern): hourly buckets for one day generated from literals
    (sequence → explode), left-joined to the windowed aggregate, gaps
    coalesced to zero. The dimension side is 24 rows — broadcast — and
    the fact side prunes to one day at the parquet scan, so at 100 TB
    this reads only the day's time partitions."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2024-01-05 00:00:00'"))
        & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-06 00:00:00'"))
    )
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    series = spark.sql(
        """
        SELECT explode(sequence(TIMESTAMP_NTZ '2024-01-05 00:00:00',
                                TIMESTAMP_NTZ '2024-01-05 23:00:00',
                                INTERVAL 1 HOUR)) AS bucket
        """
    )
    return (
        series.join(agg, "bucket", "left_outer")
        .select(
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------ regexp SRF


@query(
    "regexp_srf_funcs",
    r"""
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 20
    ), split_tab AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      FROM d
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN regexp_matches(tok, '^[a-z]+$') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alpha,
           MIN(tok) AS first_tok,
           CAST(SUM(len(regexp_extract_all(tok, '[aeiou]'))) AS BIGINT)
             AS n_vowels
    FROM split_tab
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def regexp_srf_funcs(spark, sf_dir):
    """regexp set-returning functions (regexp.cpp):
    regexp_split_to_table = explode(split()), regexp_matches count, and
    regexp_extract_all cardinality — the SRF becomes a generator
    (ProjectSet → explode per SURVEY §2.2) and everything downstream is
    a plain aggregate."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    tab = d.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("tok")
    )
    return (
        tab.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("tok").rlike("^[a-z]+$"), 1).otherwise(0)
            ).alias("n_alpha"),
            F.min("tok").alias("first_tok"),
            F.sum(F.size(F.regexp_extract_all("tok", F.lit("[aeiou]"), 0))).alias(
                "n_vowels"
            ),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- composite row types


@query(
    "composite_row_types",
    """
    WITH t AS (
      SELECT o_orderkey AS k,
             {'status': o_orderstatus,
              'price': round(o_totalprice, 2)} AS rec
      FROM orders WHERE o_orderkey < 60
    )
    SELECT k,
           rec.status AS status,
           rec.price AS price,
           (rec < {'status': 'O', 'price': 100000.0}) AS lt_pivot,
           ROW_NUMBER() OVER (ORDER BY rec, k) AS rec_rank
    FROM t ORDER BY k
    """,
)
def composite_row_types(spark, sf_dir):
    """Composite/row types (rowtypes.cpp → StructType per SURVEY §1.3):
    construction, field access, row-wise comparison (lexicographic by
    declared field order in both engines), and ORDER BY the composite
    value itself — all native struct expressions."""
    from pyspark.sql import Window as W

    t = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 60)
        .select(
            F.col("o_orderkey").alias("k"),
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.round("o_totalprice", 2).alias("price"),
            ).alias("rec"),
        )
    )
    pivot = F.struct(
        F.lit("O").alias("status"), F.lit(100000.0).alias("price")
    )
    return t.select(
        "k",
        F.col("rec.status").alias("status"),
        F.col("rec.price").alias("price"),
        (F.col("rec") < pivot).alias("lt_pivot"),
        F.row_number().over(W.orderBy("rec", "k")).alias("rec_rank"),
    ).orderBy("k")


# ------------------------------------------------- multi-dim arrays


@query(
    "array_multidim",
    """
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE embedding IS NOT NULL AND vec_id < 30
    ), m AS (
      SELECT vec_id,
             list_transform(range(0, 8), r -> e[r * 8 + 1 : r * 8 + 8]) AS mat
      FROM t
    )
    SELECT vec_id,
           len(mat) AS n_rows,
           len(mat[1]) AS n_cols,
           len(flatten(mat)) AS flat_len,
           ROUND(mat[2][3], 6) AS cell_2_3,
           ROUND(list_sum(mat[1]), 6) AS row1_sum
    FROM m ORDER BY vec_id
    """,
)
def array_multidim(spark, sf_dir):
    """Multi-dimensional arrays (arrayfuncs.cpp; SURVEY §1.3 maps PG
    multi-dim → nested arrays): reshape a 64-vector to 8×8, dims,
    flatten round-trip, [i][j] subscripting, per-row reduction — every
    step a native nested-array expression."""
    t = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.col("vec_id") < 30))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    mat = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda r: F.slice(F.col("e"), r * 8 + 1, 8),
    )
    m = t.select("vec_id", mat.alias("mat"))
    return m.select(
        "vec_id",
        F.size("mat").alias("n_rows"),
        F.size(F.element_at("mat", 1)).alias("n_cols"),
        F.size(F.flatten("mat")).alias("flat_len"),
        F.round(F.element_at(F.element_at("mat", 2), 3), 6).alias("cell_2_3"),
        F.round(
            F.aggregate(
                F.element_at("mat", 1), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("row1_sum"),
    ).orderBy("vec_id")


# ------------------------------------------------ interval justify


@query(
    "interval_justify",
    """
    WITH t AS (
      SELECT o_orderkey AS k,
             (o_orderkey % 100) * 7 AS total_hours,
             o_orderkey % 70 AS total_days
      FROM orders WHERE o_orderkey < 40
    )
    SELECT k,
           total_hours // 24 AS just_days,
           total_hours % 24 AS just_hours,
           total_days // 30 AS just_months,
           total_days % 30 AS just_rem_days,
           (total_hours // 24 > 7) AS over_a_week
    FROM t ORDER BY k
    """,
)
def interval_justify(spark, sf_dir):
    """justify_hours / justify_days (adt/timestamp.cpp): normalize an
    interval's hours into 24-hour days and days into 30-day months —
    PG's justification constants — as integer DIV/MOD arithmetic over
    the interval's total units."""
    t = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 40)
        .select(
            F.col("o_orderkey").alias("k"),
            ((F.col("o_orderkey") % 100) * 7).alias("total_hours"),
            (F.col("o_orderkey") % 70).alias("total_days"),
        )
    )
    return t.select(
        "k",
        F.expr("total_hours div 24").alias("just_days"),
        (F.col("total_hours") % 24).alias("just_hours"),
        F.expr("total_days div 30").alias("just_months"),
        (F.col("total_days") % 30).alias("just_rem_days"),
        (F.expr("total_hours div 24") > 7).alias("over_a_week"),
    ).orderBy("k")


# --------------------------------------------------------- to_number


@query(
    "to_number_parse",
    """
    WITH raw(tag, s) AS (
      VALUES ('a', '1,234.56'), ('b', '$987.00'), ('c', '42'),
             ('d', '-7,000.1'), ('e', '  3.14  ')
    )
    SELECT tag,
           CAST(CAST(regexp_replace(s, '[^0-9.\\-]', '', 'g') AS DECIMAL(18,4))
                AS DOUBLE) AS num,
           CAST(CAST(CAST(regexp_replace(s, '[^0-9.\\-]', '', 'g')
                          AS DECIMAL(18,4)) * 10 AS DECIMAL(18,4))
                AS DOUBLE) AS num_x10
    FROM raw ORDER BY tag
    """,
)
def to_number_parse(spark, sf_dir):
    """to_number (formatting.cpp / Oracle-compat a_compat.cpp): lenient
    numeric parse of formatted strings — strip currency symbols, group
    separators, and padding, then cast to exact decimal. Registered as
    the `pg_to_number` SQL macro (Spark 4 reserves the built-in name) in functions/pg_compat.py; spelled inline
    here so the oracle runs the identical arithmetic. Outputs are cast
    DECIMAL→DOUBLE at the very end because the gate's value-hash is
    representation sensitive (DECIMAL hashes differ across engines)."""
    raw = spark.createDataFrame(
        [
            ("a", "1,234.56"),
            ("b", "$987.00"),
            ("c", "42"),
            ("d", "-7,000.1"),
            ("e", "  3.14  "),
        ],
        "tag STRING, s STRING",
    )
    num = F.regexp_replace("s", r"[^0-9.\-]", "").cast("decimal(18,4)")
    return (
        raw.select("tag", num.alias("num"))
        .select(
            "tag",
            F.col("num").cast("double").alias("num"),
            (F.col("num") * 10)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("num_x10"),
        )
        .orderBy("tag")
    )


@query(
    "hstore_funcs",
    """
    WITH src AS (
      SELECT event_id,
             'k=>' || CAST(json_extract(props, '$.k') AS VARCHAR)
               || ',type=>' || event_type AS hs
      FROM events WHERE event_id < 50
    )
    SELECT event_id, 'k' AS hkey,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS hval
    FROM events WHERE event_id < 50
    UNION ALL
    SELECT event_id, 'type', event_type FROM events WHERE event_id < 50
    ORDER BY event_id, hkey
    """,
)
def hstore_funcs(spark, sf_dir):
    """hstore parity (PG contrib hstore: 'k=>v,...' text parse, each /
    akeys / -> access): build the hstore text, parse with str_to_map,
    and explode to (key, value) rows — MapType is Spark's hstore. The
    oracle states the expected pairs from first principles (no map type
    in the comparison surface: map iteration order is engine-specific,
    row sets are not)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    parsed = F.expr(
        "str_to_map(concat('k=>', get_json_object(props, '$.k'),"
        " ',type=>', event_type), ',', '=>')"
    )
    return (
        ev.select("event_id", F.explode(parsed).alias("hkey", "hval"))
        .orderBy("event_id", "hkey")
    )


@query(
    "varbit_funcs",
    """
    SELECT o_orderkey,
           lpad(bin(o_orderkey & 65535), 16, '0') AS bstr,
           CAST(o_orderkey & 255 AS BIGINT) AS b_and,
           CAST((o_orderkey & 65535) | 15 AS BIGINT) AS b_or,
           CAST(xor(o_orderkey & 65535, 255) AS BIGINT) AS b_xor,
           CAST(65535 - (o_orderkey & 65535) AS BIGINT) AS b_not,
           CAST(((o_orderkey & 65535) << 3) & 65535 AS BIGINT) AS b_shl,
           CAST((o_orderkey & 65535) >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(CAST(o_orderkey & 65535 AS BIGINT)) AS INT)
               AS b_ones,
           substr(lpad(bin(o_orderkey & 65535), 16, '0'), 5, 4)
               AS b_sub,
           lpad(bin(o_orderkey & 65535), 16, '0') || '101' AS b_cat,
           CAST(16 AS INT) AS b_len
    FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey
    """,
)
def varbit_funcs(spark, sf_dir):
    """bit/varbit surface (utils/adt/varbit.cpp): bit_and :1094,
    bit_or :1128, bitxor :1167, bitnot :1207, bitshiftleft :1237 /
    bitshiftright :1296, bitsubstr :934, bitcat :872, bitlength :1076,
    plus the int→bit cast (``bit(int4, typmod)`` :329) and bit_out's
    '0101' text form (:225). A bit(16) value is modeled as the low 16
    bits of an integer — every operator is then JVM-side integer
    arithmetic inside whole-stage codegen, and the textual form is
    lpad(bin(x)) — Spark and the reference print the identical string.
    bitnot within a declared typmod is the 16-bit complement
    (65535 - x); shifts re-mask to the declared width exactly as
    varbit.cpp truncates to atttypmod."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 80)
    b = F.col("o_orderkey").bitwiseAND(F.lit(65535))
    bstr = F.lpad(F.bin(b), 16, "0")
    return o.select(
        "o_orderkey",
        bstr.alias("bstr"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("b_and"),
        b.bitwiseOR(F.lit(15)).alias("b_or"),
        b.bitwiseXOR(F.lit(255)).alias("b_xor"),
        (F.lit(65535) - b).alias("b_not"),
        F.shiftleft(b, 3).bitwiseAND(F.lit(65535)).alias("b_shl"),
        F.shiftright(b, 2).alias("b_shr"),
        F.bit_count(b).cast("int").alias("b_ones"),
        F.substring(bstr, 5, 4).alias("b_sub"),
        F.concat(bstr, F.lit("101")).alias("b_cat"),
        F.lit(16).cast("int").alias("b_len"),
    ).orderBy("o_orderkey")


_EARTH_R = 3958.747716  # miles — earthdistance.cpp:17
_GEO_PT = (-74.0, 40.7)  # fixed probe point (lon, lat)


def _geo_dist_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """geo_distance (earthdistance.cpp:47): haversine on a sphere,
    radians in, miles out, longitude difference folded below pi.
    Identical text runs in Spark SQL and DuckDB — every function is
    IEEE double in both engines."""
    ld = f"abs(radians({lon1}) - radians({lon2}))"
    longdiff = f"(CASE WHEN {ld} > pi() THEN 2 * pi() - {ld} ELSE {ld} END)"
    half_lat = f"(abs(radians({lat1}) - radians({lat2})) / 2)"
    sino = (
        f"sqrt(sin({half_lat}) * sin({half_lat})"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin({longdiff} / 2) * sin({longdiff} / 2))"
    )
    return f"2 * {_EARTH_R} * asin(least({sino}, 1.0))"


_GEO_LAT = "(CAST((c_custkey * 7) % 180 AS DOUBLE) - 90 + 0.25)"
_GEO_LON = "(CAST((c_custkey * 13) % 360 AS DOUBLE) - 180 + 0.25)"


@query(
    "geo_earth_distance",
    f"""
    SELECT c_custkey,
           ROUND({_GEO_LAT}, 2) AS lat,
           ROUND({_GEO_LON}, 2) AS lon,
           ROUND({_geo_dist_sql(_GEO_LON, _GEO_LAT,
                                str(_GEO_PT[0]), str(_GEO_PT[1]))}, 6)
               AS miles
    FROM customer
    ORDER BY miles, c_custkey LIMIT 15
    """,
)
def geo_earth_distance(spark, sf_dir):
    """contrib/earthdistance: great-circle distance in miles
    (geo_distance_internal, earthdistance.cpp:47-71 — haversine with
    the <180-degree longitude fold and the asin clamp, EARTH_RADIUS
    3958.747716 at :17), ranking customers by distance from a fixed
    point over deterministic synthetic coordinates (the testdata
    carries no geography). The whole expression is one codegen'd
    projection feeding a TakeOrdered heap — the `point <@> point`
    operator's ORDER BY ... LIMIT shape."""
    from pyspark.sql import functions as F

    c = table(spark, sf_dir, "customer")
    dist = F.expr(
        _geo_dist_sql(_GEO_LON, _GEO_LAT, str(_GEO_PT[0]), str(_GEO_PT[1]))
    )
    return (
        c.select(
            "c_custkey",
            F.round(F.expr(_GEO_LAT), 2).alias("lat"),
            F.round(F.expr(_GEO_LON), 2).alias("lon"),
            F.round(dist, 6).alias("miles"),
        )
        .orderBy("miles", "c_custkey")
        .limit(15)
    )


@query(
    "age_function",
    """
    WITH pairs AS (
      SELECT o_orderkey AS k,
             o_orderdate + INTERVAL (o_orderkey % 37) HOUR
               + INTERVAL (o_orderkey % 53) MINUTE AS a,
             TIMESTAMP '1995-06-15 12:30:45' AS b
      FROM orders WHERE o_orderkey <= 400
    )
    SELECT k,
           CAST(date_part('year', age(a, b)) AS INT) AS years,
           CAST(date_part('month', age(a, b)) AS INT) AS mons,
           CAST(date_part('day', age(a, b)) AS INT) AS days,
           CAST(date_part('hour', age(a, b)) AS INT) AS hours,
           CAST(date_part('minute', age(a, b)) AS INT) AS mins,
           CAST(date_part('second', age(a, b)) AS DOUBLE) AS secs
    FROM pairs ORDER BY k
    """,
)
def age_function(spark, sf_dir):
    """age(a, b) — the symbolic calendar difference
    (timestamp.cpp:3506 timestamp_age + timestamp_CalculateFields):
    fieldwise subtraction with borrows cascading sec→min→hour→day→
    mon→year, day borrows adding the EARLIER timestamp's month
    length.  Compiled as ONE codegen'd struct expression
    (pg_age_parts); the oracle is DuckDB's native age(), which
    implements the same PG algorithm — a green row is cross-ENGINE
    agreement on every borrow case the 400-row date spread hits."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    # the borrow-cascade struct is projected ONCE in a subquery and the
    # six fields extract from the alias: spelling pg_age_parts(...) per
    # output column re-evaluated the whole cascade six times per row
    # (CollapseProject keeps a non-cheap alias referenced many times
    # un-inlined — the eval_bootstrap_ci fix, guide §4.4 analogue);
    # measured 1.08 → 0.60 s at sf0.1, identical rows
    return eng.sql(
        "SELECT k,"
        " _age.years AS years, _age.mons AS mons, _age.days AS days,"
        " _age.hours AS hours, _age.mins AS mins, _age.secs AS secs"
        " FROM (SELECT o_orderkey AS k,"
        "   pg_age_parts(o_orderdate + make_interval(0, 0, 0, 0,"
        "     CAST(o_orderkey % 37 AS INT),"
        "     CAST(o_orderkey % 53 AS INT), 0),"
        "    TIMESTAMP '1995-06-15 12:30:45') AS _age"
        "   FROM orders WHERE o_orderkey <= 400)"
        " ORDER BY k"
    )
