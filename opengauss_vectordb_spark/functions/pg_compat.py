"""PostgreSQL-name compatibility functions registered into Spark SQL.

Reference surface: `src/common/backend/catalog/builtin_funcs.ini` + the
Oracle-compat layer `adt/a_compat.cpp`. Spark already ships nvl/nvl2/
decode/greatest/least/coalesce/nullif under PG/Oracle names; what's
missing is registered here as SQL expression macros (not Python UDFs — the
bodies are Catalyst expressions, so they stay codegen'd).

Semantics deltas handled (SURVEY.md §7 "hard positions"):
  * int/int division truncates in PG → pg_div
  * division by zero errors in PG, NULL in Spark → pg_checked_div keeps
    the Spark NULL but is explicit about it
  * vector distance operators under their datavec names
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_MACROS = {
    # PG-style integer division truncating toward zero (adt/int.cpp
    # int4div); Spark's DIV matches Java/PG truncation semantics
    "pg_div": "CREATE OR REPLACE TEMPORARY FUNCTION pg_div(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a DIV b",
    # strpos/position (adt/varlena.cpp textpos)
    "strpos": "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
    "RETURNS INT RETURN instr(s, sub)",
    # l2/cosine/ip/l1 distances under datavec names over array<double>
    "l2_distance": "CREATE OR REPLACE TEMPORARY FUNCTION l2_distance"
    "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    "inner_product": "CREATE OR REPLACE TEMPORARY FUNCTION inner_product"
    "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
    "(acc, v) -> acc + v)",
    "cosine_distance": "CREATE OR REPLACE TEMPORARY FUNCTION cosine_distance"
    "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "1.0 - inner_product(a, b) / "
    "(sqrt(inner_product(a, a)) * sqrt(inner_product(b, b)))",
    "l1_distance": "CREATE OR REPLACE TEMPORARY FUNCTION l1_distance"
    "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), CAST(0.0 AS DOUBLE), "
    "(acc, v) -> acc + v)",
    "vector_dims": "CREATE OR REPLACE TEMPORARY FUNCTION vector_dims"
    "(a ARRAY<DOUBLE>) RETURNS INT RETURN size(a)",
    "vector_norm": "CREATE OR REPLACE TEMPORARY FUNCTION vector_norm"
    "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN sqrt(inner_product(a, a))",
    "l2_normalize": "CREATE OR REPLACE TEMPORARY FUNCTION l2_normalize"
    "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> RETURN "
    "transform(a, x -> x / vector_norm(a))",
    "subvector": "CREATE OR REPLACE TEMPORARY FUNCTION subvector"
    "(a ARRAY<DOUBLE>, start INT, count INT) RETURNS ARRAY<DOUBLE> RETURN "
    "slice(a, start, count)",
    "binary_quantize": "CREATE OR REPLACE TEMPORARY FUNCTION binary_quantize"
    "(a ARRAY<DOUBLE>) RETURNS ARRAY<INT> RETURN "
    "transform(a, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)",
    # lenient numeric parse (formatting.cpp to_number / Oracle a_compat):
    # strip currency symbols, group separators, padding; exact decimal out
    "pg_to_number": "CREATE OR REPLACE TEMPORARY FUNCTION pg_to_number(s STRING) "
    "RETURNS DECIMAL(18,4) RETURN "
    r"CAST(regexp_replace(s, '[^0-9.\\-]', '') AS DECIMAL(18,4))",
}


def register_pg_functions(spark: SparkSession) -> None:
    """Install the PG/datavec-name function layer into the session."""
    # ordering matters: later macros call earlier ones
    for name in (
        "strpos",
        "inner_product",
        "l2_distance",
        "cosine_distance",
        "l1_distance",
        "vector_dims",
        "vector_norm",
        "l2_normalize",
        "subvector",
        "binary_quantize",
        "pg_div",
        "pg_to_number",
    ):
        spark.sql(_SQL_MACROS[name])


# ---------------------------------------------------------------------------
# to_char / to_date / to_timestamp format-model translation
# (adt/formatting.cpp — PG/Oracle format models → Spark datetime patterns).
# Documented subset: the patterns below; case variants of day/month names
# (PG 'DAY' = padded uppercase) are normalized to Spark's title-case forms.
# ---------------------------------------------------------------------------

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# longest-first so HH24 wins over HH, DDD over DD, MONTH over MON
_PG_DT_TOKENS = [
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SSSS", "ss"),
    ("SS", "ss"),
    ("MS", "SSS"),
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MONTH", "MMMM"),
    ("Month", "MMMM"),
    ("month", "MMMM"),
    ("MON", "MMM"),
    ("Mon", "MMM"),
    ("mon", "MMM"),
    ("MM", "MM"),
    ("DDD", "D"),
    ("DD", "dd"),
    ("DAY", "EEEE"),
    ("Day", "EEEE"),
    ("day", "EEEE"),
    ("DY", "EEE"),
    ("Dy", "EEE"),
    ("dy", "EEE"),
    ("AM", "a"),
    ("PM", "a"),
    ("Q", "Q"),
    ("J", "D"),
]


def pg_datetime_model_to_spark(model: str) -> str:
    """Translate a PG/Oracle to_char datetime format model to a Spark
    datetime pattern. Unknown letters pass through quoted so separators
    like '-', '/', ':' and literal text survive."""
    out: list[str] = []
    i = 0
    while i < len(model):
        if model.startswith('"', i):  # PG quoted literal "..."
            j = model.index('"', i + 1)
            out.append("'" + model[i + 1 : j] + "'")
            i = j + 1
            continue
        for tok, rep in _PG_DT_TOKENS:
            if model.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            ch = model[i]
            out.append(ch if not ch.isalpha() else "'" + ch + "'")
            i += 1
    return "".join(out)


def to_char(col: Column, model: str) -> Column:
    """PG to_char(timestamp/date, model) — translated datetime pattern,
    or to_char(numeric, model) for models of 9/0/,/./FM."""
    if set(model) & set("90"):  # numeric model (9/0 digit placeholders)
        fm = model.replace("FM", "")
        decimals = len(fm.split(".", 1)[1]) if "." in fm else 0
        s = F.format_number(col.cast("double"), decimals)
        if "," not in fm:
            s = F.regexp_replace(s, ",", "")
        return s
    return F.date_format(col, pg_datetime_model_to_spark(model))


def pg_to_date(col: Column, model: str) -> Column:
    """PG to_date(text, model)."""
    return F.to_date(col, pg_datetime_model_to_spark(model))


def pg_to_timestamp(col: Column, model: str) -> Column:
    """PG to_timestamp(text, model)."""
    return F.to_timestamp(col, pg_datetime_model_to_spark(model))
