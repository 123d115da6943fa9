"""Edge-case unit tests for the round-4 function surfaces: the tsquery
constructors (to_tsany.cpp grammar corners), phrase chains, and the
format()/quoting family (varlena.cpp text_format, quote.cpp). The
driver-gated queries pin the happy paths against DuckDB; these pin the
corners that never show up in the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_CORRECT

from opengauss_vectordb_spark.functions.pg_compat import (
    num_nonnulls,
    num_nulls,
    pg_format,
    quote_ident,
    quote_literal,
    quote_nullable,
)
from opengauss_vectordb_spark.operators.text import (
    plainto_tsquery,
    ts_lexemes,
    ts_phrase_chain,
    websearch_to_tsquery,
)


def _eval(spark, text, qcol_fn):
    df = spark.createDataFrame([(text,)], "text STRING")
    ts = ts_lexemes(F.col("text"))
    return df.select(qcol_fn(ts).alias("m")).first().m


def test_plainto_punctuation_and_case(spark):
    f = lambda q: (lambda ts: plainto_tsquery(ts, q))  # noqa: E731
    assert _eval(spark, "the table has a scan", f("Table, Scan!")) is True
    assert _eval(spark, "the table only", f("Table, Scan!")) is False
    # empty / punctuation-only query = empty tsquery → matches nothing
    assert _eval(spark, "anything", f("")) is False
    assert _eval(spark, "anything", f("!!! ---")) is False


def test_websearch_grammar_corners(spark):
    f = lambda q: (lambda ts: websearch_to_tsquery(ts, q))  # noqa: E731
    # quoted phrase requires ADJACENCY, not mere co-occurrence
    assert _eval(spark, "full table scan here", f('"table scan"')) is True
    assert _eval(spark, "table of the scan", f('"table scan"')) is False
    # negation
    assert _eval(spark, "table scan", f("table -hash")) is True
    assert _eval(spark, "table hash scan", f("table -hash")) is False
    # OR splits disjuncts; AND binds within
    assert _eval(spark, "only vector here", f("vector OR stream")) is True
    assert _eval(spark, "only stream here", f("vector OR stream")) is True
    assert _eval(spark, "neither word", f("vector OR stream")) is False
    # quoted single word degrades to a plain term
    assert _eval(spark, "a table b", f('"table"')) is True
    # negated phrase
    assert _eval(spark, "x table scan y", f('x -"table scan"')) is False
    assert _eval(spark, "x scan table y", f('x -"table scan"')) is True
    # junk-only input matches nothing, never raises
    assert _eval(spark, "anything", f("---")) is False
    assert _eval(spark, "anything", f("")) is False


def test_phrase_chain_three_words(spark):
    f = lambda ws: (lambda ts: ts_phrase_chain(ts, ws))  # noqa: E731
    assert _eval(spark, "a big red dog ran", f(["big", "red", "dog"])) is True
    # pairwise-adjacent but not a 3-chain must NOT match
    assert _eval(spark, "big red x red dog", f(["big", "red", "dog"])) is False
    # document shorter than the phrase
    assert _eval(spark, "big red", f(["big", "red", "dog"])) is False


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_pg_format_conversions(spark):
    out = _one(spark, pg_format(
        "%s is 100%% %L", F.lit("x"), F.lit("O'Reilly")
    ))
    assert out == "x is 100% 'O''Reilly'"
    # %L of NULL renders the bare keyword
    assert _one(spark, pg_format("%L", F.lit(None).cast("string"))) == "NULL"
    # %s of NULL renders empty (PG text_format)
    assert _one(spark, pg_format("v=%s.", F.lit(None).cast("string"))) == "v=."


def test_pg_format_errors():
    with pytest.raises(ValueError, match="too few"):
        pg_format("%s %s", F.lit("a"))
    with pytest.raises(ValueError, match="positional"):
        pg_format("%1$s", F.lit("a"))
    with pytest.raises(ValueError, match="unknown conversion"):
        pg_format("%q", F.lit("a"))


def test_quoting_family(spark):
    assert _one(spark, quote_ident(F.lit("safe_name"))) == "safe_name"
    assert _one(spark, quote_ident(F.lit("Mixed"))) == '"Mixed"'
    assert _one(spark, quote_ident(F.lit('a"b'))) == '"a""b"'
    assert _one(spark, quote_ident(F.lit("1starts_digit"))) == '"1starts_digit"'
    assert _one(spark, quote_literal(F.lit("it's"))) == "'it''s'"
    assert _one(spark, quote_nullable(F.lit(None).cast("string"))) == "NULL"


def test_num_nulls_nonnulls(spark):
    a, b, c = F.lit(None).cast("int"), F.lit(1), F.lit(None).cast("string")
    assert _one(spark, num_nulls(a, b, c).cast("int")) == 2
    assert _one(spark, num_nonnulls(a, b, c).cast("int")) == 1


def test_to_char_numeric_long_tail(spark):
    """formatting.cpp NUM table long tail, pinned to the PG manual's
    own examples (FM semantics — no blank padding)."""
    from opengauss_vectordb_spark.functions.pg_compat import to_char

    def tc(v, model, typ="double"):
        return _one(spark, to_char(F.lit(v).cast(typ), model))

    assert tc(485, "999") == "485"
    assert tc(-485, "999") == "-485"
    assert tc(485, "S999") == "+485"
    assert tc(-485, "S999") == "-485"
    assert tc(-485, "999MI") == "485-"
    assert tc(485, "999MI") == "485"
    assert tc(-485, "999PR") == "<485>"
    assert tc(485, "999PR") == "485"
    assert tc(485, "RN") == "CDLXXXV"
    assert tc(3999, "RN") == "MMMCMXCIX"
    assert tc(485, "rn") == "cdlxxxv"
    assert tc(412, "999th") == "412th"
    assert tc(412, "999TH") == "412TH"
    assert tc(421, "999th") == "421st"
    assert tc(411, "999th") == "411th"
    assert tc(422, "999th") == "422nd"
    assert tc(423, "999th") == "423rd"
    assert tc(12, "99V999") == "12000"
    assert tc(12.4, "99V999") == "12400"
    assert tc(0.0004859, "9.99EEEE") == "4.86e-04"
    assert tc(1234.56, "9G999D99") == "1,234.56"
    assert tc(485.67, "L999D99") == "$485.67"
    assert tc(0, "B999") == ""
    assert tc(7, "B999") == "7"


def test_to_char_mode_prefixes(spark):
    """TM (translation mode) and FX (fixed mode) prefixes pass through:
    TMMonth renders the month name, FX models parse in to_date."""
    import datetime

    from opengauss_vectordb_spark.functions.pg_compat import (
        pg_to_date,
        to_char,
    )

    ts = F.lit("2026-03-07 00:00:00").cast("timestamp")
    assert _one(spark, to_char(ts, "TMMonth")) == "March"
    assert _one(spark, to_char(ts, "FMDay, TMDD")) == "Saturday, 07"
    got = _one(spark, pg_to_date(F.lit("2026-03-07"), "FXYYYY-MM-DD"))
    assert got == datetime.date(2026, 3, 7)


def test_to_char_rn_out_of_range(spark):
    """Roman-numeral models outside 1..3999 print fill characters
    (formatting.cpp int_to_roman overflow behavior)."""
    from opengauss_vectordb_spark.functions.pg_compat import to_char

    assert _one(spark, to_char(F.lit(0).cast("int"), "RN")) == "###"
    assert _one(spark, to_char(F.lit(4000).cast("int"), "RN")) == "###"
    assert _one(spark, to_char(F.lit(3999).cast("int"), "RN")) == "MMMCMXCIX"
    # the range check applies to the SIGNED value — -5 is out of range,
    # not 'V' (int_to_roman never abs()es)
    assert _one(spark, to_char(F.lit(-5).cast("int"), "RN")) == "###"


def test_pg_typeof_sleep_hll_hash(spark):
    """pg_typeof (misc.cpp; engine rewrites to the pg_typename macro
    over Spark's polymorphic typeof), pg_sleep as the documented
    batch no-op, and the contrib/hll hash family (xxhash64-backed —
    the distribution contract, not bit parity)."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    for q, want in [
        ("SELECT pg_typeof(1) AS t", "integer"),
        ("SELECT pg_typeof(CAST(1 AS BIGINT) + 2) AS t", "bigint"),
        ("SELECT pg_typeof('x') AS t", "text"),
        ("SELECT pg_typeof(1.5) AS t", "numeric"),
        ("SELECT pg_typeof(CAST(1.5 AS DOUBLE)) AS t",
         "double precision"),
        ("SELECT pg_typeof(array(1, 2)) AS t", "integer[]"),
        ("SELECT pg_typeof(upper(concat('a', 'b'))) AS t", "text"),
    ]:
        assert eng.sql(q).collect()[0].t == want, q
    assert eng.sql("SELECT pg_sleep(0.01) AS s").collect()[0].s is None
    r = eng.sql(
        "SELECT hll_hash_integer(42) AS a, hll_hash_bigint(42) AS b,"
        " hll_hash_text('42') AS c"
    ).collect()[0]
    assert isinstance(r.a, int) and isinstance(r.c, int)


def test_timestamp_compat_functions(spark):
    """clock/statement/transaction_timestamp collapse to the
    statement snapshot (autocommit), isfinite is TRUE for every
    non-null value (Spark has no ±infinity dates), and
    extract(epoch FROM x) rewrites to fractional seconds since
    1970 — Spark's EXTRACT lacks the EPOCH field."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    assert eng.sql(
        "SELECT clock_timestamp() IS NOT NULL"
    ).collect()[0][0]
    assert eng.sql(
        "SELECT statement_timestamp() <= transaction_timestamp()"
        " OR statement_timestamp() >= transaction_timestamp()"
    ).collect()[0][0]
    assert eng.sql(
        "SELECT isfinite(TIMESTAMP '2001-04-10')").collect()[0][0]
    assert eng.sql(
        "SELECT isfinite(CAST(NULL AS TIMESTAMP))"
    ).collect()[0][0] is None
    assert eng.sql(
        "SELECT extract(epoch FROM TIMESTAMP '2001-04-10 01:02:03.5')"
    ).collect()[0][0] == 986864523.5
    assert eng.sql(
        "SELECT extract(epoch FROM DATE '1970-01-02')"
    ).collect()[0][0] == 86400.0
    # other EXTRACT fields keep Spark's native path
    assert eng.sql(
        "SELECT extract(year FROM DATE '2001-04-10')"
    ).collect()[0][0] == 2001


def test_age_function(spark):
    """age(a, b) — timestamp.cpp's calendar borrow algorithm in one
    codegen'd expression, rendered in PG interval text."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    for q, want in [
        ("SELECT age(TIMESTAMP '2001-04-10', TIMESTAMP '1957-06-13')",
         "43 years 9 mons 27 days"),
        ("SELECT age(TIMESTAMP '2001-03-01', TIMESTAMP '2001-01-30')",
         "1 mon 2 days"),  # day borrow uses JANUARY (the earlier month)
        ("SELECT age(TIMESTAMP '2001-01-01', TIMESTAMP '2001-01-01')",
         "00:00:00"),
        ("SELECT age(TIMESTAMP '2001-01-01 10:20:30.5',"
         " TIMESTAMP '2001-01-01')", "10:20:30.5"),
        ("SELECT age(TIMESTAMP '1957-06-13', TIMESTAMP '2001-04-10')",
         "-43 years -9 mons -27 days"),
        ("SELECT age(TIMESTAMP '2001-01-02',"
         " TIMESTAMP '2000-12-31 23:00:00')", "1 day 01:00:00"),
    ]:
        assert eng.sql(q).collect()[0][0] == want, q


def test_string_quote_hex_and_trunc_fields(spark):
    """string_to_array/array_to_string (literal-delimiter split via
    regex quoting; NULL delimiter → chars; NULL elements skipped),
    to_hex lowercase, quote_ident/quote_literal (quote.cpp rules,
    reserved-word check documented out), and the date_trunc fields
    Spark lacks — decade/century/millennium per timestamp_trunc."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    one = lambda q: eng.sql(q).collect()[0][0]  # noqa: E731
    assert one("SELECT string_to_array('a.|b', '.|')") == ["a", "b"]
    assert one("SELECT string_to_array('abc', CAST(NULL AS STRING))") \
        == ["a", "b", "c"]
    assert one("SELECT array_to_string(array('a', NULL, 'b'), '-')") \
        == "a-b"
    assert one("SELECT to_hex(255)") == "ff"
    assert one("SELECT quote_ident('foo')") == "foo"
    assert one("SELECT quote_ident('Foo bar')") == '"Foo bar"'
    assert one("SELECT quote_literal(\"O'hare\")") == "'O''hare'"
    for f, want in [("decade", "1990-01-01"), ("century", "1901-01-01"),
                    ("millennium", "1001-01-01")]:
        assert str(one(
            f"SELECT CAST(date_trunc('{f}', DATE '1997-04-10') AS DATE)"
        )) == want
    assert str(one(
        "SELECT CAST(date_trunc('century', DATE '2001-04-10') AS DATE)"
    )) == "2001-01-01"
    # native fields keep Spark's path
    assert str(one(
        "SELECT CAST(date_trunc('year', DATE '1997-04-10') AS DATE)"
    )) == "1997-01-01"
