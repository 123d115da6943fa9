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
    # array_length(arr, dim) (adt/arrayfuncs.cpp array_length; 86
    # regress uses): the engine's arrays are 1-D (SURVEY §1.3), so
    # dim 1 answers size() and any other dim is NULL — including
    # PG's empty-array rule (array_length of an empty array is NULL,
    # not 0).  Spark casts any element type to the STRING declaration.
    "array_length": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "array_length(arr ARRAY<STRING>, dim INT) RETURNS INT RETURN "
    "CASE WHEN dim = 1 AND size(arr) > 0 THEN size(arr) END",
    # lengthb (A-format byte length; adt/varlena.cpp byteaoctetlen's
    # text sibling, 107 regress uses) = octet_length
    "lengthb": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "lengthb(s STRING) RETURNS INT RETURN octet_length(s)",
    # nlssort(s, 'NLS_SORT=...') (A-format collation sort key; 123
    # regress uses): the engine's one collation is UTF-8 binary (the
    # documented charset position), whose sort key IS the string —
    # any requested NLS_SORT spec maps to it
    "nlssort": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "nlssort(s STRING, spec STRING) RETURNS STRING RETURN s",
    # standalone to_tsvector(s) (tsvector.cpp; 237 regress uses —
    # predicate positions rewrite through the GIN layer, this covers
    # the scalar spelling): the engine's tsvector model is the
    # sorted-distinct lexeme array (SURVEY §2.7), rendered as strip()
    # prints it — space-joined lexemes, no positions
    "to_tsvector": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "to_tsvector(s STRING) RETURNS STRING RETURN array_join("
    "array_sort(array_distinct(filter(split(regexp_replace(lower(s),"
    " '[^a-z0-9]+', ' '), ' '), x -> x <> ''))), ' ')",
    # array_upper (adt/arrayfuncs.cpp; 24 regress uses): 1-D arrays
    # with lower bound 1, so upper = length (NULL empty/other dims —
    # array_length's exact contract)
    "array_upper": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "array_upper(arr ARRAY<STRING>, dim INT) RETURNS INT RETURN "
    "CASE WHEN dim = 1 AND size(arr) > 0 THEN size(arr) END",
    # array_replace (array_userfuncs.cpp; 22 uses): element-wise
    # replace with NULL-safe equality (PG replaces NULL elements when
    # from IS NULL).  STRING-element declaration: Spark casts any
    # element type in, so the RESULT is array<string> — visible in
    # the schema, never silently wrong values (documented deviation)
    "array_replace": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "array_replace(arr ARRAY<STRING>, f STRING, t STRING) "
    "RETURNS ARRAY<STRING> RETURN "
    "transform(arr, x -> CASE WHEN x <=> f THEN t ELSE x END)",
    # pg_size_pretty (dbsize.cpp: successive 1024 steps, stop under
    # 10 of the unit, half-up rounding at each step)
    "pg_size_pretty": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "pg_size_pretty(sz BIGINT) RETURNS STRING RETURN "
    "CASE WHEN abs(sz) < 10240 THEN concat(sz, ' bytes') "
    "WHEN abs((sz + 512) DIV 1024) < 10240 "
    "THEN concat((sz + 512) DIV 1024, ' kB') "
    "WHEN abs(((sz + 512) DIV 1024 + 512) DIV 1024) < 10240 "
    "THEN concat(((sz + 512) DIV 1024 + 512) DIV 1024, ' MB') "
    "WHEN abs((((sz + 512) DIV 1024 + 512) DIV 1024 + 512) DIV 1024)"
    " < 10240 THEN concat((((sz + 512) DIV 1024 + 512) DIV 1024"
    " + 512) DIV 1024, ' GB') "
    "ELSE concat(((((sz + 512) DIV 1024 + 512) DIV 1024 + 512)"
    " DIV 1024 + 512) DIV 1024, ' TB') END",
    # advisory locks (lockfuncs.cpp; 24/22 regress uses): a
    # single-session batch engine has no concurrent holder to exclude
    # — lock acquires vacuously (void → NULL render), unlock reports
    # the PG contract (TRUE = was held; vacuously true here)
    "pg_advisory_lock": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "pg_advisory_lock(k BIGINT) RETURNS STRING RETURN "
    "CAST(NULL AS STRING)",
    "pg_advisory_lock_shared": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "pg_advisory_lock_shared(k BIGINT) RETURNS STRING RETURN "
    "CAST(NULL AS STRING)",
    "pg_advisory_unlock": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "pg_advisory_unlock(k BIGINT) RETURNS BOOLEAN RETURN TRUE",
    "pg_advisory_unlock_shared": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "pg_advisory_unlock_shared(k BIGINT) RETURNS BOOLEAN RETURN TRUE",
    # opengauss_version (misc openGauss probe; version() is the PG
    # spelling) — the engine identity string
    "opengauss_version": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "opengauss_version() RETURNS STRING RETURN "
    "'openGauss-compatible opengauss_vectordb_spark on Apache Spark'",
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
    # pg_typeof (utils/adt/misc.cpp) over Spark's typeof(), with the
    # common Spark→PG type-name spellings mapped (regress asserts the
    # PG names; 1,248 regress calls).  STRING argument form would lose
    # the type, so the macro is generic via a wildcard overload set —
    # Spark SQL macros are monomorphic, so we map the typeof() STRING
    # instead: callers pass typeof(expr)'s result through pg_typename,
    # and pg_typeof(expr) itself is rewritten by the engine to
    # pg_typename(typeof(expr)) so any argument type works.
    "pg_typename": "CREATE OR REPLACE TEMPORARY FUNCTION pg_typename"
    "(t STRING) RETURNS STRING RETURN CASE t"
    " WHEN 'int' THEN 'integer' WHEN 'smallint' THEN 'smallint'"
    " WHEN 'tinyint' THEN 'smallint'"
    " WHEN 'bigint' THEN 'bigint' WHEN 'string' THEN 'text'"
    " WHEN 'double' THEN 'double precision' WHEN 'float' THEN 'real'"
    " WHEN 'boolean' THEN 'boolean' WHEN 'date' THEN 'date'"
    " WHEN 'binary' THEN 'bytea'"
    " WHEN 'timestamp' THEN 'timestamp without time zone'"
    " WHEN 'timestamp_ntz' THEN 'timestamp without time zone'"
    " ELSE CASE WHEN t LIKE 'decimal%' THEN 'numeric'"
    " WHEN t LIKE 'array%' THEN concat(CASE substring(t, 7,"
    " length(t) - 7)"
    "   WHEN 'int' THEN 'integer' WHEN 'bigint' THEN 'bigint'"
    "   WHEN 'string' THEN 'text' WHEN 'double' THEN 'double precision'"
    "   ELSE substring(t, 7, length(t) - 7) END, '[]')"
    " WHEN t LIKE 'interval%' THEN 'interval' ELSE t END END",
    # pg_sleep (misc.cpp): a scheduling primitive with no meaning in
    # a batch plan — registered as the documented no-op so regress
    # scripts keep their shape (returns NULL like PG's void render)
    "pg_sleep": "CREATE OR REPLACE TEMPORARY FUNCTION pg_sleep"
    "(s DOUBLE) RETURNS STRING RETURN CAST(NULL AS STRING)",
    # contrib/hll hash family (hll_hash_integer/bigint/text): a 64-bit
    # deterministic hash per value — xxhash64 here, NOT bit-compatible
    # with postgresql-hll's murmur64 (only the distribution contract
    # matters for sketch quality; documented deviation)
    "hll_hash_integer": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "hll_hash_integer(x INT) RETURNS BIGINT RETURN xxhash64(x)",
    "hll_hash_bigint": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "hll_hash_bigint(x BIGINT) RETURNS BIGINT RETURN xxhash64(x)",
    "hll_hash_text": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "hll_hash_text(x STRING) RETURNS BIGINT RETURN xxhash64(x)",
    # contrib/hll SCALAR sketch construction (hll_empty/hll_add/
    # hll_union/hll_print): the reference builds sketches value-by-
    # value in scalar context; Spark's datasketches surface is
    # aggregate-shaped (hll_sketch_agg/hll_union_agg), so these are
    # GUIDED refusals — registered functions whose execution names
    # the rewrite rather than dying as unresolved names (census
    # batch 9; 112/70/65 regress uses)
    "hll_empty": "CREATE OR REPLACE TEMPORARY FUNCTION hll_empty() "
    "RETURNS BINARY RETURN CAST(raise_error('contrib/hll scalar "
    "sketch construction: build sketches with "
    "hll_add_agg(hll_hash_*(x)) over rows, merge with "
    "hll_union_agg, read with hll_cardinality') AS BINARY)",
    "hll_add": "CREATE OR REPLACE TEMPORARY FUNCTION hll_add"
    "(s BINARY, h BIGINT) RETURNS BINARY RETURN "
    "CAST(raise_error('contrib/hll scalar hll_add: aggregate the "
    "hashed values with hll_add_agg(hll_hash_*(x)) instead of "
    "adding one-by-one') AS BINARY)",
    "hll_print": "CREATE OR REPLACE TEMPORARY FUNCTION hll_print"
    "(s BINARY) RETURNS STRING RETURN "
    "CAST(raise_error('contrib/hll hll_print renders sketch "
    "internals: read cardinality with hll_cardinality(sketch)') "
    "AS STRING)",
    # clock_/statement_/transaction_timestamp (timestamp.cpp): in an
    # autocommit batch engine all three collapse to the statement's
    # snapshot instant — current_timestamp() (one value per statement,
    # which is also PG's statement_timestamp contract; clock_timestamp
    # per-call drift has no consumer in a deterministic plan)
    "clock_timestamp": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "clock_timestamp() RETURNS TIMESTAMP RETURN current_timestamp()",
    "statement_timestamp": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "statement_timestamp() RETURNS TIMESTAMP RETURN current_timestamp()",
    "transaction_timestamp": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "transaction_timestamp() RETURNS TIMESTAMP RETURN "
    "current_timestamp()",
    # isfinite (timestamp.cpp): Spark has no ±infinity
    # dates/timestamps, so every non-null value is finite
    "isfinite": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "isfinite(t TIMESTAMP) RETURNS BOOLEAN RETURN "
    "CASE WHEN t IS NULL THEN NULL ELSE TRUE END",
    # string_to_array / array_to_string (adt/varlena.cpp
    # text_to_array / array_to_text): Spark's split takes a REGEX, so
    # the literal delimiter is \Q...\E-quoted (delimiters containing
    # the literal sequence \E are the documented edge).  PG's edge
    # rules, each its own branch: NULL delimiter splits into
    # characters (Spark's split(s, '') appends a trailing '' — the
    # filter drops it; characters are never empty so nothing real is
    # lost), an EMPTY delimiter returns the whole string as one
    # element, and an empty INPUT returns the empty array.
    # array_to_string skips NULL elements exactly as array_join does;
    # the 3-arg null-replacement form is array_join's third argument.
    "string_to_array": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "string_to_array(s STRING, d STRING) RETURNS ARRAY<STRING> RETURN "
    "CASE WHEN s IS NULL THEN NULL "
    "WHEN d IS NULL THEN filter(split(s, ''), x -> x != '') "
    "WHEN s = '' THEN CAST(array() AS ARRAY<STRING>) "
    "WHEN d = '' THEN array(s) "
    r"ELSE split(s, concat('\\Q', d, '\\E')) END",
    "array_to_string": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "array_to_string(a ARRAY<STRING>, d STRING) RETURNS STRING RETURN "
    "array_join(a, d)",
    # to_hex (adt/varlena.cpp): PG renders lowercase
    "to_hex": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "to_hex(n BIGINT) RETURNS STRING RETURN lower(hex(n))",
    # to_binary_float / to_binary_double (A-format float casts —
    # plugin parser; 104+ regress uses): plain IEEE casts
    "to_binary_float": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "to_binary_float(x STRING) RETURNS FLOAT RETURN CAST(x AS FLOAT)",
    "to_binary_double": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "to_binary_double(x STRING) RETURNS DOUBLE RETURN "
    "CAST(x AS DOUBLE)",
    # ts_lexize (tsearchcmds.cpp; 109 regress uses): under the
    # engine's one documented dictionary — 'simple', lowercasing —
    # every dictionary name lexizes to the lowercased input (the
    # COVERAGE FTS position: one tokenizer, configs are catalog
    # entries)
    "ts_lexize": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "ts_lexize(dict STRING, w STRING) RETURNS ARRAY<STRING> RETURN "
    "CASE WHEN w IS NULL THEN NULL ELSE array(lower(w)) END",
    # quote_ident / quote_literal (adt/quote.cpp): identifiers quote
    # only when not a plain lower-case word (the reserved-keyword
    # check is omitted — documented); literals double their quotes
    "quote_ident": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "quote_ident(s STRING) RETURNS STRING RETURN "
    "CASE WHEN s RLIKE '^[a-z_][a-z0-9_]*$' THEN s "
    "ELSE concat('\"', replace(s, '\"', '\"\"'), '\"') END",
    "quote_literal": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "quote_literal(s STRING) RETURNS STRING RETURN "
    "concat('''', replace(s, '''', ''''''), '''')",
    # quote_nullable (quote.cpp): like quote_literal, NULL renders as
    # the unquoted word NULL
    "quote_nullable": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "quote_nullable(s STRING) RETURNS STRING RETURN "
    "CASE WHEN s IS NULL THEN 'NULL' ELSE quote_literal(s) END",
    # getdate() — the B-format/SQL-Server spelling of now()
    "getdate": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "getdate() RETURNS TIMESTAMP RETURN current_timestamp()",
    # substrb (A-format byte-position substring; 57 regress uses):
    # substring over the UTF-8 bytes, decoded back — a slice landing
    # mid-codepoint yields replacement characters, the same garbling a
    # byte slicer produces.  len defaults to the rest of the string.
    "substrb": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "substrb(s STRING, pos INT, len INT DEFAULT 2147483647) "
    "RETURNS STRING RETURN "
    "CAST(substring(CAST(s AS BINARY), pos, len) AS STRING)",
    # datalength (B-format byte length; 41 regress uses) =
    # octet_length of the string rendering
    "datalength": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "datalength(s STRING) RETURNS INT RETURN octet_length(s)",
    # gs_encrypt_aes128 / gs_decrypt_aes128 (openGauss AES helpers; 54
    # regress uses): Spark's JVM AES in deterministic ECB over a
    # right-padded 16-byte key, base64-rendered.  The reference salts
    # per call (its own regress can only round-trip, never value-pin
    # ciphertext); determinism is the documented deviation and the
    # round-trip contract is what tests pin.
    "gs_encrypt_aes128": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "gs_encrypt_aes128(s STRING, k STRING) RETURNS STRING RETURN "
    "base64(aes_encrypt(CAST(s AS BINARY), "
    "CAST(substring(rpad(k, 16, '0'), 1, 16) AS BINARY), 'ECB'))",
    "gs_decrypt_aes128": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "gs_decrypt_aes128(s STRING, k STRING) RETURNS STRING RETURN "
    "CAST(aes_decrypt(unbase64(s), "
    "CAST(substring(rpad(k, 16, '0'), 1, 16) AS BINARY), 'ECB') "
    "AS STRING)",
    # XML text escapes (adt/xml.cpp escape_xml: & < > — attribute
    # values also ") — consumed by the xmlelement/xmlforest builders
    # (functions/xml_compat.py)
    "xml_escape": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "xml_escape(s STRING) RETURNS STRING RETURN "
    "replace(replace(replace(s, '&', '&amp;'), '<', '&lt;'), "
    "'>', '&gt;')",
    "xml_escape_attr": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "xml_escape_attr(s STRING) RETURNS STRING RETURN "
    "replace(xml_escape(s), '\"', '&quot;')",
    # xmlcomment (xml.cpp xmlcomment: '--' or a trailing '-' is
    # invalid inside an XML comment)
    "xmlcomment": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "xmlcomment(s STRING) RETURNS STRING RETURN "
    "CASE WHEN s IS NULL THEN NULL "
    "WHEN s LIKE '%--%' OR s LIKE '%-' THEN "
    "CAST(raise_error('invalid XML comment') AS STRING) "
    "ELSE concat('<!--', s, '-->') END",
}


# sessions already carrying the function layer (strong refs: an id()
# is never reused for a live session) — the 12 DDLs are static, so one
# install per session suffices and each later Engine() skips ~0.6 s
_REGISTERED: dict[int, SparkSession] = {}


def register_pg_functions(spark: SparkSession) -> None:
    """Install the PG/datavec-name function layer into the session."""
    hit = _REGISTERED.get(id(spark))
    if hit is not None and hit is spark:
        return
    _REGISTERED[id(spark)] = spark
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
        "pg_typename",
        "pg_sleep",
        "hll_hash_integer",
        "hll_hash_bigint",
        "hll_hash_text",
        "hll_empty",
        "hll_add",
        "hll_print",
        "array_length",
        "lengthb",
        "nlssort",
        "to_tsvector",
        "array_upper",
        "array_replace",
        "pg_size_pretty",
        "pg_advisory_lock",
        "pg_advisory_lock_shared",
        "pg_advisory_unlock",
        "pg_advisory_unlock_shared",
        "opengauss_version",
        "clock_timestamp",
        "statement_timestamp",
        "transaction_timestamp",
        "isfinite",
        "string_to_array",
        "array_to_string",
        "to_hex",
        "quote_ident",
        "quote_literal",
        "pg_age_parts",
        "age",
        "to_binary_float",
        "to_binary_double",
        "ts_lexize",
        "quote_nullable",
        "getdate",
        "substrb",
        "datalength",
        "gs_encrypt_aes128",
        "gs_decrypt_aes128",
        "xml_escape",
        "xml_escape_attr",
        "xmlcomment",
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
]

# Format-model tokens Spark's datetime pattern language CANNOT express
# (week-based patterns were removed in Spark 3; SSSS/J/CC/RM never
# existed) — each maps to a Column expression instead, and to_char
# stitches expression segments between date_format segments
# (formatting.cpp's DCH_* table, the long-tail half).


def _iso_dow(col: Column) -> Column:
    """0=Monday … 6=Sunday."""
    return (F.dayofweek(col) + 5) % 7


def _expr_token_fns():
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    return {
        # seconds past midnight (0-86399) — NOT 'SS'
        "SSSS": lambda c: (
            F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
        ).cast("string"),
        # ISO week / ISO week-numbering year
        "IW": lambda c: two(F.weekofyear(c)),
        "IYYY": lambda c: F.year(F.date_add(c, 3 - _iso_dow(c))).cast(
            "string"
        ),
        # PG week of year (1 + (doy-1)/7) and week of month (1 + (dom-1)/7)
        "WW": lambda c: two(
            (F.floor((F.dayofyear(c) - 1) / 7) + 1).cast("int")
        ),
        "W": lambda c: (F.floor((F.dayofmonth(c) - 1) / 7) + 1).cast(
            "string"
        ),
        # century, Julian day number, roman-numeral month
        "CC": lambda c: (F.floor((F.year(c) - 1) / 100) + 1).cast("string"),
        "J": lambda c: (F.datediff(c, F.lit("1970-01-01")) + 2440588).cast(
            "string"
        ),
        "RM": lambda c: F.element_at(
            F.array(*[F.lit(r) for r in (
                "I", "II", "III", "IV", "V", "VI",
                "VII", "VIII", "IX", "X", "XI", "XII",
            )]),
            F.month(c),
        ),
    }


def pg_datetime_model_to_spark(model: str) -> str:
    """Translate a PG/Oracle to_char datetime format model to a Spark
    datetime pattern. Unknown letters pass through quoted so separators
    like '-', '/', ':' and literal text survive."""
    out: list[str] = []
    i = 0
    while i < len(model):
        if model[i:i + 2] in ("FM", "TM", "FX"):  # mode prefixes
            i += 2
            continue
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


def _parse_dt_model(model: str) -> list[tuple[str, str]]:
    """Split a datetime format model into ('fmt', spark-pattern-piece) /
    ('expr', token) / ('lit', text) segments. FM is stripped (our name
    tokens are already unpadded — PG's blank-padding is the documented
    delta); longest token wins, unknown letters become literals."""
    expr_tokens = sorted(_expr_token_fns(), key=len, reverse=True)
    segs: list[tuple[str, str]] = []
    i = 0
    while i < len(model):
        # FM (fill mode), TM (translation mode — our names are already
        # locale-default and unpadded) and FX (fixed/strict parse mode)
        # are prefixes that do not change this engine's rendering
        if model[i:i + 2] in ("FM", "TM", "FX"):
            i += 2
            continue
        if model.startswith('"', i):
            j = model.index('"', i + 1)
            segs.append(("lit", model[i + 1 : j]))
            i = j + 1
            continue
        hit = next((t for t in expr_tokens if model.startswith(t, i)), None)
        if hit is not None:
            segs.append(("expr", hit))
            i += len(hit)
            continue
        for tok, rep in _PG_DT_TOKENS:
            if model.startswith(tok, i):
                segs.append(("fmt", rep))
                i += len(tok)
                break
        else:
            ch = model[i]
            segs.append(("lit", ch))
            i += 1
    return segs


def _roman_numeral(n: Column) -> Column:
    """Roman numeral of an integer 1–3999 (formatting.cpp NUM_RN /
    int_to_roman): positional lookup per decimal digit — pure codegen."""
    def digit(values, d):
        return F.element_at(
            F.array(*[F.lit(v) for v in values]), (d + 1).cast("int")
        )

    return F.concat(
        digit(["", "M", "MM", "MMM"], F.floor(n / 1000)),
        digit(["", "C", "CC", "CCC", "CD", "D", "DC", "DCC", "DCCC", "CM"],
              F.floor(n / 100) % 10),
        digit(["", "X", "XX", "XXX", "XL", "L", "LX", "LXX", "LXXX", "XC"],
              F.floor(n / 10) % 10),
        digit(["", "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX"],
              n % 10),
    )


def _ordinal_suffix(n: Column) -> Column:
    """English ordinal suffix (formatting.cpp get_th): 11/12/13 → th,
    else by last digit."""
    last2 = (F.abs(n) % 100).cast("int")
    last1 = (F.abs(n) % 10).cast("int")
    return (
        F.when((last2 >= 11) & (last2 <= 13), "th")
        .when(last1 == 1, "st")
        .when(last1 == 2, "nd")
        .when(last1 == 3, "rd")
        .otherwise("th")
    )


def _to_char_numeric(col: Column, model: str) -> Column:
    """to_char(numeric, model) — formatting.cpp's NUM table: 9/0 digit
    placeholders, G/D locale separators, S/MI/PR sign modes, L currency,
    TH/th ordinals, B blank-on-zero, V implied shift, EEEE scientific,
    RN roman numerals. FM semantics throughout (no blank padding — the
    documented delta, as with the datetime names)."""
    fm = model.replace("FM", "").replace("fm", "")
    up = fm.upper()
    if up == "RN":
        # formatting.cpp int_to_roman range-checks the SIGNED value:
        # anything outside 1..3999 (negatives included) prints fill
        # characters — never abs() first
        signed = col.cast("int")
        r = _roman_numeral(signed)
        r = F.lower(r) if fm == "rn" else r  # token case sets output case
        return F.when((signed < 1) | (signed > 3999), "###").otherwise(r)
    if up.endswith("EEEE"):
        mantissa = up[:-4].rstrip()
        if "D" in mantissa:
            decimals = sum(c in "90" for c in mantissa.split("D", 1)[1])
        elif "." in mantissa:
            decimals = sum(c in "90" for c in mantissa.split(".", 1)[1])
        else:
            decimals = 0
        return F.format_string(f"%.{decimals}e", col.cast("double"))
    # normalize locale tokens to their symbols
    core = up.replace("G", ",").replace("D", ".")
    prefix, suffix = [], []
    if core.startswith("S"):
        core = core[1:]
        prefix.append(F.when(col < 0, "-").otherwise("+"))
    trailing_sign = None
    if core.endswith("S"):
        core = core[:-1]
        trailing_sign = F.when(col < 0, "-").otherwise("+")
    if core.endswith("MI"):
        core = core[:-2]
        trailing_sign = F.when(col < 0, "-").otherwise("")
    wrap_pr = core.endswith("PR")
    if wrap_pr:
        core = core[:-2]
    th = False
    if core.endswith("TH"):
        core = core[:-2]
        th = True
    if core.startswith("L"):
        core = core[1:]
        prefix.append(F.lit("$"))
    blank_zero = "B" in core
    core = core.replace("B", "")
    value = col
    if "V" in core:
        shift = sum(c in "90" for c in core.split("V", 1)[1])
        value = col.cast("double") * (10 ** shift)
        core = core.split("V", 1)[0]
    signed_elsewhere = bool(prefix) or trailing_sign is not None or wrap_pr
    if signed_elsewhere:
        value = F.abs(value)
    decimals = len(core.split(".", 1)[1]) if "." in core else 0
    s = F.format_number(value.cast("double"), decimals)
    if "," not in core:
        s = F.regexp_replace(s, ",", "")
    if th:
        # the model token's case sets the suffix case (PG rule:
        # '999th' → 412th, '999TH' → 412TH)
        suf = _ordinal_suffix(col.cast("bigint"))
        if "TH" in model:
            suf = F.upper(suf)
        s = F.concat(s, suf)
    out = F.concat(*prefix, s) if prefix else s
    if trailing_sign is not None:
        out = F.concat(out, trailing_sign)
    if wrap_pr:
        out = F.when(
            col < 0, F.concat(F.lit("<"), out, F.lit(">"))
        ).otherwise(out)
    if blank_zero:
        out = F.when(col == 0, "").otherwise(out)
    return out


def to_char(col: Column, model: str) -> Column:
    """PG to_char(timestamp/date, model) — translated datetime pattern,
    or to_char(numeric, model) for numeric models (9/0 placeholders,
    G/D/S/MI/PR/L/TH/B/V/EEEE/RN — see _to_char_numeric).

    Datetime models are stitched from date_format segments plus Column
    expressions for the tokens Spark's pattern language cannot express
    (SSSS seconds-past-midnight, WW/W week-of-year/month, IW/IYYY ISO
    week and week-year, CC century, J Julian day, RM roman month —
    formatting.cpp's DCH table long tail)."""
    if set(model) & set("90") or model.replace("FM", "").upper() == "RN":
        return _to_char_numeric(col, model)
    expr_fns = _expr_token_fns()
    # merge consecutive fmt/lit runs into single date_format calls so the
    # common all-pattern case stays ONE JVM format call
    pieces: list[Column] = []
    run: list[str] = []

    def flush():
        if run:
            pieces.append(F.date_format(col, "".join(run)))
            run.clear()

    for kind, val in _parse_dt_model(model):
        if kind == "fmt":
            run.append(val)
        elif kind == "lit":
            # any alphabetic char would be read as a pattern letter
            run.append(
                val if not any(c.isalpha() for c in val) else "'" + val + "'"
            )
        else:  # expr
            flush()
            pieces.append(expr_fns[val](col))
    flush()
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)


def pg_to_date(col: Column, model: str) -> Column:
    """PG to_date(text, model)."""
    return F.to_date(col, pg_datetime_model_to_spark(model))


def pg_to_timestamp(col: Column, model: str) -> Column:
    """PG to_timestamp(text, model)."""
    return F.to_timestamp(col, pg_datetime_model_to_spark(model))


# --- format() / quoting / null-counting misc (adt/varlena.cpp text_format,
# adt/quote.cpp quote_ident/quote_literal, utils misc num_nulls) ------------


def quote_literal(col: Column) -> Column:
    """quote_literal (adt/quote.cpp): wrap in single quotes, doubling
    embedded quotes — 'O''Reilly'. (PG additionally E''-escapes
    backslashes under standard_conforming_strings=off; this engine
    assumes the modern default, where backslashes pass through.)"""
    return F.concat(F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'"))


def quote_nullable(col: Column) -> Column:
    """quote_nullable: like quote_literal but NULL renders as the
    unquoted keyword NULL."""
    return F.coalesce(quote_literal(col), F.lit("NULL"))


def quote_ident(col: Column) -> Column:
    """quote_ident (adt/quote.cpp): double-quote an identifier unless it
    is already a safe lowercase name ([a-z_][a-z0-9_]*); embedded double
    quotes double. (PG also quotes reserved keywords; the keyword list
    is catalog state we deliberately do not carry.)"""
    safe = col.rlike("^[a-z_][a-z0-9_]*$")
    quoted = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(safe, col).otherwise(quoted)


def pg_format(fmt: str, *args: Column) -> Column:
    """format() (adt/varlena.cpp text_format): %s plain text, %I
    identifier-quote, %L literal-quote (NULL → the keyword NULL), %%
    literal percent. The format string is a plan-time literal, so the
    conversion compiles to one concat expression — no UDF. Positional
    %n$ args are not supported (raise, never silently misformat)."""
    import re

    pieces: list[Column] = []
    arg_i = 0
    pos = 0
    for m in re.finditer(r"%(.)", fmt):
        if m.start() > pos:
            pieces.append(F.lit(fmt[pos:m.start()]))
        spec = m.group(1)
        if spec == "%":
            pieces.append(F.lit("%"))
        elif spec in ("s", "I", "L"):
            if arg_i >= len(args):
                raise ValueError(f"format {fmt!r}: too few arguments")
            a = args[arg_i].cast("string")
            arg_i += 1
            if spec == "s":
                pieces.append(F.coalesce(a, F.lit("")))
            elif spec == "I":
                pieces.append(quote_ident(a))
            else:
                pieces.append(quote_nullable(a))
        elif spec.isdigit():
            raise ValueError(f"format {fmt!r}: positional %n$ not supported")
        else:
            raise ValueError(f"format {fmt!r}: unknown conversion %{spec}")
        pos = m.end()
    if pos < len(fmt):
        pieces.append(F.lit(fmt[pos:]))
    return F.concat(*pieces) if pieces else F.lit("")


def num_nulls(*cols: Column) -> Column:
    """num_nulls (utils/adt/misc): how many of the arguments are NULL."""
    out = F.lit(0)
    for c in cols:
        out = out + F.when(c.isNull(), 1).otherwise(0)
    return out


def num_nonnulls(*cols: Column) -> Column:
    out = F.lit(0)
    for c in cols:
        out = out + F.when(c.isNotNull(), 1).otherwise(0)
    return out


def _age_parts_sql() -> str:
    """Build the pg_age_parts macro: timestamp.cpp timestamp_age /
    timestamp_CalculateFields — fieldwise symbolic difference with
    single-pass borrows cascading sec→min→hour→day→month→year.  Day
    borrows add the EARLIER timestamp's month length (day_tab indexed
    by tm2/tm1 — the fixed earlier date), possibly twice (a -30 day
    field plus a 28-day February needs the second pass).  Computed on
    (hi, lo) = (greatest, least) then sign-flipped, exactly the
    reference's timestamp_FilpSign dance."""
    hi, lo = "greatest(a, b)", "least(a, b)"
    # seconds-in-minute including the microsecond fraction (epoch
    # micros are UTC-minute aligned for TIMESTAMP_NTZ)
    s0 = (f"((pmod(unix_micros({hi}), 60000000)"
          f" - pmod(unix_micros({lo}), 60000000)) / 1000000.0)")
    bs = f"(CASE WHEN {s0} < 0 THEN 1 ELSE 0 END)"
    s1 = f"({s0} + 60.0 * {bs})"
    mi0 = f"(minute({hi}) - minute({lo}) - {bs})"
    bm = f"(CASE WHEN {mi0} < 0 THEN 1 ELSE 0 END)"
    mi1 = f"({mi0} + 60 * {bm})"
    h0 = f"(hour({hi}) - hour({lo}) - {bm})"
    bh = f"(CASE WHEN {h0} < 0 THEN 1 ELSE 0 END)"
    h1 = f"({h0} + 24 * {bh})"
    dim = f"day(last_day({lo}))"
    d0 = f"(day({hi}) - day({lo}) - {bh})"
    bd1 = f"(CASE WHEN {d0} < 0 THEN 1 ELSE 0 END)"
    d1 = f"({d0} + {dim} * {bd1})"
    bd2 = f"(CASE WHEN {d1} < 0 THEN 1 ELSE 0 END)"
    d2 = f"({d1} + {dim} * {bd2})"
    mo0 = f"(month({hi}) - month({lo}) - {bd1} - {bd2})"
    bmo = f"(CASE WHEN {mo0} < 0 THEN 1 ELSE 0 END)"
    mo1 = f"({mo0} + 12 * {bmo})"
    y1 = f"(year({hi}) - year({lo}) - {bmo})"
    sign = "(CASE WHEN a < b THEN -1 ELSE 1 END)"
    return (
        "CREATE OR REPLACE TEMPORARY FUNCTION pg_age_parts"
        "(a TIMESTAMP, b TIMESTAMP) RETURNS "
        "STRUCT<years: INT, mons: INT, days: INT, hours: INT,"
        " mins: INT, secs: DOUBLE> RETURN named_struct("
        f"'years', CAST({sign} * {y1} AS INT),"
        f" 'mons', CAST({sign} * {mo1} AS INT),"
        f" 'days', CAST({sign} * {d2} AS INT),"
        f" 'hours', CAST({sign} * {h1} AS INT),"
        f" 'mins', CAST({sign} * {mi1} AS INT),"
        f" 'secs', CAST({sign} AS DOUBLE) * {s1})"
    )


def _age_sql() -> str:
    """age(a, b) → PG's postgres-style interval text over
    pg_age_parts (interval_out: nonzero year/mon/day words, a
    sign-prefixed zero-padded HH:MM:SS[.ffffff] time part shown when
    nonzero or when everything is zero)."""
    p = "pg_age_parts(a, b)"
    def word(f, w):
        v = f"{p}.{f}"
        return (f"CASE WHEN {v} != 0 THEN concat({v}, ' {w}',"
                f" CASE WHEN abs({v}) != 1 THEN 's' ELSE '' END)"
                " END")
    t_nonzero = (f"({p}.hours != 0 OR {p}.mins != 0 OR {p}.secs != 0.0)")
    all_zero = (f"({p}.years = 0 AND {p}.mons = 0 AND {p}.days = 0"
                f" AND NOT {t_nonzero})")
    frac = f"CAST(round((abs({p}.secs) % 1.0) * 1000000) AS BIGINT)"
    secs_txt = (
        f"concat(lpad(CAST(floor(abs({p}.secs)) AS BIGINT), 2, '0'),"
        f" CASE WHEN {frac} > 0 THEN"
        f" concat('.', regexp_replace(lpad({frac}, 6, '0'),"
        " '0+$', '')) ELSE '' END)"
    )
    time_txt = (
        f"concat(CASE WHEN {p}.hours < 0 OR {p}.mins < 0"
        f" OR {p}.secs < 0 THEN '-' ELSE '' END,"
        f" lpad(abs({p}.hours), 2, '0'), ':',"
        f" lpad(abs({p}.mins), 2, '0'), ':', {secs_txt})"
    )
    return (
        "CREATE OR REPLACE TEMPORARY FUNCTION age"
        "(a TIMESTAMP, b TIMESTAMP) RETURNS STRING RETURN "
        "concat_ws(' ', "
        f"{word('years', 'year')}, {word('mons', 'mon')},"
        f" {word('days', 'day')},"
        f" CASE WHEN {t_nonzero} OR {all_zero} THEN {time_txt} END)"
    )


_SQL_MACROS["pg_age_parts"] = _age_parts_sql()
_SQL_MACROS["age"] = _age_sql()
