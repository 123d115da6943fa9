"""Contrib-module function tranches (SURVEY.md §2.7 long tail): pgcrypto,
fuzzystrmatch, unaccent, and pgstattuple — the reference ships these as
loadable extensions (contrib/pgcrypto, contrib/fuzzystrmatch,
contrib/unaccent, contrib/pgstattuple); here they are native Spark
expressions plus one storage-metadata introspection.

Every query follows the registry determinism conventions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..catalog import TABLES, table
from ..registry import query

# FIPS 180-2 test vectors for "abc" (public standard appendices) — the
# digest() value pins DuckDB cannot compute (no sha384/sha512 there).
_SHA512_ABC = (
    "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
    "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"
)
_SHA384_ABC = (
    "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed"
    "8086072ba1e7cc2358baeca134c825a7"
)
_AES_KEY = "0123456789abcdef"  # 16-byte AES-128 key


@query(
    "pgcrypto_funcs",
    """
    SELECT p_partkey,
           sha256(p_name) AS name_sha256,
           TRUE AS sha512_vec_ok,
           TRUE AS sha384_vec_ok,
           TRUE AS ecb_roundtrip_ok,
           TRUE AS ecb_deterministic,
           TRUE AS cipher_differs,
           TRUE AS gcm_roundtrip_ok
    FROM part WHERE p_partkey <= 15 ORDER BY p_partkey
    """,
)
def pgcrypto_funcs(spark, sf_dir):
    """contrib/pgcrypto surface: digest() (sha256 value-matched against
    DuckDB; sha384/sha512 pinned against the FIPS 180-2 "abc" test
    vectors, which DuckDB cannot compute), and encrypt()/decrypt() as
    Spark's aes_encrypt/aes_decrypt — ECB (pgcrypto's cipher-mode
    default is CBC; ECB is the deterministic mode both engines can pin
    without an IV channel) round-trips and is deterministic, GCM
    (the authenticated mode) round-trips.  Booleans are the honest
    oracle for ciphertext properties: DuckDB has no AES, so the oracle
    asserts the round-trip CONTRACT, not bytes.

    Scale: pure column expressions inside whole-stage codegen — the JVM
    Cipher path, no Python."""
    key = F.lit(_AES_KEY).cast("binary")
    name_bin = F.col("p_name").cast("binary")
    enc = F.aes_encrypt(name_bin, key, F.lit("ECB"))
    enc2 = F.aes_encrypt(name_bin, key, F.lit("ECB"))
    dec = F.aes_decrypt(enc, key, F.lit("ECB")).cast("string")
    gcm_dec = F.aes_decrypt(
        F.aes_encrypt(name_bin, key, F.lit("GCM")), key, F.lit("GCM")
    ).cast("string")
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 15)
    return p.select(
        "p_partkey",
        F.sha2(name_bin, 256).alias("name_sha256"),
        (F.sha2(F.lit("abc").cast("binary"), 512) == _SHA512_ABC)
        .alias("sha512_vec_ok"),
        (F.sha2(F.lit("abc").cast("binary"), 384) == _SHA384_ABC)
        .alias("sha384_vec_ok"),
        (dec == F.col("p_name")).alias("ecb_roundtrip_ok"),
        (F.hex(enc) == F.hex(enc2)).alias("ecb_deterministic"),
        (F.hex(enc) != F.hex(name_bin)).alias("cipher_differs"),
        (gcm_dec == F.col("p_name")).alias("gcm_roundtrip_ok"),
    ).orderBy("p_partkey")


# fuzzystrmatch doc examples + classic pairs; soundex codes are from the
# standard Russell/Odell algorithm the PG docs print (fuzzystrmatch.c).
_FUZZY_ROWS = [
    (1, "Anne", "Ann", "café"),
    (2, "Andrew", "Margaret", "naïve"),
    (3, "Robert", "Rupert", "Zürich"),
    (4, "Smith", "Smyth", "crème brûlée"),
    (5, "Washington", "Lee", "São Tomé"),
]
_SOUNDEX = {
    "Anne": "A500", "Ann": "A500", "Andrew": "A536", "Margaret": "M626",
    "Robert": "R163", "Rupert": "R163", "Smith": "S530", "Smyth": "S530",
    "Washington": "W252", "Lee": "L000",
}
_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"

_FUZZY_VALUES_SQL = ", ".join(
    f"({i}, '{a}', '{b}', '{acc}')" for i, a, b, acc in _FUZZY_ROWS
)
_FUZZY_ORACLE_ROWS = ", ".join(
    f"({i}, '{a}', '{b}', '{_SOUNDEX[a]}', '{_SOUNDEX[b]}')"
    for i, a, b, _acc in _FUZZY_ROWS
)


@query(
    "fuzzystrmatch_unaccent",
    f"""
    WITH src(id, a, b, acc) AS (VALUES {_FUZZY_VALUES_SQL}),
         sx(id, a, b, soundex_a, soundex_b) AS
           (VALUES {_FUZZY_ORACLE_ROWS})
    SELECT s.id, s.a, s.b,
           sx.soundex_a, sx.soundex_b,
           (sx.soundex_a = sx.soundex_b) AS same_code,
           CAST(levenshtein(s.a, s.b) AS INT) AS lev,
           strip_accents(s.acc) AS unaccented
    FROM src s JOIN sx ON s.id = sx.id ORDER BY s.id
    """,
)
def fuzzystrmatch_unaccent(spark, sf_dir):
    """contrib/fuzzystrmatch soundex()/levenshtein() + contrib/unaccent:
    Spark computes soundex natively (the same Russell/Odell codes the
    PG docs print — the oracle pins those published codes as literals,
    since DuckDB has no soundex), levenshtein is native in both
    engines, and unaccent() is a translate() over the Latin-1
    accent→base map (DuckDB verifies with strip_accents).

    Scale: literal-driven function tranche; on real data these are pure
    codegen column expressions."""
    # inline-VALUES anchor instead of createDataFrame (r13, guide §5 —
    # the status_frame trick): the projection over a LocalRelation is
    # ConvertToLocalRelation-foldable, so the build skips the
    # local-relation RDD machinery and the sort runs over a folded leaf
    src = spark.sql(
        "SELECT * FROM VALUES "
        + _FUZZY_VALUES_SQL
        + " AS t(id, a, b, acc)"
    )
    return src.select(
        "id", "a", "b",
        F.soundex("a").alias("soundex_a"),
        F.soundex("b").alias("soundex_b"),
        (F.soundex("a") == F.soundex("b")).alias("same_code"),
        F.levenshtein("a", "b").alias("lev"),
        F.translate("acc", _ACCENT_SRC, _ACCENT_DST).alias("unaccented"),
    ).orderBy("id")


_STATTUPLE_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS tablename,"
    f" (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}) AS n_rows,"
    f" (SELECT CAST(COUNT(*) AS INT) FROM information_schema.columns"
    f"  WHERE table_name = '{t}') AS n_cols"
    for t in sorted(TABLES)
)


@query(
    "pgstattuple_report",
    f"SELECT * FROM ({_STATTUPLE_ORACLE}) ORDER BY tablename",
)
def pgstattuple_report(spark, sf_dir):
    """contrib/pgstattuple analogue: physical storage statistics read
    from parquet FOOTERS only — row counts and column counts per
    catalog table, no data scan (pgstattuple walks heap pages; the
    columnar equivalent of 'page metadata' is the parquet footer).
    The oracle recomputes the same facts the slow way (COUNT(*) +
    information_schema), proving footer metadata agrees with the data.

    Scale: O(tables) footer reads on the driver — exactly how a catalog
    ANALYZE primes row counts on a 100 TB lake without scanning it
    (at many-file scale the listing fans out, but stays metadata-only).
    """
    import pyarrow.parquet as pq

    rows = []
    for t in sorted(TABLES):
        f = pq.ParquetFile(os.path.join(sf_dir, f"{t}.parquet"))
        rows.append((t, f.metadata.num_rows, len(f.schema_arrow.names)))
    return spark.createDataFrame(
        rows, "tablename STRING, n_rows BIGINT, n_cols INT"
    )


@query(
    "xml_funcs",
    """
    SELECT n_nationkey, n_name,
           n_name AS xml_name,
           CAST(n_nationkey AS INT) AS xml_key,
           TRUE AS key_match,
           CAST(2 AS INT) AS n_items
    FROM nation ORDER BY n_nationkey
    """,
)
def xml_funcs(spark, sf_dir):
    """XML functions (contrib/xml2 + the core xmltype surface,
    utils/adt/xml.cpp): construct an XML document per row, then extract
    scalars back with XPath — xpath_string / xpath_int /
    xpath_boolean / xpath (node-set).  DuckDB has no XPath, so the
    oracle recomputes the round-trip identities directly from the
    source columns — value-checked, since any extraction error breaks
    the equality.

    Scale: Spark's xpath_* are JVM expressions (codegen'd row-at-a-time
    XML parse) — one scan, no shuffle, no Python."""
    n = table(spark, sf_dir, "nation")
    key_s = F.col("n_nationkey").cast("string")
    xml = F.concat(
        F.lit("<row><k>"), key_s, F.lit("</k><n>"), F.col("n_name"),
        F.lit("</n><tags><t>a</t><t>b</t></tags></row>"),
    )
    return n.select(
        "n_nationkey",
        "n_name",
        F.xpath_string(xml, F.lit("/row/n")).alias("xml_name"),
        F.xpath_int(xml, F.lit("/row/k")).alias("xml_key"),
        (F.xpath_int(xml, F.lit("/row/k")) == F.col("n_nationkey"))
        .alias("key_match"),
        F.size(F.xpath(xml, F.lit("/row/tags/t/text()"))).alias("n_items"),
    ).orderBy("n_nationkey")


_PAGEINSPECT_KEYS = [
    ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"),
    ("nation", "n_nationkey"),
    ("orders", "o_orderkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
]

_PAGEINSPECT_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS tablename, '{k}' AS key_col,"
    f" (SELECT CAST(MIN({k}) AS BIGINT) FROM {t}) AS stats_min,"
    f" (SELECT CAST(MAX({k}) AS BIGINT) FROM {t}) AS stats_max,"
    f" (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}) AS stats_rows"
    for t, k in _PAGEINSPECT_KEYS
)


@query(
    "pageinspect_stats",
    f"SELECT * FROM ({_PAGEINSPECT_ORACLE}) ORDER BY tablename",
)
def pageinspect_stats(spark, sf_dir):
    """contrib/pageinspect analogue for a columnar layout: the rowgroup
    min/max statistics read from parquet FOOTERS — the exact metadata
    the CStore CU rough-check (cstore_roughcheck_func.cpp) and this
    engine's rowgroup-pruned scans consult before any data I/O.  The
    oracle recomputes MIN/MAX/COUNT from the DATA, so a green row
    proves the pruning metadata is truthful: a filter outside
    [stats_min, stats_max] can safely skip the rowgroup.

    Scale: footer reads only (O(row groups), zero data I/O) — the same
    introspection a 100 TB table exposes through its file manifests."""
    import pyarrow.parquet as pq

    rows = []
    for t, k in _PAGEINSPECT_KEYS:
        f = pq.ParquetFile(os.path.join(sf_dir, f"{t}.parquet"))
        idx = f.schema_arrow.names.index(k)
        mins, maxes, n = [], [], 0
        for i in range(f.metadata.num_row_groups):
            rg = f.metadata.row_group(i)
            st = rg.column(idx).statistics
            mins.append(st.min)
            maxes.append(st.max)
            n += rg.num_rows
        rows.append((t, k, int(min(mins)), int(max(maxes)), n))
    return spark.createDataFrame(
        rows,
        "tablename STRING, key_col STRING, stats_min BIGINT,"
        " stats_max BIGINT, stats_rows BIGINT",
    )
