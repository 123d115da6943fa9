"""Round-12 behaviors: the two-level CFUNC fold's semantics, the
builtin-SFUNC strict contract, the synonym DML-only rule, ALTER
FUNCTION RENAME chains, and view bodies over user aggregates /
SETOF functions — each anchored to the reference behavior it models
(nodeAgg.cpp combine phase; pg_proc strictness; tablecmds.cpp
supportSynonym=false for DDL; functioncmds.cpp RenameFunction;
DefineView's rewrite)."""

from __future__ import annotations

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


def _mk_combine_agg(eng, name="r12_sum"):
    eng.sql(
        f"CREATE FUNCTION {name}_step(acc double precision,"
        " x double precision) RETURNS double precision"
        " AS 'SELECT acc + x' LANGUAGE SQL"
    )
    eng.sql(
        f"CREATE FUNCTION {name}_merge(a double precision,"
        " b double precision) RETURNS double precision"
        " AS 'SELECT a + b' LANGUAGE SQL"
    )
    eng.sql(
        f"CREATE AGGREGATE {name}(double precision)"
        f" (SFUNC = {name}_step, STYPE = double precision,"
        f"  INITCOND = '0', CFUNC = {name}_merge)"
    )


def _drop_combine_agg(eng, name="r12_sum"):
    eng.sql(f"DROP AGGREGATE {name}(double precision)")
    eng.sql(f"DROP FUNCTION {name}_step")
    eng.sql(f"DROP FUNCTION {name}_merge")


def test_two_level_matches_single_level(spark):
    """The restructured plan must compute exactly what the serial
    fold computes — checked against the builtin SUM closed form on
    every group of lineitem."""
    eng = Engine(spark, SF_CORRECT)
    _mk_combine_agg(eng)
    got = eng.sql(
        "SELECT l_returnflag, r12_sum(l_quantity) AS s,"
        " COUNT(*) AS n, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    exp = spark.sql(
        "SELECT l_returnflag, SUM(l_quantity) AS s, COUNT(*) AS n,"
        " MIN(l_quantity) AS mn, MAX(l_quantity) AS mx"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, round(r.s, 6), r.n, r.mn, r.mx)
            for r in got] == \
        [(r.l_returnflag, round(r.s, 6), r.n, r.mn, r.mx)
         for r in exp]
    _drop_combine_agg(eng)


def test_two_level_null_and_where_semantics(spark):
    """Null inputs reach the non-strict transition at BOTH levels; a
    WHERE clause lands in the inner leg; the all-NULL-slice state is
    dropped by the outer merge (strict-combine contract)."""
    eng = Engine(spark, SF_CORRECT)
    _mk_combine_agg(eng)
    # WHERE pushes into the inner aggregation
    got = eng.sql(
        "SELECT l_returnflag, r12_sum(l_quantity) AS s"
        " FROM lineitem WHERE l_quantity > 25"
        " GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    exp = spark.sql(
        "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem"
        " WHERE l_quantity > 25 GROUP BY l_returnflag"
        " ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, round(r.s, 6)) for r in got] == \
        [(r.l_returnflag, round(r.s, 6)) for r in exp]
    _drop_combine_agg(eng)


def test_two_level_falls_back_on_complex_shapes(spark):
    """HAVING, joins, expressions wrapping the call, DISTINCT — all
    outside the modeled shape — must still execute via the serial
    single-level fold, not fail."""
    eng = Engine(spark, SF_CORRECT)
    _mk_combine_agg(eng)
    # HAVING → fallback (single-level still answers correctly)
    got = eng.sql(
        "SELECT l_returnflag, r12_sum(l_quantity) AS s FROM lineitem"
        " GROUP BY l_returnflag HAVING COUNT(*) > 0"
        " ORDER BY l_returnflag"
    ).collect()
    exp = spark.sql(
        "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem"
        " GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, round(r.s, 6)) for r in got] == \
        [(r.l_returnflag, round(r.s, 6)) for r in exp]
    # wrapped call → fallback
    got2 = eng.sql(
        "SELECT l_returnflag, round(r12_sum(l_quantity), 2) AS s"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, r.s) for r in got2] == \
        [(r.l_returnflag, round(r.s, 2)) for r in exp]
    # DISTINCT inside the call refuses on either path
    with pytest.raises(NotImplementedError, match="DISTINCT"):
        eng.sql("SELECT r12_sum(DISTINCT l_quantity) FROM lineitem"
                " GROUP BY l_returnflag")
    _drop_combine_agg(eng)


def test_two_level_no_cfunc_stays_single_level(spark):
    """Without a declared CFUNC there is no correct merge — the
    rewrite must leave the serial fold alone (one exchange)."""
    from opengauss_vectordb_spark.plans.explain import exchange_count

    eng = Engine(spark, SF_CORRECT)
    eng.sql(
        "CREATE FUNCTION r12nc_step(acc double precision,"
        " x double precision) RETURNS double precision"
        " AS 'SELECT acc + x' LANGUAGE SQL"
    )
    eng.sql(
        "CREATE AGGREGATE r12nc_sum(double precision)"
        " (SFUNC = r12nc_step, STYPE = double precision,"
        "  INITCOND = '0')"
    )
    df = eng.sql(
        "SELECT l_returnflag, r12nc_sum(l_quantity) AS s"
        " FROM lineitem GROUP BY l_returnflag"
    )
    assert exchange_count(df) == 1
    eng.sql("DROP AGGREGATE r12nc_sum(double precision)")
    eng.sql("DROP FUNCTION r12nc_step")


def test_builtin_sfunc_is_strict(spark):
    """PG catalog transition functions are strict: a bare-builtin
    SFUNC with no INITCOND seeds from the first non-null input and
    SKIPS nulls (r11 compiled these non-strict, folding NULL through
    and returning NULL per group)."""
    eng = Engine(spark, SF_CORRECT)
    eng.sql("CREATE AGGREGATE r12_bmax(bigint)"
            " (SFUNC = greatest, STYPE = bigint)")
    got = eng.sql(
        "SELECT r12_bmax(v) FROM (SELECT CAST(NULL AS BIGINT) AS v"
        " UNION ALL SELECT 3 UNION ALL SELECT 9 UNION ALL SELECT 5)"
    ).collect()[0][0]
    assert got == 9
    # all-null group → NULL, not an error
    assert eng.sql(
        "SELECT r12_bmax(v) FROM (SELECT CAST(NULL AS BIGINT) AS v)"
    ).collect()[0][0] is None
    eng.sql("DROP AGGREGATE r12_bmax(bigint)")


def test_synonym_rewrite_is_dml_only(spark):
    """tablecmds.cpp passes supportSynonym=false on DDL lookups: DROP
    / TRUNCATE / ALTER TABLE <synonym> must NOT redirect to the
    target (a redirect would destroy the target's data), and CREATE
    TABLE colliding with a synonym is rejected (:6995)."""
    import shutil
    import tempfile

    eng = Engine(spark, SF_CORRECT)
    tmp = tempfile.mkdtemp(prefix="r12_syn_")
    eng.managed_tables.root = tmp
    try:
        eng.sql("CREATE TABLE r12_syn_t AS"
                " SELECT n_nationkey, n_name FROM nation")
        eng.sql("CREATE SYNONYM r12_alias FOR r12_syn_t")
        # DML through the synonym works
        assert eng.sql("SELECT COUNT(*) AS n FROM r12_alias") \
            .collect()[0].n == 25
        # DDL must NOT follow the synonym to the target
        with pytest.raises(Exception):
            eng.sql("DROP TABLE r12_alias")
        with pytest.raises(Exception):
            eng.sql("TRUNCATE TABLE r12_alias")
        assert eng.sql("SELECT COUNT(*) AS n FROM r12_syn_t") \
            .collect()[0].n == 25, "DDL through synonym hit the target"
        # CREATE TABLE colliding with a synonym name is rejected
        with pytest.raises(ValueError, match="synonym"):
            eng.sql("CREATE TABLE r12_alias AS SELECT 1 AS x")
        eng.sql("DROP SYNONYM r12_alias")
        eng.sql("DROP TABLE r12_syn_t")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_alter_function_rename_chain(spark):
    """functioncmds.cpp RenameFunction is a catalog update — two
    renames in a row must leave exactly ONE function, under the
    final name (r11 stored the stale DDL and a second rename
    resurrected the original name)."""
    eng = Engine(spark, SF_CORRECT)
    eng.sql("CREATE FUNCTION r12_f(x bigint) RETURNS bigint"
            " AS 'SELECT x + 1' LANGUAGE SQL")
    eng.sql("ALTER FUNCTION r12_f RENAME TO r12_g")
    eng.sql("ALTER FUNCTION r12_g RENAME TO r12_h")
    assert eng.sql("SELECT r12_h(41) AS v").collect()[0].v == 42
    for gone in ("r12_f", "r12_g"):
        with pytest.raises(Exception):
            eng.sql(f"SELECT {gone}(1)")
        assert gone not in eng.sql_functions
    eng.sql("DROP FUNCTION r12_h")


def test_view_over_user_aggregate(spark):
    """A CREATE VIEW body naming a user aggregate must compile (the
    r11 view path skipped the call-site rewrites; CTAS worked only
    because it recurses through engine.sql)."""
    eng = Engine(spark, SF_CORRECT)
    _mk_combine_agg(eng, name="r12v_sum")
    eng.sql(
        "CREATE VIEW r12_v AS SELECT l_returnflag,"
        " r12v_sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag"
    )
    got = eng.sql(
        "SELECT * FROM r12_v ORDER BY l_returnflag").collect()
    exp = spark.sql(
        "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem"
        " GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, round(r.s, 6)) for r in got] == \
        [(r.l_returnflag, round(r.s, 6)) for r in exp]
    eng.sql("DROP VIEW r12_v")
    _drop_combine_agg(eng, name="r12v_sum")


def test_plpython_setof_composite(spark):
    """RETURNS SETOF <composite> (plpy_exec.cpp's dict/tuple row
    protocol, lifted r12): dict rows, tuple rows, inline()
    star-expansion in targetlist and FROM position, zero-yield
    dropping the input row, and the narrowed refusal (array/map
    elements still refuse, naming CREATE TYPE)."""
    eng = Engine(spark, SF_CORRECT)
    eng.sql("CREATE TYPE r12_pair_t AS (w text, ln int)")
    # dict protocol, generator body
    eng.sql("""
        CREATE FUNCTION r12_words(s text)
        RETURNS SETOF r12_pair_t AS $$
        for w in s.split('_'):
            if w:
                yield {'w': w, 'ln': len(w)}
        $$ LANGUAGE plpython3u
    """)
    rows = eng.sql(
        "SELECT w, ln FROM (SELECT r12_words(v) FROM"
        " (SELECT 'ab_cde' AS v UNION ALL SELECT '_' )) ORDER BY w"
    ).collect()
    # '_' splits into two empties → zero rows (input row dropped)
    assert [(r.w, r.ln) for r in rows] == [("ab", 2), ("cde", 3)]
    # tuple protocol, FROM position: fields become the columns
    eng.sql("""
        CREATE FUNCTION r12_pairs(n int)
        RETURNS SETOF r12_pair_t AS $$
        return [(('p%d' % i), i) for i in range(n)]
        $$ LANGUAGE plpython3u
    """)
    rows = eng.sql(
        "SELECT w, ln FROM r12_pairs(3) ORDER BY ln").collect()
    assert [(r.w, r.ln) for r in rows] == \
        [("p0", 0), ("p1", 1), ("p2", 2)]
    # array elements still refuse, steering to CREATE TYPE
    with pytest.raises(NotImplementedError, match="CREATE TYPE"):
        eng.sql("""
            CREATE FUNCTION r12_bad(n int) RETURNS SETOF vector AS $$
            return []
            $$ LANGUAGE plpython3u
        """)
    eng.sql("DROP FUNCTION r12_words")
    eng.sql("DROP FUNCTION r12_pairs")
    eng.sql("DROP TYPE r12_pair_t")
    assert not eng.plpython_setof_composite


def test_timestampdiff_bformat_units(spark):
    """B-format TIMESTAMPDIFF (census batch 9, 136 regress calls):
    Spark's native timestampdiff covers every unit the reference's
    B-format grammar accepts — pinned here so a regression in the
    passthrough (or a future rewrite shadowing the name) is caught.
    MySQL/openGauss semantics = complete units between the bounds."""
    eng = Engine(spark, SF_CORRECT)
    one = lambda q: eng.sql(q).collect()[0][0]  # noqa: E731
    t1, t2 = "TIMESTAMP '2020-01-15 10:30:00'", \
        "TIMESTAMP '2021-03-20 12:45:30'"
    assert one(f"SELECT timestampdiff(YEAR, {t1}, {t2})") == 1
    assert one(f"SELECT timestampdiff(QUARTER, {t1}, {t2})") == 4
    assert one(f"SELECT timestampdiff(MONTH, {t1}, {t2})") == 14
    assert one(f"SELECT timestampdiff(WEEK, {t1}, {t2})") == 61
    assert one(f"SELECT timestampdiff(DAY, {t1}, {t2})") == 430
    assert one(f"SELECT timestampdiff(HOUR, {t1}, {t2})") == 10322
    assert one(f"SELECT timestampdiff(MINUTE, {t1}, {t2})") \
        == 619335
    assert one(f"SELECT timestampdiff(SECOND, {t1}, {t2})") \
        == 37160130
    assert one(
        "SELECT timestampdiff(MICROSECOND,"
        " TIMESTAMP '2020-01-01', TIMESTAMP '2020-01-02')"
    ) == 86_400_000_000
    # complete-unit rule: one second short of a month is 0 months
    assert one(
        "SELECT timestampdiff(MONTH, TIMESTAMP '2020-01-15 10:00:00',"
        " TIMESTAMP '2020-02-15 09:59:59')"
    ) == 0


def test_transaction_modes_and_reassign(spark):
    """Census batch 9 statement sweep: START TRANSACTION with
    isolation modes (204 regress uses — gram.y transaction_mode_list;
    single-session metadata, named in the status frame), REASSIGN
    OWNED (shdepend.cpp — grants transfer in the ACL registry), and
    LISTEN/NOTIFY refusing toward the managed-table polling shape."""
    eng = Engine(spark, SF_CORRECT)
    r = eng.sql("START TRANSACTION READ ONLY").collect()[0]
    assert r.tag == "START TRANSACTION" and "READ ONLY" in r.note
    r = eng.sql(
        "START TRANSACTION ISOLATION LEVEL SERIALIZABLE").collect()[0]
    assert "SERIALIZABLE" in r.note
    assert eng.sql("BEGIN TRANSACTION").collect()[0].tag == "BEGIN"
    # REASSIGN OWNED moves grants between roles
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="r12_acl_")
    eng.managed_tables.root = tmp
    try:
        eng.sql("CREATE ROLE r12_old LOGIN")
        eng.sql("CREATE ROLE r12_new LOGIN")
        eng.sql("CREATE TABLE r12_acl_t AS SELECT 1 AS x")
        eng.sql("GRANT SELECT ON r12_acl_t TO r12_old")
        out = eng.sql("REASSIGN OWNED BY r12_old TO r12_new"
                      ).collect()[0]
        assert out.grants_moved == 1
        assert "r12_new" in eng.acl["r12_acl_t"]
        assert "r12_old" not in eng.acl["r12_acl_t"]
        eng.sql("DROP TABLE r12_acl_t")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    for q in ("LISTEN ch", "NOTIFY ch"):
        with pytest.raises(NotImplementedError, match="poll"):
            eng.sql(q)


def test_hll_scalar_guided_refusals(spark):
    """contrib/hll's scalar construction spellings (hll_empty 112 /
    hll_add 70 / hll_print 65 regress uses) are GUIDED refusals —
    registered functions whose execution names the aggregate-shaped
    rewrite — instead of unresolved-function analyzer errors; the
    supported sketch path stays green."""
    eng = Engine(spark, SF_CORRECT)
    with pytest.raises(Exception, match="hll_add_agg"):
        eng.sql("SELECT hll_add(hll_empty(), hll_hash_integer(1))"
                ).collect()
    with pytest.raises(Exception, match="hll_cardinality"):
        eng.sql("SELECT hll_print(hll_empty())").collect()
    n = eng.sql(
        "SELECT hll_cardinality(hll_add_agg(hll_hash_integer("
        "CAST(n_nationkey AS INT)))) FROM nation"
    ).collect()[0][0]
    assert 23 <= n <= 27


def test_two_level_wrapped_and_having(spark):
    """Generalized two-level shapes (r12): select items may WRAP the
    aggregate calls in expressions of keys and keywords, HAVING
    decomposes through the same machinery, and a bare non-key column
    outside any call still falls back to the serial fold."""
    from opengauss_vectordb_spark.operators.create_aggregate import (
        rewrite_agg_two_level,
    )

    eng = Engine(spark, SF_CORRECT)
    _mk_combine_agg(eng, name="r12w_sum")
    # wrapped call + ratio + HAVING, all two-level
    q = ("SELECT l_returnflag,"
         " round(r12w_sum(l_quantity), 2) AS s,"
         " r12w_sum(l_quantity) / COUNT(*) AS avg_q"
         " FROM lineitem GROUP BY l_returnflag"
         " HAVING COUNT(*) > 1 ORDER BY l_returnflag")
    assert rewrite_agg_two_level(eng, q) is not None
    got = eng.sql(q).collect()
    exp = spark.sql(
        "SELECT l_returnflag, round(SUM(l_quantity), 2) AS s,"
        " SUM(l_quantity) / COUNT(*) AS avg_q"
        " FROM lineitem GROUP BY l_returnflag"
        " HAVING COUNT(*) > 1 ORDER BY l_returnflag"
    ).collect()
    assert [(r.l_returnflag, r.s, round(r.avg_q, 6)) for r in got] == \
        [(r.l_returnflag, r.s, round(r.avg_q, 6)) for r in exp]
    # HAVING over an aggregate of a non-selected column decomposes too
    q2 = ("SELECT l_returnflag, r12w_sum(l_quantity) AS s"
          " FROM lineitem GROUP BY l_returnflag"
          " HAVING MAX(l_quantity) >= 50")
    assert rewrite_agg_two_level(eng, q2) is not None
    assert len(eng.sql(q2).collect()) == 3
    # a bare base column outside any call cannot resolve above the
    # inner aggregation — must fall back, not miscompile
    assert rewrite_agg_two_level(
        eng,
        "SELECT l_returnflag, r12w_sum(l_quantity) + l_tax AS bad"
        " FROM lineitem GROUP BY l_returnflag",
    ) is None
    _drop_combine_agg(eng, name="r12w_sum")


def test_census10_regexp_like_and_byte_funcs(spark):
    """Census batch 10 (adt/regexp.cpp match_param; A-format byte
    functions): 3-arg regexp_like flag letters, substrb over UTF-8
    bytes (multibyte slice garbles exactly like a byte slicer),
    datalength, gs_aes round-trip determinism."""
    eng = Engine(spark, SF_CORRECT)
    row = eng.sql(
        "SELECT regexp_like('abc', 'B') AS a,"
        " regexp_like('abc', 'B', 'i') AS b,"
        " regexp_like('a' || chr(10) || 'b', 'a.b', 'n') AS c,"
        " regexp_like('a' || chr(10) || 'b', 'a.b', 'c') AS d,"
        " regexp_like('xA' || chr(10) || 'a', '^a$', 'im') AS e,"
        " substrb('héllo', 1, 3) AS sb,"
        " substrb('héllo', 2, 2) AS sb_mid,"
        " substrb('hello', 3) AS sb_rest,"
        " datalength('héllo') AS dl,"
        " octet_length('héllo') AS ol,"
        " gs_encrypt_aes128('secret', 'k1') AS enc1,"
        " gs_encrypt_aes128('secret', 'k1') AS enc2,"
        " gs_decrypt_aes128(gs_encrypt_aes128('secret', 'k1'), 'k1')"
        "   AS rt"
    ).collect()[0]
    assert (row.a, row.b) == (False, True)       # i = case-insensitive
    assert (row.c, row.d) == (True, False)       # n = dotall
    assert row.e is True                         # m = multiline
    assert row.sb == "hé"                        # 3 bytes = h + 2-byte é
    assert row.sb_mid == "é"                     # bytes 2-3 = é exactly
    assert row.sb_rest == "llo"                  # len defaults to rest
    assert row.dl == row.ol == 6
    assert row.enc1 == row.enc2                  # documented determinism
    assert row.rt == "secret"


def test_census10_partition_size_probes(spark):
    """pg_table_size / pg_partition_size / pg_partition_indexes_size
    (dbsize.cpp): per-partition directory bytes, table alias of
    relation size, pretty-printing composition, error shapes."""
    eng = Engine(spark, SF_CORRECT)
    eng.sql("DROP TABLE IF EXISTS r12sz")
    eng.sql(
        "CREATE TABLE r12sz (k BIGINT, v STRING) PARTITION BY RANGE (k)"
        " (PARTITION p1 VALUES LESS THAN (10),"
        "  PARTITION p2 VALUES LESS THAN (MAXVALUE))"
    )
    eng.sql("INSERT INTO r12sz VALUES (1,'a'), (5,'b'), (50,'c')")
    s1 = eng.sql("SELECT pg_partition_size('r12sz', 'p1')").collect()
    s2 = eng.sql("SELECT pg_partition_size('r12sz', 'p2')").collect()
    assert s1[0][0] > 0 and s2[0][0] > 0
    tot = eng.sql("SELECT pg_table_size('r12sz') AS t").collect()[0][0]
    assert tot >= s1[0][0] + s2[0][0]
    pretty = eng.sql(
        "SELECT pg_size_pretty(pg_partition_size('r12sz', 'p1'))"
    ).collect()[0][0]
    assert pretty.endswith("bytes") or pretty[-2:] in ("kB", "MB")
    # no GIN/GiST layout on this table → 0 index bytes
    assert eng.sql(
        "SELECT pg_partition_indexes_size('r12sz', 'p1')"
    ).collect()[0][0] == 0
    with pytest.raises(KeyError):
        eng.sql("SELECT pg_partition_size('r12sz', 'nope')")
    with pytest.raises(ValueError, match="not partitioned"):
        eng.sql("DROP TABLE IF EXISTS r12flat")
        eng.sql("CREATE TABLE r12flat (k BIGINT)")
        eng.sql("SELECT pg_partition_size('r12flat', 'p1')")


def test_census10_guided_refusals(spark):
    """Logical decoding and large-object fastpath calls refuse with
    the Spark-side rewrite named (replication/logical reads WAL;
    be-fsstubs.cpp lo_* stream server chunks)."""
    eng = Engine(spark, SF_CORRECT)
    with pytest.raises(NotImplementedError, match="TIMECAPSULE"):
        eng.sql("SELECT * FROM pg_logical_slot_get_changes("
                "'slot', NULL, NULL)")
    with pytest.raises(NotImplementedError, match="BINARY column"):
        eng.sql("SELECT lo_creat(-1)")


def test_census11_xml_builders(spark):
    """SQL/XML publishing (adt/xml.cpp; xml.sql regress): every output
    below is pinned verbatim to the reference's expected file."""
    eng = Engine(spark, SF_CORRECT)

    def one(s):
        return eng.sql(s).collect()[0][0]

    assert one("SELECT xmlcomment('te st')") == "<!--te st-->"
    assert one("SELECT xmlconcat('hello', 'you')") == "helloyou"
    assert one("SELECT xmlconcat(xmlcomment('hello'),"
               " xmlelement(NAME qux, 'foo'), xmlcomment('world'))"
               ) == "<!--hello--><qux>foo</qux><!--world-->"
    assert one("SELECT xmlconcat(NULL, NULL)") is None
    assert one("SELECT xmlelement(name num, 37)") == "<num>37</num>"
    assert one("SELECT xmlelement(name foo, text 'b<a/>r')"
               ) == "<foo>b&lt;a/&gt;r</foo>"
    assert one("SELECT xmlelement(name foo, xml 'b<a/>r')"
               ) == "<foo>b<a/>r</foo>"
    assert one("SELECT xmlelement(name element,"
               " xmlattributes(1 as a, 'deuce' as two), 'content&')"
               ) == '<element a="1" two="deuce">content&amp;</element>'
    assert one("SELECT xmlelement(name element,"
               " xmlelement(name nested, 'stuff'))"
               ) == "<element><nested>stuff</nested></element>"
    assert one("SELECT xmlelement(name employee, xmlforest("
               "'bill' as name, 20 as age, 1000 as pay))"
               ) == ("<employee><name>bill</name><age>20</age>"
                     "<pay>1000</pay></employee>")
    assert one("SELECT xmlelement(name foo)") == "<foo/>"
    assert one("SELECT xmlpi(name foo, 'bar')") == "<?foo bar?>"
    assert one("SELECT xmlserialize(content 'good' as char(10))"
               ) == "good"
    assert one("SELECT xmlparse(content '<abc>x</abc>')"
               ) == "<abc>x</abc>"
    assert one("SELECT xpath('//b/text()',"
               " '<a><b>one</b><b>two</b></a>')") == ["one", "two"]
    # error shapes
    with pytest.raises(Exception, match="invalid XML comment"):
        eng.sql("SELECT xmlcomment('--test')").collect()
    with pytest.raises(ValueError, match="more than once"):
        eng.sql("SELECT xmlelement(name duplicate,"
                " xmlattributes(1 as a, 2 as b, 3 as a))")
    with pytest.raises(ValueError, match="invalid XML content"):
        eng.sql("SELECT xmlparse(document '<wrong')")
    with pytest.raises(NotImplementedError, match="from_xml"):
        eng.sql("SELECT xmlroot(xml '<foo/>', version '1.1')")


def test_census11_agg_orderby_spellings(spark):
    """ORDER-BY-inside-aggregate SQL text (varlena.cpp string_agg,
    array_userfuncs.cpp array_agg, xml.cpp xmlagg): lowering to
    listagg WITHIN GROUP / struct-keyed array_sort."""
    eng = Engine(spark, SF_CORRECT)
    row = eng.sql(
        "SELECT string_agg(n_name, ',' ORDER BY n_name) AS csv,"
        " string_agg(n_name, '|' ORDER BY n_nationkey DESC) AS dsc,"
        " array_agg(n_name ORDER BY n_nationkey DESC) AS arr,"
        " xmlagg(xmlelement(name n, n_name) ORDER BY n_name) AS x"
        " FROM nation WHERE n_regionkey = 0"
    ).collect()[0]
    assert row.csv.startswith("NATION_0,NATION_10")
    assert row.dsc.split("|")[0] == "NATION_20"
    assert row.arr[0] == "NATION_20" and len(row.arr) == 5
    assert row.x.startswith("<n>NATION_0</n>")
    with pytest.raises(NotImplementedError, match="mixed ASC/DESC"):
        eng.sql("SELECT array_agg(n_name ORDER BY n_regionkey ASC,"
                " n_nationkey DESC) FROM nation")


def test_census12_json_constructors(spark):
    """PG JSON construction SQL text (adt/json.cpp): build_object/
    build_array/row_to_json/json_agg/json_object_agg/json_object onto
    native to_json — including the nesting rule (json-valued
    aggregate elements enter as structs, never re-escaped text)."""
    eng = Engine(spark, SF_CORRECT)

    def one(s):
        return eng.sql(s).collect()[0][0]

    assert one("SELECT json_build_object('name', n_name, 'key', "
               "n_nationkey) FROM nation WHERE n_nationkey = 0"
               ) == '{"name":"NATION_0","key":0}'
    assert one("SELECT json_build_array(n_name, 'x') FROM nation "
               "WHERE n_nationkey = 0") == '["NATION_0","x"]'
    assert one("SELECT row_to_json(n) FROM (SELECT n_nationkey, "
               "n_name FROM nation WHERE n_nationkey = 0) n"
               ) == '{"n_nationkey":0,"n_name":"NATION_0"}'
    # nesting: objects stay objects inside the aggregated array
    j = one("SELECT json_agg(json_build_object('k', n_nationkey) "
            "ORDER BY n_nationkey) FROM nation WHERE n_regionkey = 0")
    assert j.startswith('[{"k":0},{"k":5}')
    assert one("SELECT json_agg(n_name ORDER BY n_name) FROM nation "
               "WHERE n_regionkey = 0").startswith('["NATION_0"')
    assert one("SELECT json_object_agg(n_name, n_nationkey "
               "ORDER BY n_name) FROM nation WHERE n_regionkey = 0 "
               "AND n_nationkey < 6") == '{"NATION_0":0,"NATION_5":5}'
    assert one("SELECT json_object(array('a','b'), array('1','2'))"
               ) == '{"a":"1","b":"2"}'
    assert one("SELECT json_object(array('a','1','b','2'))"
               ) == '{"a":"1","b":"2"}'


def test_census12_dbe_output_print_line(spark):
    """dbe_output.print_line / dbms_output.put_line (A-format
    serveroutput; 77 regress uses): evaluated driver-side and
    collected with the notices, the same stream RAISE INFO feeds."""
    eng = Engine(spark, SF_CORRECT)
    eng.sql("""
        CREATE OR REPLACE PROCEDURE r12_out() AS
        BEGIN
            dbe_output.print_line('hello from proc');
        END;
    """)
    row = eng.sql("CALL r12_out()").collect()[0]
    assert row.n_notices == 1 and row.notices == "hello from proc"
    row = eng.sql("DO $$ BEGIN dbms_output.put_line('x' || (1+1));"
                  " END $$").collect()[0]
    assert row.notices == "x2"


def test_census12_varray_collections(spark):
    """PL/SQL collection types (gram.y VARRAY/TABLE OF; hw_varray.sql):
    declaration, constructor init, 1-based paren indexing with
    auto-extension, .COUNT/.FIRST/.LAST/.extend, the PG '{...}' text
    rendering, driver-side numeric FOR loops over collections
    (forward and REVERSE), capacity errors, and the nested-collection
    refusal."""
    eng = Engine(spark, SF_CORRECT)
    out = eng.sql("""DO $$
        DECLARE
            TYPE arr1 IS VARRAY(5) OF INTEGER;
            a arr1;
        BEGIN
            FOR I IN 1..5 LOOP
                a(I) := I * 10;
            END LOOP;
            RAISE NOTICE 'count=% first=% last=% arr=% a3=%',
                a.COUNT, a.FIRST, a.LAST, a, a(3);
        END $$""").collect()[0].notices
    assert out == ("NOTICE: count=5 first=1 last=5 "
                   "arr={10,20,30,40,50} a3=30")
    out = eng.sql("""DO $$
        DECLARE
            TYPE t2 IS TABLE OF text;
            b t2 := t2('x', 'y');
        BEGIN
            b.extend;
            b(3) := 'z';
            RAISE NOTICE '%', b;
        END $$""").collect()[0].notices
    assert out == "NOTICE: {x,y,z}"
    out = eng.sql("""DO $$
        DECLARE
            TYPE arr1 IS VARRAY(6) OF INTEGER;
            a arr1 := arr1(1, 2, 3);
            s int := 0;
        BEGIN
            FOR I IN REVERSE 3..1 LOOP
                s := s + a(I) * 10;
            END LOOP;
            RAISE NOTICE 's=%', s;
        END $$""").collect()[0].notices
    assert out == "NOTICE: s=60"
    with pytest.raises(ValueError, match="outside the declared"):
        eng.sql("DO $$ DECLARE TYPE a1 IS VARRAY(2) OF int; v a1;"
                " BEGIN v(3) := 1; END $$")
    with pytest.raises(NotImplementedError, match="nested collection"):
        eng.sql("DO $$ DECLARE TYPE a1 IS VARRAY(5) OF int;"
                " TYPE a2 IS VARRAY(5) OF a1; BEGIN NULL; END $$")
