"""Temp tables (gram.y OptTemp) + COMMENT ON / pg_description
(commands/comment.cpp)."""

from __future__ import annotations

import os

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


def _eng(spark, tmp_path):
    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    eng.managed_tables.root = str(tmp_path / "wh")
    return eng


def test_temp_table_lifecycle(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    for stmt in (
        "CREATE TEMP TABLE t_a (x int)",
        "CREATE TEMPORARY TABLE t_b (x int)",
        "CREATE LOCAL TEMP TABLE t_c (x int) ON COMMIT DELETE ROWS",
        "CREATE GLOBAL TEMPORARY TABLE t_d (x int)"
        " ON COMMIT PRESERVE ROWS",
    ):
        eng.sql(stmt)
    origins = {
        r.tablename: r.origin
        for r in eng.sql("SELECT * FROM pg_tables").collect()
    }
    assert all(origins[t] == "temp" for t in ("t_a", "t_b", "t_c", "t_d"))
    eng.sql("INSERT INTO t_a VALUES (1), (2)")
    assert eng.sql("SELECT COUNT(*) AS n FROM t_a").collect()[0].n == 2
    # temp DROP purges — never recyclebin-parked
    eng.sql("DROP TABLE t_b")
    assert eng.managed_tables.recyclebin == []
    dropped = eng.managed_tables.drop_temp_tables()
    assert sorted(dropped) == ["t_a", "t_c", "t_d"]
    assert not os.path.isdir(os.path.join(eng.managed_tables.root, "t_a"))


def test_temp_ctas(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql(
        "CREATE TEMP TABLE stage AS SELECT r_regionkey FROM region"
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM stage").collect()[0].n == 5
    assert eng.managed_tables.tables["stage"].get("temp") is True


def test_comment_on_roundtrip(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE cm (a int, b string)")
    eng.sql("COMMENT ON TABLE cm IS 'fact table'")
    eng.sql("COMMENT ON COLUMN cm.a IS 'the it''s key'")
    eng.sql("COMMENT ON COLUMN cm.b IS 'payload'")
    # overwrite + delete
    eng.sql("COMMENT ON COLUMN cm.b IS 'payload v2'")
    eng.sql("COMMENT ON TABLE cm IS NULL")
    rows = sorted(
        tuple(r)
        for r in eng.sql("SELECT * FROM pg_description").collect()
    )
    assert rows == [
        ("COLUMN", "cm.a", "the it's key"),
        ("COLUMN", "cm.b", "payload v2"),
    ]
    # catalog star-schema columns are commentable too
    eng.sql("COMMENT ON COLUMN orders.o_orderkey IS 'pk'")
    assert (
        ("COLUMN", "orders.o_orderkey")
        in eng.comments
    )


def test_comment_on_unknown_refused(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    with pytest.raises(KeyError, match="not found"):
        eng.sql("COMMENT ON TABLE nope IS 'x'")
    eng.sql("CREATE TABLE cc (a int)")
    with pytest.raises(KeyError, match="not found"):
        eng.sql("COMMENT ON COLUMN cc.zz IS 'x'")
    with pytest.raises(ValueError, match="table.*column"):
        eng.sql("COMMENT ON COLUMN cc IS 'x'")


def test_grant_revoke_acl(spark, tmp_path):
    """aclchk.cpp pg_class_aclcheck over the protected-view layer."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE sec (k bigint, v double)")
    eng.sql("INSERT INTO sec VALUES (1, 1.0), (2, 2.0)")
    eng.sql("GRANT SELECT ON sec TO analyst")
    # PUBLIC grant reaches every role
    eng.sql("GRANT SELECT ON sec TO public")
    eng.sql("SET ROLE analyst")
    assert eng.sql("SELECT COUNT(*) AS n FROM sec").collect()[0].n == 2
    with pytest.raises(PermissionError, match="permission denied"):
        eng.sql("DELETE FROM sec WHERE k = 1")
    with pytest.raises(PermissionError, match="permission denied"):
        eng.sql("TRUNCATE sec")
    eng.sql("SET ROLE stranger")  # public SELECT applies
    assert eng.sql("SELECT COUNT(*) AS n FROM sec").collect()[0].n == 2
    eng.sql("RESET ROLE")
    eng.sql("REVOKE SELECT ON sec FROM public")
    eng.sql("SET ROLE stranger")
    # denial must hold for COUNT(*) — the filter raises, the
    # projection alone would not be evaluated
    with pytest.raises(Exception, match="permission denied"):
        eng.sql("SELECT COUNT(*) AS n FROM sec").collect()
    eng.sql("RESET ROLE")
    # REVOKE of one priv out of a prior ALL keeps the others
    eng.sql("GRANT ALL ON sec TO writer")
    eng.sql("REVOKE DELETE ON sec FROM writer")
    eng.sql("SET ROLE writer")
    eng.sql("UPDATE sec SET v = v + 1 WHERE k = 1")
    with pytest.raises(PermissionError, match="permission denied"):
        eng.sql("DELETE FROM sec WHERE k = 1")
    eng.sql("RESET ROLE")
    privs = {
        (r.grantee, r.privilege_type)
        for r in eng.sql("SELECT * FROM table_privileges").collect()
    }
    assert ("analyst", "SELECT") in privs
    assert ("writer", "DELETE") not in privs
    # owner always bypasses; GRANT on catalog tables refuses
    assert eng.sql("SELECT COUNT(*) AS n FROM sec").collect()[0].n == 2
    with pytest.raises(NotImplementedError, match="catalog"):
        eng.sql("GRANT SELECT ON orders TO analyst")


def test_extended_statistics(spark, tmp_path):
    """ALTER TABLE ADD STATISTICS ((a,b)) + ANALYZE (analyze.cpp ES):
    composite ndv, composite-NULL fraction, multi-column MCV."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE est (a string, b string)")
    eng.sql(
        "INSERT INTO est VALUES ('x','1'), ('x','1'), ('x','2'),"
        " ('y','1'), (NULL, NULL), (NULL, '9')"
    )
    eng.sql("ALTER TABLE est ADD STATISTICS ((a, b))")
    eng.sql("ANALYZE est")
    st = eng.statistics["est"]["(a,b)"]
    # composite NULL = ALL members null (analyze.cpp:7561): one row
    assert st["null_frac"] == round(1 / 6, 6)
    # distinct non-null combos: x|1, x|2, y|1, NULL|9 → count_distinct
    # ignores rows with any NULL → 3… pin the engine's actual contract
    assert st["n_distinct"] == 3
    assert st["mcv_val"] == "x|1"
    row = eng.sql("SELECT * FROM pg_ext_stats").collect()[0]
    assert row.stakey == "(a,b)" and row.mcv_val == "x|1"
    eng.sql("ALTER TABLE est DELETE STATISTICS ((a, b))")
    assert eng.sql("SELECT * FROM pg_ext_stats").count() == 0


def test_roles_and_membership(spark, tmp_path):
    """CREATE ROLE/USER + GRANT role TO member (gram.y:1391/:14286):
    privileges flow through the transitive membership closure."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE ROLE admins")
    eng.sql("CREATE ROLE analysts")
    eng.sql("CREATE USER carol PASSWORD 'ignored'")
    eng.sql("GRANT analysts TO carol")
    eng.sql("GRANT admins TO analysts")  # nesting
    eng.sql("CREATE TABLE rsec (k bigint)")
    eng.sql("INSERT INTO rsec VALUES (1)")
    eng.sql("GRANT SELECT ON rsec TO admins")
    eng.sql("SET ROLE carol")  # carol → analysts → admins → SELECT
    assert eng.sql("SELECT COUNT(*) AS n FROM rsec").collect()[0].n == 1
    eng.sql("RESET ROLE")
    eng.sql("REVOKE admins FROM analysts")
    eng.sql("SET ROLE carol")
    with pytest.raises(Exception, match="permission denied"):
        eng.sql("SELECT COUNT(*) AS n FROM rsec").collect()
    eng.sql("RESET ROLE")
    # granting a nonexistent group refuses; privilege-keyword guard
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("GRANT nope TO carol")
    with pytest.raises(ValueError, match="ON"):
        eng.sql("GRANT SELECT TO carol")
    eng.sql("DROP ROLE admins")
    assert "admins" not in eng.roles


def test_transaction_noops_and_generic_gucs(spark, tmp_path):
    """TransactionStmt (gram.y:19519) under the autocommit position +
    VariableSetStmt (gram.y:2277) generic SET/SHOW/RESET."""
    eng = _eng(spark, tmp_path)
    assert eng.sql("BEGIN").collect()[0].note == "autocommit no-op"
    assert eng.sql("START TRANSACTION").collect()[0].tag.startswith(
        "START"
    )
    assert eng.sql("COMMIT").collect()[0].note == "autocommit no-op"
    with pytest.raises(NotImplementedError, match="TIMECAPSULE"):
        eng.sql("ROLLBACK")
    # round 9: SAVEPOINT is a named restore frame now (see
    # test_timecapsule.py::test_savepoint_rollback_release)
    assert eng.sql("SAVEPOINT s1").collect()[0].tag == "SAVEPOINT"
    eng.sql("RELEASE SAVEPOINT s1")
    eng.sql("SET search_path TO public")
    assert eng.sql("SHOW search_path").collect()[0].value == "public"
    eng.sql("SET statement_timeout = '30s'")
    assert eng.sql("SHOW statement_timeout").collect()[0].value == "30s"
    eng.sql("RESET statement_timeout")
    with pytest.raises(KeyError, match="unrecognized"):
        eng.sql("SHOW statement_timeout")


def test_create_type_composite_and_domain(spark, tmp_path):
    """CREATE TYPE AS (...) → STRUCT column; CREATE DOMAIN → alias
    (typecmds.cpp DefineDomain; CHECK refuses)."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TYPE addr AS (city text, zip int)")
    eng.sql("CREATE DOMAIN money_d AS decimal(12, 2)")
    eng.sql("CREATE TABLE ct (id bigint, home addr, bal money_d)")
    eng.sql(
        "INSERT INTO ct SELECT 1, named_struct('city', 'york',"
        " 'zip', 10), 5.5"
    )
    row = eng.sql(
        "SELECT home.city AS c, home.zip AS z,"
        " CAST(bal AS DOUBLE) AS b FROM ct"
    ).collect()[0]
    assert (row.c, row.z, row.b) == ("york", 10, 5.5)
    with pytest.raises(NotImplementedError, match="CHECK"):
        eng.sql("CREATE DOMAIN pos AS int CHECK (VALUE > 0)")
    # dropping a type in use refuses (typecmds.cpp dependency)
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    eng.sql("CREATE TABLE em (m mood)")
    with pytest.raises(ValueError, match="use"):
        eng.sql("DROP TYPE mood")
    eng.sql("DROP TABLE em PURGE")
    eng.sql("DROP TYPE mood")
    assert "mood" not in eng.user_types


def test_enum_write_validation(spark, tmp_path):
    """enum.cpp enum_in: out-of-set labels abort INSERT and UPDATE
    from inside the write job."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    eng.sql("CREATE TABLE em (m mood, v int)")
    eng.sql("INSERT INTO em VALUES ('ok', 1), (NULL, 2)")
    assert eng.sql("SELECT COUNT(*) AS n FROM em").collect()[0].n == 2
    with pytest.raises(Exception, match="invalid input value for enum"):
        eng.sql("INSERT INTO em VALUES ('angry', 3)")
    with pytest.raises(Exception, match="invalid input value for enum"):
        eng.sql("UPDATE em SET m = 'angry' WHERE v = 1")
    # valid update passes the same guard
    eng.sql("UPDATE em SET m = 'happy' WHERE v = 1")
    got = sorted(
        (r.m or "", r.v) for r in eng.sql("SELECT * FROM em").collect()
    )
    assert got == [("", 2), ("happy", 1)]


def test_create_table_like(spark, tmp_path):
    """CREATE TABLE (LIKE src) (gram.y:8249): schema clone carrying
    the enforced column semantics (pk / enum guards / generation)."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TYPE lmood AS ENUM ('a', 'b')")
    eng.sql(
        "CREATE TABLE lsrc (k bigint PRIMARY KEY, m lmood,"
        " v double GENERATED ALWAYS AS (k * 2.0) STORED)"
    )
    eng.sql("CREATE TABLE lclone (LIKE lsrc INCLUDING ALL)")
    meta = eng.managed_tables.tables["lclone"]
    assert meta["primary_key"] == ("k",)
    assert meta["enum_cols"] == {"m": "lmood"}
    assert "v" in meta["generated"]
    eng.sql("INSERT INTO lclone VALUES (3, 'a')")
    got = [tuple(r) for r in eng.sql("SELECT * FROM lclone").collect()]
    assert got == [(3, "a", 6.0)]
    # catalog source clones the star-schema shape
    eng.sql("CREATE TABLE oclone (LIKE orders)")
    assert eng.sql("SELECT * FROM oclone").columns == \
        eng.table("orders").columns
    with pytest.raises(KeyError, match="not found"):
        eng.sql("CREATE TABLE x (LIKE nope)")


def test_lock_checkpoint_noops_and_alter_add_pk(spark, tmp_path):
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE TABLE lk (k bigint)")
    assert eng.sql(
        "LOCK TABLE lk IN ACCESS EXCLUSIVE MODE NOWAIT"
    ).collect()[0].note == "no-op"
    assert eng.sql("CHECKPOINT").collect()[0].note == "no-op"
    # post-hoc PRIMARY KEY gives a CTAS table an upsert key
    eng.sql(
        "CREATE TABLE pka AS SELECT o_orderkey AS k,"
        " CAST(o_totalprice AS DOUBLE) AS v FROM orders"
        " WHERE o_orderkey <= 20"
    )
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql(
            "INSERT INTO pka SELECT 1, 0.0"
            " ON DUPLICATE KEY UPDATE v = VALUES(v)"
        )
    eng.sql("ALTER TABLE pka ADD CONSTRAINT pka_pk PRIMARY KEY (k)")
    eng.sql(
        "INSERT INTO pka SELECT 1, 999.0"
        " ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )
    assert eng.sql(
        "SELECT v FROM pka WHERE k = 1"
    ).collect()[0].v == 999.0
    with pytest.raises(KeyError, match="do not exist"):
        eng.sql("ALTER TABLE pka ADD PRIMARY KEY (zz)")


def test_create_schema_qualified_names(spark, tmp_path):
    """CREATE SCHEMA (schemacmds.cpp) + namespace.cpp resolution:
    qualified names under registered schemas rewrite to flat names;
    literals and foreign aliases stay untouched."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE SCHEMA sales AUTHORIZATION gauss")
    eng.sql(
        "CREATE TABLE sales.big AS SELECT o_orderkey AS k,"
        " CAST(o_totalprice AS DOUBLE) AS v FROM orders"
        " WHERE o_orderkey <= 50"
    )
    assert "sales__big" in eng.managed_tables.tables
    eng.sql("INSERT INTO sales.big SELECT 999999, 1.0")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM sales.big"
    ).collect()[0].n == 52
    # DML and flashback compose with qualification
    eng.sql("UPDATE sales.big SET v = 0.0 WHERE k = 999999")
    assert eng.sql(
        "SELECT v FROM sales.big WHERE k = 999999"
    ).collect()[0].v == 0.0
    # a string literal naming schema.table stays a literal
    r = eng.sql("SELECT 'see sales.big' AS t FROM region").collect()
    assert r[0].t == "see sales.big"
    # second schema, same table name — no collision
    eng.sql("CREATE SCHEMA ops")
    eng.sql("CREATE TABLE ops.big (k bigint)")
    assert {"sales__big", "ops__big"} <= set(
        eng.managed_tables.tables
    )
    with pytest.raises(ValueError, match="not empty"):
        eng.sql("DROP SCHEMA sales")
    eng.sql("DROP SCHEMA sales CASCADE")
    assert "sales__big" not in eng.managed_tables.tables
    eng.sql("DROP SCHEMA ops CASCADE")
    with pytest.raises(KeyError, match="does not exist"):
        eng.sql("DROP SCHEMA nope")


def test_search_path_resolution(spark, tmp_path):
    """SET search_path (namespace.cpp recomputeNamespacePath +
    RelnameGetRelid): unqualified names resolve through registered
    schemas in path order; public binds to the flat catalog and path
    ORDER decides shadowing; unresolved names fall through; DML
    resolves too; RESET restores flat reads."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE SCHEMA a")
    eng.sql("CREATE SCHEMA b")
    eng.sql("CREATE TABLE a.metrics AS SELECT 'from_a' AS src, 1 AS v")
    eng.sql("CREATE TABLE b.metrics AS SELECT 'from_b' AS src, 2 AS v")
    eng.sql("SET search_path = a, b")
    assert eng.sql(
        "SELECT src FROM metrics"
    ).collect()[0].src == "from_a"
    eng.sql("SET search_path = b, a")
    assert eng.sql(
        "SELECT src FROM metrics"
    ).collect()[0].src == "from_b"
    # a schema member shadowing a FLAT name: path order decides
    eng.sql("CREATE TABLE a.orders AS SELECT 'shadow' AS o_orderstatus")
    eng.sql("SET search_path = public, a")
    assert eng.sql(
        "SELECT COUNT(*) AS c FROM orders"
    ).collect()[0].c > 1  # the real star-schema table
    eng.sql("SET search_path = a, public")
    assert eng.sql(
        "SELECT o_orderstatus FROM orders"
    ).collect()[0].o_orderstatus == "shadow"
    # names in no schema fall through to the flat catalog
    assert eng.sql("SELECT COUNT(*) AS c FROM nation").collect()[0].c
    # DML through the path; string literals never rewrite
    eng.sql("SET search_path = a, b")
    eng.sql("UPDATE metrics SET v = 10")
    assert eng.sql("SELECT v FROM a.metrics").collect()[0].v == 10
    assert eng.sql(
        "SELECT 'FROM metrics' AS s"
    ).collect()[0].s == "FROM metrics"
    eng.sql("RESET search_path")
    assert eng.sql("SELECT COUNT(*) AS c FROM orders").collect()[0].c > 1
    eng.sql("DROP SCHEMA a CASCADE")
    eng.sql("DROP SCHEMA b CASCADE")


def test_create_extension_and_discard(spark, tmp_path):
    """CreateExtensionStmt no-op (the surfaces are built in) and
    DISCARD ALL session reset."""
    eng = _eng(spark, tmp_path)
    for ext in ("datavec", "pg_trgm", "dblink", "hll"):
        r = eng.sql(f"CREATE EXTENSION IF NOT EXISTS {ext}").collect()
        assert r[0].note == "built in"
    with pytest.raises(NotImplementedError, match="unloaded"):
        eng.sql("DROP EXTENSION pg_trgm")
    eng.sql("CREATE TEMP TABLE d1 (a int)")
    eng.sql("SET work_mem = '64MB'")
    eng.sql("SET ROLE nobody")
    eng.sql("DISCARD ALL")
    assert "d1" not in eng.managed_tables.tables
    assert eng.current_role is None
    with pytest.raises(KeyError, match="unrecognized"):
        eng.sql("SHOW work_mem")


def test_search_path_never_captures_creation_targets(spark, tmp_path):
    """Creation never resolves through the path
    (namespace.cpp RangeVarGetCreationNamespace): with search_path
    set and hot.t existing, CREATE TABLE t / SELECT ... INTO t
    create FLAT relations instead of redirecting onto the schema
    member; INSERT INTO and UPDATE still resolve through the path."""
    eng = _eng(spark, tmp_path)
    eng.sql("CREATE SCHEMA hot")
    eng.sql("CREATE TABLE hot.t AS SELECT 'hot' AS src")
    eng.sql("CREATE TABLE hot.t2 AS SELECT 'hot2' AS src")
    eng.sql("SET search_path = hot, public")
    # CREATE TABLE t must NOT rewrite to hot__t
    eng.sql("CREATE TABLE t AS SELECT 'flat' AS src")
    assert eng.sql("SELECT src FROM hot.t").collect()[0].src == "hot"
    eng.sql("SET search_path = public, hot")
    assert eng.sql("SELECT src FROM t").collect()[0].src == "flat"
    # SELECT ... INTO t2 must NOT rewrite to hot__t2
    eng.sql("SET search_path = hot, public")
    eng.sql("SELECT 'flat2' AS src INTO t2")
    assert eng.sql("SELECT src FROM hot.t2").collect()[0].src == "hot2"
    eng.sql("SET search_path = public, hot")
    assert eng.sql("SELECT src FROM t2").collect()[0].src == "flat2"
    # read/DML positions still resolve through the path
    eng.sql("SET search_path = hot, public")
    eng.sql("UPDATE t SET src = 'hot-upd'")
    assert eng.sql("SELECT src FROM hot.t").collect()[0].src == "hot-upd"
    eng.sql("INSERT INTO t SELECT 'hot-ins'")
    assert eng.sql(
        "SELECT COUNT(*) AS c FROM hot.t"
    ).collect()[0].c == 2
    eng.sql("RESET search_path")
    eng.sql("DROP TABLE t PURGE")
    eng.sql("DROP TABLE t2 PURGE")
    eng.sql("DROP SCHEMA hot CASCADE")
