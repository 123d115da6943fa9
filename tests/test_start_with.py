"""START WITH / CONNECT BY → WITH RECURSIVE (operators/start_with.py;
parse_startwith.cpp transformStartWith, nodeStartWithOp.cpp pseudo
columns, sw_basic.sql regress shapes): both walk directions, every
pseudo column, NOCYCLE + CONNECT_BY_ISCYCLE, ORDER SIBLINGS BY
depth-first preorder, post-hierarchy WHERE, and the refusal edges."""

from __future__ import annotations

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark, SF_CORRECT)
    e.sql("CREATE TABLE sw_area (id BIGINT, pid BIGINT, name STRING)")
    e.sql(
        "INSERT INTO sw_area VALUES"
        " (1, 0, 'china'), (2, 1, 'hunan'), (3, 1, 'guangdong'),"
        " (10, 3, 'shenzhen'), (11, 2, 'changsha'), (13, 2, 'hengyang'),"
        " (14, 13, 'leiyang'), (15, 10, 'longgang'), (16, 10, 'futian')"
    )
    return e


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_leafward_walk_all_pseudo_columns(eng):
    got = rows(eng.sql("""
        SELECT name, LEVEL, connect_by_isleaf,
               connect_by_root(name), sys_connect_by_path(name, '@')
        FROM sw_area
        START WITH name = 'china'
        CONNECT BY PRIOR id = pid
        ORDER BY sys_connect_by_path(name, '@')
    """))
    assert got == [
        ("china", 1, 0, "china", "@china"),
        ("guangdong", 2, 0, "china", "@china@guangdong"),
        ("shenzhen", 3, 0, "china", "@china@guangdong@shenzhen"),
        ("futian", 4, 1, "china", "@china@guangdong@shenzhen@futian"),
        ("longgang", 4, 1, "china",
         "@china@guangdong@shenzhen@longgang"),
        ("hunan", 2, 0, "china", "@china@hunan"),
        ("changsha", 3, 1, "china", "@china@hunan@changsha"),
        ("hengyang", 3, 0, "china", "@china@hunan@hengyang"),
        ("leiyang", 4, 1, "china", "@china@hunan@hengyang@leiyang"),
    ]
    # bare pseudo items keep the reference's output column names
    cols = eng.sql("""
        SELECT LEVEL, connect_by_isleaf, connect_by_root(name),
               sys_connect_by_path(name, '/')
        FROM sw_area START WITH pid = 0 CONNECT BY PRIOR id = pid
    """).columns
    assert cols == ["level", "connect_by_isleaf", "connect_by_root",
                    "sys_connect_by_path"]


def test_rootward_walk(eng):
    got = rows(eng.sql("""
        SELECT name, LEVEL AS lvl, sys_connect_by_path(name, '/') AS p
        FROM sw_area
        START WITH name = 'leiyang'
        CONNECT BY id = PRIOR pid
        ORDER BY lvl
    """))
    assert got == [
        ("leiyang", 1, "/leiyang"),
        ("hengyang", 2, "/leiyang/hengyang"),
        ("hunan", 3, "/leiyang/hengyang/hunan"),
        ("china", 4, "/leiyang/hengyang/hunan/china"),
    ]


def test_multiple_anchor_chains(eng):
    # two anchors walk two independent chains (sw_basic 1.3)
    got = rows(eng.sql("""
        SELECT connect_by_root(name) AS root, COUNT(*) AS n
        FROM sw_area
        START WITH name = 'leiyang' OR name = 'futian'
        CONNECT BY id = PRIOR pid
        GROUP BY connect_by_root(name) ORDER BY root
    """))
    assert got == [("futian", 4), ("leiyang", 4)]


def test_nocycle_and_iscycle(eng):
    eng.sql("CREATE TABLE sw_cyc (id BIGINT, pid BIGINT, name STRING)")
    eng.sql("INSERT INTO sw_cyc VALUES (1, 3, 'a'), (2, 1, 'b'),"
            " (3, 2, 'c'), (4, 2, 'd')")
    got = rows(eng.sql("""
        SELECT name, LEVEL, connect_by_iscycle
        FROM sw_cyc START WITH name = 'a'
        CONNECT BY NOCYCLE PRIOR id = pid
        ORDER BY LEVEL, name
    """))
    # c's only child would revisit a → pruned, c flagged cyclic
    assert got == [("a", 1, 0), ("b", 2, 0), ("c", 3, 1), ("d", 3, 0)]
    # iscycle without NOCYCLE errors, as the reference does
    with pytest.raises(ValueError, match="NOCYCLE"):
        eng.sql("SELECT connect_by_iscycle FROM sw_cyc "
                "START WITH id = 1 CONNECT BY PRIOR id = pid")


def test_order_siblings_by(eng):
    eng.sql("CREATE TABLE sw_sib (id BIGINT, pid BIGINT, name STRING)")
    eng.sql("INSERT INTO sw_sib VALUES (1,0,'root'),(3,1,'c'),"
            "(2,1,'b'),(4,1,'a'),(5,2,'z'),(6,2,'y')")
    got = rows(eng.sql("""
        SELECT name FROM sw_sib START WITH pid = 0
        CONNECT BY PRIOR id = pid ORDER SIBLINGS BY name
    """))
    # depth-first preorder, siblings alphabetical
    assert [r[0] for r in got] == ["root", "a", "b", "y", "z", "c"]
    # numeric sibling key orders numerically (5 < 10, not '10' < '5')
    eng.sql("CREATE TABLE sw_sibn (id BIGINT, pid BIGINT)")
    eng.sql("INSERT INTO sw_sibn VALUES (1,0),(10,1),(5,1),(2,1)")
    got = rows(eng.sql("""
        SELECT id FROM sw_sibn START WITH pid = 0
        CONNECT BY PRIOR id = pid ORDER SIBLINGS BY id
    """))
    assert [r[0] for r in got] == [1, 2, 5, 10]


def test_level_bound_and_where_post_hierarchy(eng):
    # LEVEL bound inside CONNECT BY prunes the walk
    got = rows(eng.sql("""
        SELECT name, LEVEL FROM sw_area START WITH pid = 0
        CONNECT BY PRIOR id = pid AND LEVEL <= 2
        ORDER BY LEVEL, name
    """))
    assert {r[1] for r in got} == {1, 2} and len(got) == 3
    # WHERE filters AFTER the hierarchy is built (Oracle rule): the
    # root is excluded from output yet its descendants still appear
    got = rows(eng.sql("""
        SELECT name, LEVEL FROM sw_area
        WHERE LEVEL > 3
        START WITH pid = 0 CONNECT BY PRIOR id = pid
        ORDER BY name
    """))
    assert [r[0] for r in got] == ["futian", "leiyang", "longgang"]


def test_refusal_edges(eng):
    with pytest.raises(NotImplementedError, match="derived table"):
        eng.sql("SELECT 1 FROM sw_area a, sw_area b "
                "START WITH a.pid = 0 CONNECT BY PRIOR a.id = a.pid")
    with pytest.raises(NotImplementedError, match="both sides"):
        eng.sql("SELECT name FROM sw_area START WITH pid = 0 "
                "CONNECT BY PRIOR id = PRIOR pid")
    with pytest.raises(NotImplementedError, match="DESC"):
        eng.sql("SELECT name FROM sw_area START WITH pid = 0 "
                "CONNECT BY PRIOR id = pid ORDER SIBLINGS BY name DESC")
    with pytest.raises(NotImplementedError, match="non-equality"):
        eng.sql("SELECT name FROM sw_area START WITH pid = 0 "
                "CONNECT BY PRIOR id < pid")


def test_plan_is_python_free(eng):
    df = eng.sql("""
        SELECT name, LEVEL, sys_connect_by_path(name, '/')
        FROM sw_area START WITH pid = 0 CONNECT BY PRIOR id = pid
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_view_over_swcb_body(eng):
    # DefineView: a view body may carry the hierarchical clause (the
    # same funnel rewrite the ADVICE r11 view fix gave aggregates)
    eng.sql("CREATE VIEW sw_area_walk AS SELECT name, LEVEL AS lvl,"
            " sys_connect_by_path(name, '/') AS p FROM sw_area"
            " START WITH pid = 0 CONNECT BY PRIOR id = pid")
    got = sorted(tuple(r) for r in
                 eng.sql("SELECT * FROM sw_area_walk").collect())
    assert ("china", 1, "/china") in got and len(got) == 9


def test_subquery_from_base(eng):
    # the sw_bugfix "fromlist startwith" derived-table spelling: the
    # parenthesized join IS the relation the recursion walks
    eng.sql("CREATE TABLE sw_q2 (id BIGINT, tag STRING)")
    eng.sql("INSERT INTO sw_q2 VALUES (1,'t1'),(2,'t2'),(3,'t3'),"
            "(10,'t10')")
    got = sorted(tuple(r) for r in eng.sql("""
        select tt.name, tt.tag, level from
        (select a.id, a.pid, a.name, b.tag
         from sw_area a, sw_q2 b where a.id = b.id) tt
        start with tt.id = 1 CONNECT BY PRIOR tt.id = tt.pid
    """).collect())
    # only rows surviving the join participate in the walk
    assert got == [("china", "t1", 1), ("guangdong", "t3", 2),
                   ("hunan", "t2", 2), ("shenzhen", "t10", 3)]


def test_cte_and_sibling_refusals(eng):
    with pytest.raises(NotImplementedError, match="inline the CTE"):
        eng.sql("WITH c AS (SELECT * FROM sw_area) SELECT name "
                "FROM c START WITH pid = 0 CONNECT BY PRIOR id = pid")
    with pytest.raises(NotImplementedError, match="one named sort"):
        eng.sql("SELECT name FROM sw_area START WITH pid = 0 "
                "CONNECT BY PRIOR id = pid ORDER SIBLINGS BY id, name")
    with pytest.raises(NotImplementedError, match="one named sort"):
        eng.sql("SELECT name FROM sw_area START WITH pid = 0 "
                "CONNECT BY PRIOR id = pid ORDER SIBLINGS BY 1")
    # NULLS LAST on a single key is accepted (strips to the key)
    got = [r[0] for r in eng.sql(
        "SELECT name FROM sw_area START WITH pid = 0 "
        "CONNECT BY PRIOR id = pid AND LEVEL <= 2 "
        "ORDER SIBLINGS BY name NULLS LAST").collect()]
    assert got[0] == "china"
