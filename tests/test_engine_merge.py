"""Engine facade + MERGE INTO emulation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_CORRECT


def test_engine_sql_and_pg_functions(spark):
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    out = eng.sql(
        """
        SELECT n_name, nvl(NULL, 'x') AS nv,
               decode(n_regionkey, 0, 'zero', 'other') AS dec
        FROM nation ORDER BY n_nationkey LIMIT 3
        """
    ).collect()
    assert len(out) == 3 and out[0].nv == "x"

    knn = eng.sql(
        """
        SELECT vec_id,
               l2_distance(CAST(embedding AS ARRAY<DOUBLE>),
                           CAST(array(0.5, 0.5) AS ARRAY<DOUBLE>)) AS d
        FROM (SELECT vec_id, slice(embedding, 1, 2) AS embedding
              FROM embeddings LIMIT 5)
        ORDER BY d
        """
    ).collect()
    assert len(knn) == 5 and knn[0].d <= knn[-1].d


def test_engine_knn_routing(spark):
    from opengauss_vectordb_spark.engine import Engine
    from opengauss_vectordb_spark.vector.queries import QUERY_VEC

    eng = Engine(spark=spark, sf_dir=SF_CORRECT)
    exact = eng.knn("embeddings", "embedding", QUERY_VEC, k=5, id_col="vec_id")
    assert exact.count() == 5


def test_merge_into(spark):
    from opengauss_vectordb_spark.operators.merge import merge_into, upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id INT, s STRING, v DOUBLE"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id INT, s STRING, v DOUBLE"
    )
    # default: matched rows take source values, unmatched source inserted
    out = sorted(map(tuple, upsert(target, source, ["id"]).collect()))
    assert out == [
        (1, "a", 10.0),
        (2, "B", 200.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]

    # custom update expression + no insert
    out2 = sorted(
        map(
            tuple,
            merge_into(
                target,
                source,
                ["id"],
                when_matched_update={"v": F.col("t.v") + F.col("s.v")},
                when_not_matched_insert=False,
            ).collect(),
        )
    )
    assert out2 == [(1, "a", 10.0), (2, "b", 220.0), (3, "c", 30.0)]

    # matched delete
    out3 = sorted(
        map(
            tuple,
            merge_into(
                target,
                source,
                ["id"],
                when_matched_delete=F.col("s.v") > 100,
            ).collect(),
        )
    )
    assert [r[0] for r in out3] == [1, 3, 4]


def test_merge_into_null_target_key_kept(spark):
    """A target row with a NULL join key never matches, but it is a real
    target row and must survive the merge unchanged (execMerge.cpp keeps
    unmatched target rows) — not be misread as a source-only insert."""
    from opengauss_vectordb_spark.operators.merge import merge_into, upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (None, "nullkey", 99.0)], "id INT, s STRING, v DOUBLE"
    )
    source = spark.createDataFrame([(1, "A", 100.0)], "id INT, s STRING, v DOUBLE")

    out = sorted(
        map(tuple, upsert(target, source, ["id"]).collect()),
        key=lambda r: (r[0] is None, r),
    )
    assert out == [(1, "A", 100.0), (None, "nullkey", 99.0)]

    # and with inserts disabled the null-key row must not be dropped
    out2 = sorted(
        map(
            tuple,
            merge_into(
                target, source, ["id"], when_not_matched_insert=False
            ).collect(),
        ),
        key=lambda r: (r[0] is None, r),
    )
    assert out2 == [(1, "A", 100.0), (None, "nullkey", 99.0)]


def test_merge_into_sql_text(spark, tmp_path):
    """MERGE INTO as SQL text (parse_merge.cpp grammar →
    execMerge.cpp actions): matched-update with an AND condition,
    matched-delete, not-matched-insert, aliased relations, subquery
    source, key-name alignment — all against the managed target with
    one copy-on-write rewrite."""
    from opengauss_vectordb_spark.engine import Engine

    from .conftest import SF_CORRECT

    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    eng.sql("CREATE TABLE mt_t (k bigint, status text, amt double)")
    eng.sql(
        "INSERT INTO mt_t VALUES"
        " (1, 'old', 10.0), (2, 'old', 20.0), (3, 'old', 30.0)"
    )
    out = eng.sql("""
        MERGE INTO mt_t t
        USING (SELECT * FROM (VALUES
            (CAST(2 AS BIGINT), 200.0),
            (CAST(3 AS BIGINT), 300.0),
            (CAST(4 AS BIGINT), 400.0)) AS v(id, newamt)) s
        ON t.k = s.id
        WHEN MATCHED AND s.newamt >= 300.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET status = 'upd', amt = s.newamt
        WHEN NOT MATCHED THEN INSERT (k, status, amt)
            VALUES (s.id, 'new', s.newamt)
    """).collect()[0]
    assert out.tag == "MERGE"
    rows = {r.k: (r.status, r.amt) for r in
            eng.sql("SELECT * FROM mt_t ORDER BY k").collect()}
    # 1: untouched target row; 2: updated; 3: deleted (newamt 300);
    # 4: inserted
    assert rows == {
        1: ("old", 10.0),
        2: ("upd", 200.0),
        4: ("new", 400.0),
    }
    # delete-only MERGE keeps unmatched target rows as-is
    eng.sql("""
        MERGE INTO mt_t USING (SELECT CAST(2 AS BIGINT) AS k) s
        ON mt_t.k = s.k
        WHEN MATCHED THEN DELETE
    """)
    assert sorted(
        r.k for r in eng.sql("SELECT k FROM mt_t").collect()
    ) == [1, 4]
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="equi"):
        eng.sql("""
            MERGE INTO mt_t USING (SELECT 1 AS k) s ON mt_t.k > s.k
            WHEN MATCHED THEN DELETE
        """)
    with _pytest.raises(KeyError):
        eng.sql("""
            MERGE INTO nations USING (SELECT 1 AS k) s ON nations.k = s.k
            WHEN MATCHED THEN DELETE
        """)
    eng.sql("DROP TABLE mt_t")


def test_merge_sql_insert_exprs_do_not_leak_into_matched(spark, tmp_path):
    """WHEN NOT MATCHED INSERT value expressions are evaluated for the
    insert branch ONLY (execMerge.cpp per-action targetlists): an
    INSERT transform like s.price * 0.5 must not rewrite the source
    column that a WHEN MATCHED UPDATE reads."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    eng.sql("CREATE TABLE mt_leak (k bigint, price double)")
    eng.sql("INSERT INTO mt_leak VALUES (1, 10.0), (2, 20.0)")
    eng.sql("""
        MERGE INTO mt_leak t
        USING (SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), 100.0),
            (CAST(9 AS BIGINT), 80.0)) AS v(k, price)) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price * 0.5)
    """)
    rows = {r.k: r.price for r in
            eng.sql("SELECT * FROM mt_leak ORDER BY k").collect()}
    # matched row takes the RAW source price (100.0, not 50.0); the
    # inserted row takes the INSERT expression (80.0 * 0.5)
    assert rows == {1: 100.0, 2: 20.0, 9: 40.0}
    eng.sql("DROP TABLE mt_leak")


def test_merge_sql_crossed_aliases(spark, tmp_path):
    """MERGE INTO tbl s USING src t — user aliases that collide with
    the canonical t/s names must rewrite in one pass, not cascade
    (target refs silently resolving to source columns)."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    eng.sql("CREATE TABLE mt_x (k bigint, v double)")
    eng.sql("INSERT INTO mt_x VALUES (1, 10.0), (2, 20.0)")
    eng.sql("""
        MERGE INTO mt_x s
        USING (SELECT * FROM (VALUES
            (CAST(2 AS BIGINT), 5.0)) AS q(k, v)) t
        ON s.k = t.k
        WHEN MATCHED THEN UPDATE SET v = s.v + t.v
    """)
    rows = {r.k: r.v for r in
            eng.sql("SELECT * FROM mt_x ORDER BY k").collect()}
    # s.v is the TARGET value (20.0) + t.v the SOURCE delta (5.0)
    assert rows == {1: 10.0, 2: 25.0}
    eng.sql("DROP TABLE mt_x")


def test_merge_sql_clause_order_first_match_wins(spark, tmp_path):
    """'WHEN MATCHED AND c THEN UPDATE … WHEN MATCHED THEN DELETE':
    rows satisfying c are claimed by the UPDATE clause
    (parse_merge.cpp first-match-wins), only the rest are deleted."""
    from opengauss_vectordb_spark.engine import Engine

    eng = Engine(spark, SF_CORRECT)
    eng.managed_tables.root = str(tmp_path)
    eng.sql("CREATE TABLE mt_ord (k bigint, v double)")
    eng.sql("INSERT INTO mt_ord VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    eng.sql("""
        MERGE INTO mt_ord t
        USING (SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), 1.0),
            (CAST(2 AS BIGINT), 2.0)) AS q(k, d)) s
        ON t.k = s.k
        WHEN MATCHED AND t.v < 15.0 THEN UPDATE SET v = t.v + s.d
        WHEN MATCHED THEN DELETE
    """)
    rows = {r.k: r.v for r in
            eng.sql("SELECT * FROM mt_ord ORDER BY k").collect()}
    # k=1 satisfies the UPDATE condition → updated (11.0), NOT deleted;
    # k=2 falls through to the DELETE; k=3 unmatched → untouched
    assert rows == {1: 11.0, 3: 30.0}
    # unconditional UPDATE ahead of DELETE makes the DELETE unreachable
    eng.sql("""
        MERGE INTO mt_ord t
        USING (SELECT CAST(3 AS BIGINT) AS k, 99.0 AS nv) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN MATCHED THEN DELETE
    """)
    rows = {r.k: r.v for r in
            eng.sql("SELECT * FROM mt_ord ORDER BY k").collect()}
    assert rows == {1: 11.0, 3: 99.0}
    eng.sql("DROP TABLE mt_ord")
