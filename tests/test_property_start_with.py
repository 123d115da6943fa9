"""Property test for the START WITH / CONNECT BY compilation: random
forests (child→parent edges, possibly multi-root, with rows whose
parent is absent), a random anchor set, and both walk directions run
through Engine.sql; an independent Python walker implementing the
reference's StartWithOp contract (per-level frontier expansion with
LEVEL / SYS_CONNECT_BY_PATH / CONNECT_BY_ROOT accumulation and
result-set CONNECT_BY_ISLEAF) must agree row-for-row.  Data is built
per example with one INSERT; one Spark job per example keeps the
suite minutes-bounded."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT

# a forest over ids 1..n: parents[i] is the parent id or 0 (root);
# parent ids always LOWER than the child id, so the graph is acyclic
forests = st.integers(2, 7).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(st.integers(0, n - 1), min_size=n, max_size=n)
        .map(lambda ps: [min(p, i) for i, p in enumerate(ps)]),
        st.sets(st.integers(1, n), min_size=1, max_size=2),
    )
)


def _py_walk(n, parents, anchors, leafward: bool):
    """The reference walk: rows (id, level, path, root) + isleaf."""
    kids = {}
    for i in range(1, n + 1):
        p = parents[i - 1]
        if leafward:
            kids.setdefault(p, []).append(i)
        else:
            kids.setdefault(i, []).append(p)

    # leafward: children of row r are ids whose parent == r.id
    # rootward: the "child" of row r is the row whose id == r.parent
    def next_of(rid):
        if leafward:
            return [c for c in range(1, n + 1) if parents[c - 1] == rid]
        p = parents[rid - 1]
        return [p] if 1 <= p <= n else []

    out = []
    frontier = [(a, 1, f"/{a}", a) for a in sorted(anchors)]
    while frontier:
        out.extend(frontier)
        nxt = []
        for rid, lvl, path, root in frontier:
            for c in next_of(rid):
                nxt.append((c, lvl + 1, f"{path}/{c}", root))
        frontier = nxt
    parent_paths = {path.rsplit("/", 1)[0] for (_, lvl, path, _)
                    in out if lvl > 1}
    return sorted(
        (rid, lvl, path, root,
         0 if path in parent_paths else 1)
        for (rid, lvl, path, root) in out
    )


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_CORRECT)


@given(forests, st.booleans())
@settings(max_examples=20, deadline=None)
def test_swcb_matches_reference_walk(eng, forest, leafward):
    n, parents, anchors = forest
    rows = ", ".join(
        f"({i}, {parents[i - 1]})" for i in range(1, n + 1)
    )
    eng.sql("DROP TABLE IF EXISTS prop_sw")
    eng.sql("CREATE TABLE prop_sw (id BIGINT, pid BIGINT)")
    eng.sql(f"INSERT INTO prop_sw VALUES {rows}")
    anchor_pred = " OR ".join(f"id = {a}" for a in sorted(anchors))
    cb = "PRIOR id = pid" if leafward else "id = PRIOR pid"
    got = sorted(
        tuple(r)
        for r in eng.sql(f"""
            SELECT id, LEVEL AS lvl,
                   sys_connect_by_path(id, '/') AS path,
                   connect_by_root(id) AS root,
                   connect_by_isleaf AS isleaf
            FROM prop_sw
            START WITH {anchor_pred}
            CONNECT BY {cb}
        """).collect()
    )
    want = _py_walk(n, parents, anchors, leafward)
    assert got == want
