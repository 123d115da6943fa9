"""Property test: the GiST internal-page test never prunes a match.

The rtree contract (gistproc.cpp rtree_internal_consistent): for any
set of leaf boxes, any query box, and any strategy, if SOME leaf
satisfies the leaf test then the internal test on the leaves' union
MBR must be True — otherwise the search would skip a bucket holding a
match (silent wrong results).  Pure driver-side math, so this runs
hypothesis-deep without a session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.gist_index import (
    STRATEGIES as _ALL_OPS,
    _internal_consistent,
)


def _leaf_holds(op: str, b: tuple, q: tuple) -> bool:
    """Python mirror of _leaf_predicate (gist_box_leaf_consistent)."""
    x1, y1, x2, y2 = b
    qx1, qy1, qx2, qy2 = q
    return {
        "left": x2 < qx1,
        "overleft": x2 <= qx2,
        "right": x1 > qx2,
        "overright": x1 >= qx1,
        "below": y2 < qy1,
        "overbelow": y2 <= qy2,
        "above": y1 > qy2,
        "overabove": y1 >= qy1,
        "overlap": x1 <= qx2 and x2 >= qx1 and y1 <= qy2 and y2 >= qy1,
        "contains": x1 <= qx1 and x2 >= qx2 and y1 <= qy1 and y2 >= qy2,
        "contained": x1 >= qx1 and x2 <= qx2 and y1 >= qy1 and y2 <= qy2,
        "same": b == q,
    }[op]


_coord = st.integers(min_value=-8, max_value=8)


def _box(draw):
    a, b = sorted((draw(_coord), draw(_coord)))
    c, d = sorted((draw(_coord), draw(_coord)))
    return (float(a), float(c), float(b), float(d))


@st.composite
def _case(draw):
    leaves = [_box(draw) for _ in range(draw(st.integers(1, 6)))]
    return leaves, _box(draw)


@settings(max_examples=3000, deadline=None)
@given(_case())
def test_internal_consistent_never_prunes_a_match(case):
    leaves, q = case
    mbr = (
        min(b[0] for b in leaves), min(b[1] for b in leaves),
        max(b[2] for b in leaves), max(b[3] for b in leaves),
    )
    for op in _ALL_OPS:
        if any(_leaf_holds(op, b, q) for b in leaves):
            assert _internal_consistent(op, mbr, q), (
                f"strategy {op}: bucket with a matching leaf pruned "
                f"(mbr={mbr}, q={q}, leaves={leaves})"
            )
