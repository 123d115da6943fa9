"""Property tests for partition routing/elimination consistency —
pure driver-side logic, no Spark session needed.

The safety contract partition elimination lives on: for EVERY row
value satisfying a predicate, the partition that value routes to must
be in the pruned label set (prune is a superset of truth — it may
read extra directories, it must never skip one holding a matching
row)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.partition_ddl import (
    MAXVALUE,
    PartitionSpec,
)


def route_range(spec: PartitionSpec, v):
    """Brute-force partition.cpp routing: first bound greater than v
    (NULL → MAXVALUE partition or nowhere)."""
    if v is None:
        return (
            spec.parts[-1][0] if spec.parts[-1][1] is MAXVALUE else None
        )
    for name, bound in spec.parts:
        if bound is MAXVALUE or v < bound:
            return name
    return None


def satisfies(v, op, val) -> bool:
    if v is None:
        return False  # SQL comparisons with NULL are never true
    return {
        "<": v < val, "<=": v <= val, "=": v == val,
        ">": v > val, ">=": v >= val,
    }[op] if op != "in" else v in val


bounds_strategy = st.lists(
    st.integers(-50, 50), min_size=1, max_size=6, unique=True
).map(sorted)


@settings(max_examples=300, deadline=None)
@given(
    bounds=bounds_strategy,
    with_max=st.booleans(),
    op=st.sampled_from(["<", "<=", "=", ">", ">="]),
    val=st.integers(-60, 60),
)
def test_range_prune_superset_of_truth(bounds, with_max, op, val):
    parts = [(f"p{i}", b) for i, b in enumerate(bounds)]
    if with_max:
        parts.append(("pmax", MAXVALUE))
    spec = PartitionSpec("range", "k", parts)
    pruned = set(spec.prune(op, val))
    for v in range(-70, 71):
        if satisfies(v, op, val):
            home = route_range(spec, v)
            if home is not None:
                assert home in pruned, (
                    f"value {v} satisfies k {op} {val}, routes to "
                    f"{home}, but prune returned {sorted(pruned)} "
                    f"for bounds {bounds} max={with_max}"
                )


@settings(max_examples=300, deadline=None)
@given(
    bounds=bounds_strategy,
    with_max=st.booleans(),
    vals=st.lists(st.integers(-60, 60), min_size=1, max_size=5),
)
def test_range_prune_in_superset_of_truth(bounds, with_max, vals):
    parts = [(f"p{i}", b) for i, b in enumerate(bounds)]
    if with_max:
        parts.append(("pmax", MAXVALUE))
    spec = PartitionSpec("range", "k", parts)
    pruned = set(spec.prune("in", vals))
    for v in vals:
        home = route_range(spec, v)
        if home is not None:
            assert home in pruned


@settings(max_examples=300, deadline=None)
@given(
    groups=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=3,
                 unique=True),
        min_size=1, max_size=4,
    ),
    with_default=st.booleans(),
    probe=st.sampled_from("abcdefghij"),
)
def test_list_prune_superset_of_truth(groups, with_default, probe):
    # make groups disjoint (the spec validator requires it)
    seen: set = set()
    parts = []
    for i, g in enumerate(groups):
        g2 = tuple(v for v in g if v not in seen)
        if not g2:
            continue
        seen |= set(g2)
        parts.append((f"p{i}", g2))
    if not parts:
        parts = [("p0", ("a",))]
        seen = {"a"}
    if with_default:
        parts.append(("pdef", MAXVALUE))
    spec = PartitionSpec("list", "c", parts)
    # routing: the group holding the probe, else DEFAULT, else nowhere
    home = next(
        (n for n, vals in parts
         if vals is not MAXVALUE and probe in vals),
        "pdef" if with_default else None,
    )
    pruned = set(spec.prune("=", probe))
    if home is not None:
        assert home in pruned


@settings(max_examples=200, deadline=None)
@given(
    bounds=bounds_strategy,
    step=st.integers(1, 20),
    extra=st.integers(0, 400),
)
def test_autoextend_covers_and_stays_sorted(bounds, step, extra):
    from opengauss_vectordb_spark.operators.partition_ddl import (
        autoextend,
    )

    parts = [(f"p{i}", b) for i, b in enumerate(bounds)]
    spec = PartitionSpec("range", "k", parts, interval=(step, None))
    mx = bounds[-1] + extra
    out = autoextend(spec, mx)
    new_bounds = [b for _, b in out.parts]
    assert new_bounds == sorted(new_bounds)
    assert mx < new_bounds[-1]  # the max key now has a home
    # extension is minimal: one step fewer would not cover
    if len(out.parts) > len(parts):
        assert not mx < new_bounds[-2]
