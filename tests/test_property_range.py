"""Property grid for range operators (rangetypes.cpp semantics):
random bounds/flags evaluated through the engine's struct compilation
vs an INDEPENDENT Python interval model — one batched SELECT per
operator family so 200+ cases cost two Spark round-trips."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from opengauss_vectordb_spark.engine import Engine

from .conftest import SF_CORRECT

NEG_INF = object()
POS_INF = object()


class R:
    """The model: canonical continuous range (numrange rules)."""

    def __init__(self, lo, hi, li, ui):
        # infinite bounds are always exclusive (build_range normalizes)
        self.lo, self.hi = lo, hi
        self.li = li and lo is not None
        self.ui = ui and hi is not None
        if lo is not None and hi is not None and lo > hi:
            raise ValueError("bound order")
        self.empty = (lo is not None and hi is not None and lo == hi
                      and not (self.li and self.ui))
        if self.empty:
            self.lo = self.hi = None
            self.li = self.ui = False

    # bound comparisons (range_cmp_bounds)
    def lo_le(self, other):
        if self.lo is None:
            return True
        if other.lo is None:
            return False
        return self.lo < other.lo or (
            self.lo == other.lo and (self.li or not other.li))

    def hi_ge(self, other):
        if self.hi is None:
            return True
        if other.hi is None:
            return False
        return self.hi > other.hi or (
            self.hi == other.hi and (self.ui or not other.ui))

    def contains(self, other):
        if other.empty:
            return True
        if self.empty:
            return False
        return self.lo_le(other) and self.hi_ge(other)

    def _lo_before_hi(self, other):
        if self.lo is None or other.hi is None:
            return True
        return self.lo < other.hi or (
            self.lo == other.hi and self.li and other.ui)

    def overlaps(self, other):
        return (not self.empty and not other.empty
                and self._lo_before_hi(other)
                and other._lo_before_hi(self))

    def before(self, other):
        if self.empty or other.empty:
            return False
        if self.hi is None or other.lo is None:
            return False
        return self.hi < other.lo or (
            self.hi == other.lo and not (self.ui and other.li))

    def adjacent(self, other):
        if self.empty or other.empty:
            return False

        def half(a, b):
            return (a.hi is not None and b.lo is not None
                    and a.hi == b.lo and (a.ui != b.li))

        return half(self, other) or half(other, self)

    def contains_elem(self, e):
        if self.empty:
            return False
        if self.lo is not None and not (
                e > self.lo or (self.li and e == self.lo)):
            return False
        if self.hi is not None and not (
                e < self.hi or (self.ui and e == self.hi)):
            return False
        return True


def _gen_ranges(rng, n):
    """Random well-formed numranges over a small value lattice so
    bound collisions (the interesting cases) are common."""
    vals = [Fraction(v, 2) for v in range(-4, 9)]
    out = []
    while len(out) < n:
        lo = rng.choice(vals + [None])
        hi = rng.choice(vals + [None])
        li = rng.random() < 0.5
        ui = rng.random() < 0.5
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        try:
            out.append((lo, hi, li, ui, R(lo, hi, li, ui)))
        except ValueError:
            continue
    return out


def _sql_ctor(lo, hi, li, ui):
    lo_s = "NULL" if lo is None else str(float(lo))
    hi_s = "NULL" if hi is None else str(float(hi))
    b = ("[" if li else "(") + ("]" if ui else ")")
    return f"numrange({lo_s}, {hi_s}, '{b}')"


@pytest.mark.parametrize("op,model", [
    ("@>", lambda a, b: a.contains(b)),
    ("<@", lambda a, b: b.contains(a)),
    ("&&", lambda a, b: a.overlaps(b)),
    ("<<", lambda a, b: a.before(b)),
    (">>", lambda a, b: b.before(a)),
    ("-|-", lambda a, b: a.adjacent(b)),
])
def test_range_range_operators_vs_model(spark, op, model):
    rng = random.Random(hash(op) & 0xFFFF)
    eng = Engine(spark, SF_CORRECT)
    cases = []
    ra = _gen_ranges(rng, 40)
    rb = _gen_ranges(rng, 40)
    for (alo, ahi, ali, aui, A), (blo, bhi, bli, bui, B) in zip(ra, rb):
        cases.append((
            f"{_sql_ctor(alo, ahi, ali, aui)} {op} "
            f"{_sql_ctor(blo, bhi, bli, bui)}",
            model(A, B),
        ))
    exprs = ", ".join(f"({q}) AS c{i}" for i, (q, _) in enumerate(cases))
    row = eng.sql(f"SELECT {exprs}").collect()[0]
    bad = [
        (cases[i][0], row[i], want)
        for i, (_, want) in enumerate(cases) if row[i] is not want
    ]
    assert not bad, bad[:4]


def test_elem_containment_vs_model(spark):
    rng = random.Random(977)
    eng = Engine(spark, SF_CORRECT)
    cases = []
    for lo, hi, li, ui, A in _gen_ranges(rng, 60):
        e = Fraction(rng.randrange(-8, 17), 2)
        cases.append((
            f"{_sql_ctor(lo, hi, li, ui)} @> {float(e)}",
            A.contains_elem(e),
        ))
    exprs = ", ".join(f"({q}) AS c{i}" for i, (q, _) in enumerate(cases))
    row = eng.sql(f"SELECT {exprs}").collect()[0]
    bad = [
        (cases[i][0], row[i], want)
        for i, (_, want) in enumerate(cases) if row[i] is not want
    ]
    assert not bad, bad[:4]
