"""Property tests for the GRANT/REVOKE privilege check — pure
driver-side logic, no Spark session needed.

The contract (catalog/aclchk.cpp pg_class_aclcheck with INHERIT
membership): a role holds a privilege iff the privilege (or ALL) is
granted to PUBLIC, to the role, or to ANY group reachable through the
membership graph — and never otherwise (no leaks through unreachable
groups or cycles)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_vectordb_spark.operators.rls import (
    _role_closure,
    has_privilege,
)

ROLES = ["r0", "r1", "r2", "r3", "r4", "r5"]
PRIVS = ["select", "insert", "update", "delete"]


class _FakeEngine:
    def __init__(self, role, members, acl):
        self.current_role = role
        self.role_members = members
        self.acl = acl


def _reachable(members: dict, start: str) -> set:
    """Brute-force reachability over the membership graph."""
    seen, frontier = {start}, [start]
    while frontier:
        r = frontier.pop()
        for parent in members.get(r, set()):
            if parent not in seen:
                seen.add(parent)
                frontier.append(parent)
    return seen


membership = st.dictionaries(
    st.sampled_from(ROLES),
    st.sets(st.sampled_from(ROLES), max_size=3),
    max_size=6,
)
acl_entry = st.dictionaries(
    st.sampled_from(ROLES + ["public"]),
    st.sets(st.sampled_from(PRIVS + ["all"]), min_size=0, max_size=3),
    max_size=4,
)


@settings(max_examples=300, deadline=None)
@given(
    members=membership,
    acl=acl_entry,
    role=st.sampled_from(ROLES),
    priv=st.sampled_from(PRIVS),
)
def test_privilege_iff_reachable_grant(members, acl, role, priv):
    eng = _FakeEngine(role, members, {"t": acl})
    got = has_privilege(eng, "t", priv)
    holders = _reachable(members, role) | {"public"}
    want = any(
        priv in acl.get(h, set()) or "all" in acl.get(h, set())
        for h in holders
    )
    assert got == want, (members, acl, role, priv)


@settings(max_examples=100, deadline=None)
@given(members=membership, role=st.sampled_from(ROLES))
def test_closure_matches_bruteforce_and_terminates_on_cycles(
    members, role
):
    # membership graphs may contain cycles (PG allows mutual
    # membership); the closure must terminate and equal reachability
    eng = _FakeEngine(role, members, {})
    assert _role_closure(eng, role) == _reachable(members, role)


def test_owner_and_unmanaged_bypass():
    eng = _FakeEngine(None, {}, {"t": {"x": {"select"}}})
    assert has_privilege(eng, "t", "delete")  # owner bypass
    eng2 = _FakeEngine("x", {}, {})
    assert has_privilege(eng2, "anything", "select")  # not ACL-managed
