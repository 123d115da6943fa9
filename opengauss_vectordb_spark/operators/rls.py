"""Row-level security — CREATE POLICY / SET ROLE through Engine.sql.

Reference: `optimizer/commands/sec_rls_cmds.cpp` (CreateRlsPolicy /
RemoveRlsPolicy; catalog pg_rlspolicy) and
`optimizer/rewrite/rewriteRlsPolicy.cpp` — openGauss enforces RLS as a
REWRITE: when a restricted role scans a protected relation, the
planner injects the policy's USING qual into the scan, and with no
applicable policy the scan yields nothing (default deny).  The table
owner bypasses RLS unless FORCE is set.

The Spark translation keeps exactly that rewrite model: the engine's
registered temp view for a protected table is re-pointed, on every
role change, to the base relation filtered by the OR of the role's
applicable policy predicates (or ``lit(False)`` under default deny).
Queries — ours or a user's raw ``spark.sql`` against the view — see
the injected predicate with zero per-row enforcement cost: the filter
participates in predicate pushdown and rowgroup pruning like any other
qual, so RLS is free at 100 TB in exactly the way a per-row security
hook would not be.

Supported statement shapes::

    ALTER TABLE t ENABLE ROW LEVEL SECURITY;
    CREATE POLICY p ON t [TO role1, role2] USING (<predicate>);
    DROP POLICY p ON t;
    SET ROLE analyst;   -- policies apply
    RESET ROLE;         -- owner again, RLS bypassed
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ..registry import query

_ENABLE_RLS = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+ENABLE\s+ROW\s+LEVEL\s+"
    r"SECURITY\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_POLICY = re.compile(
    r"^\s*CREATE\s+POLICY\s+(?P<name>\w+)\s+ON\s+(?P<table>\w+)"
    r"(?:\s+FOR\s+SELECT)?(?:\s+TO\s+(?P<roles>\w+(?:\s*,\s*\w+)*))?"
    r"\s+USING\s+\((?P<pred>.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_POLICY = re.compile(
    r"^\s*DROP\s+POLICY\s+(?P<name>\w+)\s+ON\s+(?P<table>\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_SET_ROLE = re.compile(
    r"^\s*SET\s+ROLE\s+(?P<role>\w+)\s*;?\s*$", re.IGNORECASE
)
_RESET_ROLE = re.compile(r"^\s*RESET\s+ROLE\s*;?\s*$", re.IGNORECASE)


def _refresh_views(engine) -> None:
    """Re-point protected tables' views for the current role — the
    rewriteRlsPolicy.cpp qual injection, done once per role change."""
    role = engine.current_role
    for tbl in engine.rls_enabled:
        base = engine.spark.read.parquet(engine.managed_tables._path(tbl))
        if role is None:  # owner bypasses RLS (sec_rls_cmds.cpp default)
            view = base
        else:
            preds = [
                p["pred"]
                for p in engine.rls_policies.get(tbl, {}).values()
                if p["roles"] is None or role in p["roles"]
            ]
            if preds:
                cond = F.expr(preds[0])
                for p in preds[1:]:
                    cond = cond | F.expr(p)  # policies OR together (PG)
                view = base.filter(cond)
            else:
                view = base.filter(F.lit(False))  # default deny
        view.createOrReplaceTempView(tbl)


def try_handle_stmt(engine, stmt: str):
    m = _ENABLE_RLS.match(stmt)
    if m and m.group("name").lower() in engine.managed_tables.tables:
        engine.rls_enabled.add(m.group("name").lower())
        _refresh_views(engine)
        return engine.spark.createDataFrame(
            [("ALTER TABLE", m.group("name").lower(), True)],
            "tag STRING, tbl STRING, rls BOOLEAN",
        )
    m = _CREATE_POLICY.match(stmt)
    if m:
        tbl = m.group("table").lower()
        if tbl not in engine.managed_tables.tables:
            raise KeyError(
                f"policies attach to managed tables; {tbl!r} is not one"
            )
        roles = m.group("roles")
        engine.rls_policies.setdefault(tbl, {})[m.group("name").lower()] = {
            "pred": m.group("pred"),
            "roles": (None if roles is None else
                      {r.strip().lower() for r in roles.split(",")}),
        }
        _refresh_views(engine)
        return engine.spark.createDataFrame(
            [("CREATE POLICY", m.group("name").lower(), tbl)],
            "tag STRING, policy STRING, tbl STRING",
        )
    m = _DROP_POLICY.match(stmt)
    if m:
        tbl = m.group("table").lower()
        existed = (
            engine.rls_policies.get(tbl, {})
            .pop(m.group("name").lower(), None) is not None
        )
        _refresh_views(engine)
        return engine.spark.createDataFrame(
            [("DROP POLICY", m.group("name").lower(), tbl, existed)],
            "tag STRING, policy STRING, tbl STRING, existed BOOLEAN",
        )
    m = _SET_ROLE.match(stmt)
    if m:
        role = m.group("role").lower()
        engine.current_role = None if role in ("none", "gauss") else role
        _refresh_views(engine)
        return engine.spark.createDataFrame(
            [("SET ROLE", role)], "tag STRING, role STRING"
        )
    if _RESET_ROLE.match(stmt):
        engine.current_role = None
        _refresh_views(engine)
        return engine.spark.createDataFrame(
            [("RESET ROLE",)], "tag STRING"
        )
    return None


@query(
    "rls_policy_scan",
    """
    SELECT CAST((SELECT COUNT(*) FROM customer
                 WHERE c_custkey <= 500 AND c_mktsegment = 'BUILDING')
           AS BIGINT) AS n_analyst,
           CAST((SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                             AS DOUBLE)
                 FROM customer
                 WHERE c_custkey <= 500 AND c_mktsegment = 'BUILDING')
           AS DOUBLE) AS bal_analyst,
           CAST((SELECT COUNT(*) FROM customer WHERE c_custkey <= 500)
           AS BIGINT) AS n_owner,
           CAST(0 AS BIGINT) AS n_denied
    """,
)
def rls_policy_scan(spark, sf_dir):
    """Row-level security end-to-end (sec_rls_cmds.cpp +
    rewriteRlsPolicy.cpp): enable RLS on a managed table, grant the
    analyst role a segment-scoped policy, and verify three regimes —
    the analyst sees exactly the policy rows, the owner (RESET ROLE)
    bypasses RLS, and a role with no applicable policy gets default
    deny.  The oracle recomputes each regime's aggregate straight from
    the source with the policy predicate inlined — green proves the
    injected qual filters precisely.

    Scale: enforcement is a rewrite, not a hook — the policy predicate
    joins the scan's quals, so it pushes down to parquet and prunes
    rowgroups like any WHERE clause; role changes cost one view
    re-registration."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS rls_t")
    eng.sql(
        "CREATE TABLE rls_t AS SELECT c_custkey, c_mktsegment, c_acctbal"
        " FROM customer WHERE c_custkey <= 500"
    )
    eng.sql("ALTER TABLE rls_t ENABLE ROW LEVEL SECURITY")
    eng.sql(
        "CREATE POLICY seg_pol ON rls_t TO analyst"
        " USING (c_mktsegment = 'BUILDING')"
    )
    eng.sql("SET ROLE analyst")
    a = eng.sql(
        "SELECT COUNT(*) AS n,"
        " CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal"
        " FROM rls_t"
    ).collect()[0]
    eng.sql("SET ROLE intern")  # no policy for this role → default deny
    denied = eng.sql("SELECT COUNT(*) AS n FROM rls_t").collect()[0].n
    eng.sql("RESET ROLE")
    owner = eng.sql("SELECT COUNT(*) AS n FROM rls_t").collect()[0].n
    eng.sql("DROP POLICY seg_pol ON rls_t")
    eng.sql("DROP TABLE rls_t")
    return spark.createDataFrame(
        [(a.n, a.bal, owner, denied)],
        "n_analyst BIGINT, bal_analyst DOUBLE, n_owner BIGINT,"
        " n_denied BIGINT",
    )
