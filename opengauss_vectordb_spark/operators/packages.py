"""PL/SQL PACKAGEs — ``CREATE PACKAGE`` / ``CREATE PACKAGE BODY`` /
``DROP PACKAGE`` and ``pkg.member(...)`` call sites.

Reference: the package objects of the PL runtime
(``src/common/pl/plpgsql/src/pl_package.cpp``; regress
``hw_package*.sql`` — spec + body, member functions/procedures,
``pkg.fn(x)`` invocation).  Spark-first mapping: a package is a
NAMESPACE, not an execution construct — each member compiles through
the existing LANGUAGE-plpgsql path (operators/plpgsql.py: declarative
bodies → one inlined SQL expression, so a member call costs exactly
its inlined expression inside whole-stage codegen) under the mangled
session name ``<pkg>__<member>``, and the engine rewrites
``pkg.member(`` call sites to the mangled name before planning.
Member PROCEDUREs route to the CREATE PROCEDURE runner the same way,
so ``CALL pkg.proc(...)`` works.

Deliberately refused (clear errors, reference file named): package
VARIABLES (cross-statement session state — Spark plans are pure;
hoist into the caller), EXCEPTION declarations (error control flow),
and member OVERLOADS (one Spark function name per member).
"""

from __future__ import annotations

import re

from .plpgsql import _mask_strings

_CREATE_PKG = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?PACKAGE\s+(?!BODY\b)"
    r"(?P<name>\w+)\s+(?:IS|AS)\s+(?P<decls>.*?)"
    r"END(?:\s+(?P=name))?\s*;?\s*/?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_PKG_BODY = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?PACKAGE\s+BODY\s+"
    r"(?P<name>\w+)\s+(?:IS|AS)\s+(?P<body>.*?)"
    r"END(?:\s+(?P=name))?\s*;?\s*/?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_PKG = re.compile(
    r"^\s*DROP\s+PACKAGE\s+(?:BODY\s+)?(?:IF\s+EXISTS\s+)?"
    r"(?P<name>\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_MEMBER_HEAD = re.compile(
    r"\b(?P<kind>FUNCTION|PROCEDURE)\s+(?P<name>\w+)", re.IGNORECASE
)
_MEMBER_SIG = re.compile(
    r"^(?P<kind>FUNCTION|PROCEDURE)\s+(?P<name>\w+)\s*"
    r"(?:\((?P<params>.*?)\))?\s*"
    r"(?:RETURNS?\s+(?P<ret>\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s+)?"
    r"(?:IS|AS)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_VARIABLE_DECL = re.compile(
    r"^\s*(?P<name>\w+)\s+(?!FUNCTION|PROCEDURE|EXCEPTION)\w+",
    re.IGNORECASE,
)

# block openers/closers for scanning one member's extent — END IF /
# END LOOP / END CASE close their own opener; a bare END closes BEGIN
_BLOCK_TOKEN = re.compile(
    r"\b(END\s+IF|END\s+LOOP|END\s+CASE|BEGIN|IF|LOOP|CASE|END)\b",
    re.IGNORECASE,
)


def _member_extent(masked: str, start: int) -> int:
    """Index just past the ``;`` that terminates the member whose
    header starts at ``start`` (block-depth aware: the member ends at
    the END that returns depth to zero)."""
    depth = 0
    seen_begin = False
    for m in _BLOCK_TOKEN.finditer(masked, start):
        tok = re.sub(r"\s+", " ", m.group(1).upper())
        if tok in ("BEGIN", "IF", "LOOP", "CASE"):
            depth += 1
            seen_begin = True
        else:  # one of the END forms
            depth -= 1
            if seen_begin and depth == 0:
                semi = masked.find(";", m.end())
                return len(masked) if semi < 0 else semi + 1
    raise ValueError("package member has no terminating END;")


def _split_members(body: str) -> list[str]:
    masked = _mask_strings(body)
    out = []
    pos = 0
    while True:
        m = _MEMBER_HEAD.search(masked, pos)
        if m is None:
            tail = body[pos:].strip().strip(";").strip()
            if tail:
                raise NotImplementedError(
                    "package body holds non-member content "
                    f"({tail[:40]!r}) — only FUNCTION/PROCEDURE "
                    "members are supported (pl_package.cpp variables "
                    "and initializers are session state; hoist them "
                    "into the caller)"
                )
            return out
        lead = body[pos:m.start()].strip().strip(";").strip()
        if lead:
            raise NotImplementedError(
                f"package body holds non-member content ({lead[:40]!r})"
            )
        end = _member_extent(masked, m.start())
        out.append(body[m.start():end].rstrip().rstrip(";"))
        pos = end


def _parse_spec_decls(pkg: str, decls: str) -> list[str]:
    """Declared member names from the spec; refuses overloads,
    variables, and exceptions."""
    masked = _mask_strings(decls)
    if re.search(r"\bEXCEPTION\b", masked, re.IGNORECASE):
        raise NotImplementedError(
            "package EXCEPTION declarations are error control flow "
            "(pl_package.cpp) — raise from the caller instead"
        )
    names: list[str] = []
    for entry in masked.split(";"):
        entry = entry.strip()
        if not entry:
            continue
        m = _MEMBER_HEAD.match(entry)
        if m is None:
            raise NotImplementedError(
                f"package spec declares non-member state "
                f"({entry[:40]!r}) — package variables are session "
                "state; hoist them into the caller"
            )
        names.append(m.group("name").lower())
    if len(set(names)) != len(names):
        raise NotImplementedError(
            "package member OVERLOADS cannot map to one Spark "
            f"function name: {names}"
        )
    return names


def mangle(pkg: str, member: str) -> str:
    return f"{pkg.lower()}__{member.lower()}"


def try_handle_stmt(engine, query: str):
    """Engine.sql hook for CREATE PACKAGE [BODY] / DROP PACKAGE."""
    if not hasattr(engine, "packages"):
        engine.packages = {}
    m = _CREATE_PKG.match(query)
    if m:
        pkg = m.group("name").lower()
        names = _parse_spec_decls(pkg, m.group("decls"))
        engine.packages[pkg] = {
            "declared": names, "members": {},
        }
        return engine.spark.createDataFrame(
            [("CREATE PACKAGE", pkg, len(names))],
            "tag STRING, package STRING, declared INT",
        )
    m = _CREATE_PKG_BODY.match(query)
    if m:
        pkg = m.group("name").lower()
        if pkg not in engine.packages:
            raise KeyError(
                f"CREATE PACKAGE BODY: package {pkg!r} has no spec"
            )
        declared = set(engine.packages[pkg]["declared"])
        compiled: dict[str, str] = {}
        for member in _split_members(m.group("body")):
            sm = _MEMBER_SIG.match(member)
            if sm is None:
                raise ValueError(
                    f"cannot parse package member: {member[:60]!r}"
                )
            mname = sm.group("name").lower()
            if declared and mname not in declared:
                raise ValueError(
                    f"member {mname!r} is not declared in the "
                    f"package spec of {pkg!r}"
                )
            mangled = mangle(pkg, mname)
            rest = sm.group("rest").strip()
            if sm.group("kind").upper() == "FUNCTION":
                if not sm.group("ret"):
                    raise ValueError(
                        f"package FUNCTION {mname!r} needs RETURN <type>"
                    )
                # PL/SQL 'IS <decls> BEGIN ...' == plpgsql
                # 'DECLARE <decls> BEGIN ...'
                body = rest if re.match(
                    r"^\s*BEGIN\b", rest, re.IGNORECASE
                ) else "DECLARE " + rest
                engine.sql(
                    f"CREATE OR REPLACE FUNCTION {mangled}"
                    f"({sm.group('params') or ''}) "
                    f"RETURNS {sm.group('ret')} AS $pkgfn$ {body} "
                    f"$pkgfn$ LANGUAGE plpgsql"
                )
                compiled[mname] = "function"
            else:
                engine.sql(
                    f"CREATE OR REPLACE PROCEDURE {mangled}"
                    f"({sm.group('params') or ''}) AS $pkgpr$ {rest} "
                    f"$pkgpr$"
                )
                compiled[mname] = "procedure"
        engine.packages[pkg]["members"] = compiled
        return engine.spark.createDataFrame(
            [("CREATE PACKAGE BODY", pkg, len(compiled))],
            "tag STRING, package STRING, members INT",
        )
    m = _DROP_PKG.match(query)
    if m:
        pkg = m.group("name").lower()
        meta = engine.packages.pop(pkg, None)
        if meta is None:
            if re.search(r"IF\s+EXISTS", query, re.IGNORECASE):
                return engine.spark.createDataFrame(
                    [("DROP PACKAGE", pkg, False)],
                    "tag STRING, package STRING, existed BOOLEAN",
                )
            raise KeyError(f"DROP PACKAGE: {pkg!r} does not exist")
        for mname, kind in meta["members"].items():
            mangled = mangle(pkg, mname)
            try:
                if kind == "function":
                    engine.sql(f"DROP FUNCTION {mangled}")
                else:
                    engine.sql(f"DROP PROCEDURE {mangled}")
            except Exception:  # noqa: BLE001 — already gone is fine
                pass
        return engine.spark.createDataFrame(
            [("DROP PACKAGE", pkg, True)],
            "tag STRING, package STRING, existed BOOLEAN",
        )
    return None


def rewrite_member_calls(engine, query: str) -> str:
    """``pkg.member(`` → ``pkg__member(`` for every compiled member —
    the engine-side resolution pl_package.cpp does at call lookup.
    Identity when no packages exist (zero overhead on the hot path)."""
    pkgs = getattr(engine, "packages", None)
    if not pkgs:
        return query
    for pkg, meta in pkgs.items():
        for mname in meta["members"]:
            query = re.sub(
                rf"\b{pkg}\.{mname}\s*\(",
                f"{mangle(pkg, mname)}(",
                query,
                flags=re.IGNORECASE,
            )
    return query


# ---------------------------------------------------------------- queries

from pyspark.sql import functions as F  # noqa: E402

from ..registry import query  # noqa: E402


@query(
    "package_member_function",
    """
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS tier,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice * 1.1 AS DECIMAL(18,6)))
                AS DOUBLE) AS bumped_total
    FROM orders
    GROUP BY CASE WHEN o_totalprice >= 200000 THEN 'high'
                  WHEN o_totalprice >= 100000 THEN 'mid'
                  ELSE 'low' END
    ORDER BY tier
    """,
)
def package_member_function(spark, sf_dir):
    """PL/SQL PACKAGE end-to-end (pl_package.cpp; hw_package regress):
    a two-member package — an IF/ELSIF tier classifier and an
    arithmetic bump — compiles through the plpgsql path under mangled
    names; the gate aggregates ``pricing.tier(...)`` /
    ``pricing.bump(...)`` call sites over orders against the oracle's
    hand-inlined CASE arithmetic, proving the member compilation and
    the call-site rewrite are semantically invisible.

    Scale: a member call costs exactly its inlined expression inside
    whole-stage codegen — no UDF boundary, no Python, pinned by
    test_package_spec_body_and_calls."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql("""
        CREATE OR REPLACE PACKAGE pricing IS
          FUNCTION tier(amt double) RETURN text;
          FUNCTION bump(amt double, pct double) RETURN double;
        END pricing;
    """)
    eng.sql("""
        CREATE OR REPLACE PACKAGE BODY pricing AS
          FUNCTION tier(amt double) RETURN text IS
          BEGIN
            IF amt >= 200000 THEN
              RETURN 'high';
            ELSIF amt >= 100000 THEN
              RETURN 'mid';
            ELSE
              RETURN 'low';
            END IF;
          END;
          FUNCTION bump(amt double, pct double) RETURN double IS
            delta double := amt * pct;
          BEGIN
            RETURN amt + delta;
          END;
        END pricing;
    """)
    out = eng.sql(
        "SELECT pricing.tier(o_totalprice) AS tier,"
        " COUNT(*) AS n,"
        " CAST(SUM(CAST(pricing.bump(o_totalprice, 0.1)"
        "     AS DECIMAL(18,6))) AS DOUBLE) AS bumped_total"
        " FROM orders GROUP BY pricing.tier(o_totalprice)"
        " ORDER BY tier"
    )
    rows = out.collect()
    eng.sql("DROP PACKAGE pricing")
    return spark.createDataFrame(
        [(r[0], r[1], float(r[2])) for r in rows],
        "tier STRING, n BIGINT, bumped_total DOUBLE",
    ).orderBy("tier")
