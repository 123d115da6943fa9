"""CREATE TYPE / CREATE DOMAIN — user-defined types in the managed
catalog.

Reference: `parser/gram.y:12683-12724` (DefineStmt CREATE TYPE forms),
`commands/typecmds.cpp` (DefineEnum / DefineDomain / composite via
DefineRelation), `adt/enum.cpp` (enum values order by DECLARED
position, and an input value outside the label set is an error —
enum_in's "invalid input value for enum").

Spark-first mapping (type system is Catalyst's, SURVEY §1.3):

* ``CREATE TYPE m AS ENUM ('a','b',...)`` — labels recorded in the
  engine catalog; a column declared with the enum type stores STRING,
  every write validates membership INSIDE the write job (a
  raise_error CASE — zero extra passes, the partition-routing
  validation pattern), and ``enum_pos(type, col)`` /
  ``array_position`` express declared-order sorting.
* ``CREATE TYPE p AS (a int, b text)`` — a composite maps to a Catalyst
  STRUCT column type.
* ``CREATE DOMAIN d AS base`` — a transparent alias; CHECK constraints
  refuse with the INSERT-side rewrite guidance (same position as table
  CHECK).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ._util import status_frame

_CREATE_ENUM = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>\w+)\s+AS\s+ENUM\s*"
    r"\(\s*(?P<labels>'[^']*'(?:\s*,\s*'[^']*')*)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_COMPOSITE = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>\w+)\s+AS\s*"
    r"\(\s*(?P<fields>[^()]+)\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_DOMAIN = re.compile(
    r"^\s*CREATE\s+DOMAIN\s+(?P<name>\w+)\s+(?:AS\s+)?"
    r"(?P<base>\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
    r"(?P<tail>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TYPE = re.compile(
    r"^\s*DROP\s+(?:TYPE|DOMAIN)\s+(?:IF\s+EXISTS\s+)?(?P<name>\w+)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)


def resolve_type(engine, type_name: str) -> str | None:
    """Catalyst DDL string for a user type name, or None when the
    name is not a user type.  Domains resolve transitively."""
    ut = engine.user_types.get(type_name.strip().lower())
    if ut is None:
        return None
    if ut["kind"] == "enum":
        return "string"
    if ut["kind"] == "composite":
        return ut["ddl"]
    # domain
    inner = resolve_type(engine, ut["base"])
    if inner is not None:
        return inner
    from .create_function import _map_type

    return _map_type(ut["base"])


def enum_guard(engine, df: DataFrame, enum_cols: dict,
               ignore: bool = False) -> DataFrame:
    """Write-side enum validation (enum.cpp enum_in): an out-of-set
    label aborts the write from INSIDE the job — no pre-count pass.
    Under ``ignore`` (the B-format /*+ ignore_error */ hint,
    sql_ignore strategy) invalid rows FILTER instead of aborting."""
    for col, type_name in enum_cols.items():
        if col not in df.columns:
            continue
        labels = engine.user_types[type_name]["labels"]
        arr = "array(" + ", ".join(f"'{v}'" for v in labels) + ")"
        valid = (
            F.col(col).isNull()
            | F.expr(f"array_contains({arr}, {col})")
        )
        if ignore:
            df = df.filter(valid)
            continue
        df = df.withColumn(
            col,
            F.when(valid, F.col(col)).otherwise(
                F.expr(
                    f"raise_error(concat('invalid input value for enum "
                    f"{type_name}: \"', {col}, '\"'))"
                ).cast("string")
            ),
        )
    return df


# ALTER TYPE (typecmds.cpp AlterEnum / RenameType; regress
# enum.sql's ADD VALUE BEFORE/AFTER suite): label-list surgery on the
# recorded declared order — the order array IS the btree the
# reference rebalances, so insertion is a list splice here.
_ALTER_TYPE = re.compile(
    r"^\s*ALTER\s+TYPE\s+(?P<name>\w+)\s+"
    r"(?:ADD\s+VALUE\s+(?:IF\s+NOT\s+EXISTS\s+)?'(?P<new>[^']*)'"
    r"(?:\s+(?P<where>BEFORE|AFTER)\s+'(?P<ref>[^']*)')?"
    r"|RENAME\s+VALUE\s+'(?P<old>[^']*)'\s+TO\s+'(?P<to>[^']*)'"
    r"|RENAME\s+TO\s+(?P<newname>\w+))\s*;?\s*$",
    re.IGNORECASE,
)


def _handle_alter_type(engine, m: re.Match) -> DataFrame:
    name = m.group("name").lower()
    ut = engine.user_types.get(name)
    if ut is None:
        raise KeyError(f"ALTER TYPE: type {name!r} does not exist")
    if m.group("newname"):
        newname = m.group("newname").lower()
        if newname in engine.user_types:
            raise ValueError(f"type {newname!r} already exists")
        engine.user_types[newname] = engine.user_types.pop(name)
        return status_frame(engine.spark, ("ALTER TYPE", name, f"RENAME TO {newname}"), "tag STRING, typname STRING, action STRING",)
    if ut["kind"] != "enum":
        raise NotImplementedError(
            "ALTER TYPE value surgery applies to enum types; composite "
            "changes are CREATE-new-then-CAST (typecmds.cpp's ALTER "
            "ATTRIBUTE path has no consumer here)"
        )
    labels = ut["labels"]
    if m.group("new") is not None:
        new = m.group("new")
        if new in labels:
            if "IF NOT EXISTS" in m.group(0).upper():
                return status_frame(engine.spark, ("ALTER TYPE", name, "noop"), "tag STRING, typname STRING, action STRING",)
            raise ValueError(f"enum label {new!r} already exists")
        if m.group("where"):
            ref = m.group("ref")
            if ref not in labels:
                raise KeyError(f"enum label {ref!r} does not exist")
            at = labels.index(ref) + (
                0 if m.group("where").upper() == "BEFORE" else 1
            )
            labels.insert(at, new)
        else:
            labels.append(new)  # default: after the last (AlterEnum)
        action = f"ADD VALUE {new}"
    else:
        old, to = m.group("old"), m.group("to")
        if old not in labels:
            raise KeyError(f"enum label {old!r} does not exist")
        if to in labels:
            raise ValueError(f"enum label {to!r} already exists")
        labels[labels.index(old)] = to
        action = f"RENAME VALUE {old} TO {to}"
    return status_frame(engine.spark, ("ALTER TYPE", name, action), "tag STRING, typname STRING, action STRING",)


def try_handle_stmt(engine, query: str) -> DataFrame | None:
    m = _ALTER_TYPE.match(query)
    if m:
        return _handle_alter_type(engine, m)
    m = _CREATE_ENUM.match(query)
    if m:
        name = m.group("name").lower()
        if name in engine.user_types:
            raise ValueError(f"type {name!r} already exists")
        labels = re.findall(r"'([^']*)'", m.group("labels"))
        if len(set(labels)) != len(labels):
            raise ValueError("enum labels must be distinct")
        engine.user_types[name] = {"kind": "enum", "labels": labels}
        return status_frame(engine.spark, ("CREATE TYPE", name, "enum", len(labels)), "tag STRING, typname STRING, kind STRING, n INT",)
    m = _CREATE_COMPOSITE.match(query)
    if m and not re.match(
        r"^\s*ENUM\b", m.group("fields"), re.IGNORECASE
    ):
        from .create_function import _map_type
        from .ddl_tables import _parse_column_defs

        name = m.group("name").lower()
        if name in engine.user_types:
            raise ValueError(f"type {name!r} already exists")
        defs, _pk = _parse_column_defs(m.group("fields"))
        ddl = "struct<" + ", ".join(
            f"{c['name']}: "
            + (resolve_type(engine, c["type"]) or _map_type(c["type"]))
            for c in defs
        ) + ">"
        engine.user_types[name] = {"kind": "composite", "ddl": ddl}
        return status_frame(engine.spark, ("CREATE TYPE", name, "composite", len(defs)), "tag STRING, typname STRING, kind STRING, n INT",)
    m = _CREATE_DOMAIN.match(query)
    if m:
        name = m.group("name").lower()
        if name in engine.user_types:
            raise ValueError(f"domain {name!r} already exists")
        tail = m.group("tail")
        if re.search(r"\bCHECK\b", tail, re.IGNORECASE):
            raise NotImplementedError(
                "CREATE DOMAIN ... CHECK changes INSERT semantics — "
                "validate with a WHERE/RAISE guard in the INSERT ... "
                "SELECT (the table-CHECK position)"
            )
        engine.user_types[name] = {
            "kind": "domain", "base": m.group("base").strip().lower(),
        }
        return status_frame(engine.spark, ("CREATE DOMAIN", name, m.group("base").strip()), "tag STRING, typname STRING, base STRING",)
    m = _DROP_TYPE.match(query)
    if m:
        name = m.group("name").lower()
        used = [
            t for t, meta in engine.managed_tables.tables.items()
            if name in (meta.get("enum_cols") or {}).values()
        ]
        if used:
            # typecmds.cpp refuses dropping a type in use (DEPENDENCY)
            raise ValueError(
                f"cannot drop type {name!r}: table(s) {used} use it"
            )
        existed = engine.user_types.pop(name, None) is not None
        return status_frame(engine.spark, ("DROP TYPE", name, existed), "tag STRING, typname STRING, existed BOOLEAN",)
    return None


# ---------------------------------------------------------------- queries

from ..registry import query  # noqa: E402


@query(
    "create_type_enum_column",
    """
    WITH labeled AS (
      SELECT CASE o_orderpriority
               WHEN '1-URGENT' THEN 'urgent'
               WHEN '2-HIGH' THEN 'high'
               WHEN '3-MEDIUM' THEN 'medium'
               WHEN '4-NOT SPECIFIED' THEN 'unspecified'
               ELSE 'low' END AS prio,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey <= 4000
    ),
    ranked AS (
      SELECT prio, price,
             CASE prio WHEN 'urgent' THEN 1 WHEN 'high' THEN 2
                       WHEN 'medium' THEN 3 WHEN 'low' THEN 4
                       ELSE 5 END AS enum_pos
      FROM labeled
    )
    SELECT prio, CAST(enum_pos AS INT) AS enum_pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM ranked GROUP BY prio, enum_pos ORDER BY enum_pos
    """,
)
def create_type_enum_column(spark, sf_dir):
    """CREATE TYPE ... AS ENUM end-to-end (gram.y:12693 DefineEnum;
    enum.cpp declared-position ordering + enum_in validation): declare
    the type, use it as a COLUMN TYPE, insert mapped labels (validated
    inside the write job), aggregate ordered by declared position via
    array_position over the catalog labels — and prove an out-of-set
    label really aborts the write."""
    import shutil
    import tempfile

    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="enum_gate_")
    eng.managed_tables.root = tmp
    try:
        eng.sql(
            "CREATE TYPE prio_t AS ENUM ('urgent', 'high', 'medium',"
            " 'low', 'unspecified')"
        )
        eng.sql("CREATE TABLE pe (prio prio_t, price double)")
        eng.sql(
            "INSERT INTO pe SELECT CASE o_orderpriority"
            " WHEN '1-URGENT' THEN 'urgent'"
            " WHEN '2-HIGH' THEN 'high'"
            " WHEN '3-MEDIUM' THEN 'medium'"
            " WHEN '4-NOT SPECIFIED' THEN 'unspecified'"
            " ELSE 'low' END,"
            " CAST(o_totalprice AS DOUBLE) FROM orders"
            " WHERE o_orderkey <= 4000"
        )
        try:
            eng.sql("INSERT INTO pe SELECT 'bogus', 1.0")
            raise AssertionError("out-of-set enum label must refuse")
        except Exception as exc:  # noqa: BLE001 — surfaces via Py4J
            assert "invalid input value for enum" in str(exc)
        labels = eng.user_types["prio_t"]["labels"]
        arr = "array(" + ", ".join(f"'{v}'" for v in labels) + ")"
        out = eng.sql(
            f"SELECT prio,"
            f" CAST(array_position({arr}, prio) AS INT) AS enum_pos,"
            f" COUNT(*) AS n,"
            f" CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE)"
            f"   AS total"
            f" FROM pe GROUP BY prio ORDER BY enum_pos"
        )
        rows = [(r[0], r[1], r[2], float(r[3])) for r in out.collect()]
        eng.sql("DROP TABLE pe PURGE")
        eng.sql("DROP TYPE prio_t")
        return spark.createDataFrame(
            rows, "prio STRING, enum_pos INT, n BIGINT, total DOUBLE"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
