"""dblink — federated queries against a second catalog
(contrib/dblink; the same surface postgres_fdw / gc_fdw expose through
ForeignScan, SURVEY.md §2.1).

The PG workflow:

    SELECT dblink_connect('conn', 'dbname=other');
    SELECT * FROM dblink('conn', 'SELECT a, b FROM t') AS t(a int, b text);

Here a "remote database" is another table directory (the engine's
catalog unit), and each connection gets an ISOLATED Spark sub-session
(``spark.newSession()`` — same SparkContext, separate temp-view
namespace), so remote table names never collide with the local
catalog's.  The inner query executes entirely on the remote engine —
full pushdown, exactly what postgres_fdw strives for and dblink lacks —
and the result plugs into the local plan as a DataFrame (same context,
so a federated join is just a join; no driver round-trip, unlike real
dblink's row shipping).

Scale: connection setup is per-session metadata only; the remote query
plans/partitions like any local one.  A cross-catalog join obeys the
same broadcast/shuffle economics as local joins — AQE sees both sides.
"""

from __future__ import annotations

import re

from ..registry import query
from ._util import pin_schema, status_frame

_CONNECT = re.compile(
    r"^\s*SELECT\s+dblink_connect\(\s*'(?P<name>\w+)'\s*,\s*"
    r"'dir=(?P<dir>[^']+)'\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_DISCONNECT = re.compile(
    r"^\s*SELECT\s+dblink_disconnect\(\s*'(?P<name>\w+)'\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_DBLINK = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+dblink\(\s*'(?P<name>\w+)'\s*,\s*"
    r"'(?P<q>(?:[^']|'')*)'\s*\)\s*"
    r"(?:AS\s+\w+\s*\(\s*(?P<cols>[^)]*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def try_handle_stmt(engine, stmt: str):
    m = _CONNECT.match(stmt)
    if m:
        from ..engine import Engine

        name = m.group("name").lower()
        remote = engine.spark.newSession()
        engine.dblink_conns[name] = Engine(remote, m.group("dir"))
        return status_frame(engine.spark, ("OK", name), "dblink_connect STRING, conn STRING")
    m = _DISCONNECT.match(stmt)
    if m:
        name = m.group("name").lower()
        if engine.dblink_conns.pop(name, None) is None:
            raise KeyError(f"dblink connection {name!r} does not exist")
        return status_frame(engine.spark, ("OK", name), "dblink_disconnect STRING, conn STRING")
    m = _DBLINK.match(stmt)
    if m:
        name = m.group("name").lower()
        conn = engine.dblink_conns.get(name)
        if conn is None:
            raise KeyError(
                f"dblink connection {name!r} not established; run"
                f" SELECT dblink_connect('{name}', 'dir=<path>') first"
            )
        out = conn.sql(m.group("q").replace("''", "'"))
        cols = m.group("cols")
        if cols:
            names = [
                c.strip().split()[0] for c in cols.split(",") if c.strip()
            ]
            out = out.toDF(*names)
        return out
    return None


_REMOTE_DIR = "/root/testdata/sf0.001"  # the fixed DSN a dblink conn names


@query(
    "dblink_remote_agg",
    f"""
    WITH l AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS local_n
      FROM orders GROUP BY o_orderpriority
    ),
    r AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS remote_n
      FROM read_parquet('{_REMOTE_DIR}/orders.parquet')
      GROUP BY o_orderpriority
    )
    SELECT l.o_orderpriority, l.local_n, r.remote_n
    FROM l JOIN r USING (o_orderpriority)
    ORDER BY l.o_orderpriority
    """,
)
def dblink_remote_agg(spark, sf_dir):
    """dblink end-to-end (contrib/dblink): connect to a second catalog
    (the sf0.001 directory standing in for the remote DSN), push an
    aggregate down to the remote, and JOIN the shipped result with the
    same aggregate over the local catalog — the canonical federated
    reporting query.  The oracle reads the remote parquet directly,
    proving the remote engine computed over the remote data, not a
    view-name collision with the local catalog.

    Scale: the inner query runs fully remote (aggregate pushdown);
    only its |groups| result rows enter the local plan, which AQE then
    broadcasts into the join."""
    from ..engine import Engine

    eng = Engine(spark, sf_dir)
    eng.sql(f"SELECT dblink_connect('ref', 'dir={_REMOTE_DIR}')")
    remote = eng.sql(
        "SELECT * FROM dblink('ref',"
        " 'SELECT o_orderpriority, COUNT(*) AS remote_n FROM orders"
        " GROUP BY o_orderpriority') AS t(o_orderpriority, remote_n)"
    )
    local = eng.sql(
        "SELECT o_orderpriority, COUNT(*) AS local_n"
        " FROM orders GROUP BY o_orderpriority"
    )
    out = (
        local.join(remote, "o_orderpriority")
        .select("o_orderpriority", "local_n", "remote_n")
        .orderBy("o_orderpriority")
    )
    eng.sql("SELECT dblink_disconnect('ref')")
    return pin_schema(
        out, "o_orderpriority STRING, local_n BIGINT, remote_n BIGINT"
    )
