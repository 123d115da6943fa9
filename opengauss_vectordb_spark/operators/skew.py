"""Skew mitigation for shuffle joins — the engine-level fallback when a
key's row count exceeds what AQE's skew-join splitting handles.

The reference spreads skewed redistribution with its Stream exchange
operators' round-robin mode (`src/include/optimizer/streamplan.h:50`
LOCAL_ROUNDROBIN); in Spark the equivalent engine-level tool is salting:
spread one hot key over `n_salts` reducers by appending a deterministic
salt to the big side's key, and replicate the small side once per salt so
every (key, salt) pair still meets its match.

Cost model: the big (skewed) side is untouched except one extra tiny
column; the small side is duplicated ``n_salts`` times — acceptable when
small is dimension-sized, which is exactly the skewed-join case (a fact
table whose hot keys all hash to one reducer). The salt is a pmod over a
per-row fingerprint, not rand(): deterministic under task retries and
shuffle-order changes, so results are stable at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on columns ``on``, spreading each of
    big's keys across ``n_salts`` shuffle partitions.

    Semantics match ``big.join(small, on, how)`` for inner/left joins
    (each big row joins the one replica sharing its salt). The big side's
    salt fingerprints all of its columns, so hot keys spread evenly even
    when the non-key attributes repeat.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_equi_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")


# --------------------------------------------------------------------------
# Gated query: salted join over the natural skew in lineitem⋈orders'
# priority attribute — the oracle is the plain join, so the driver
# hash-check pins salting as a pure physical rewrite (zero semantic
# drift), the property the streamplan.h round-robin mode guarantees.
# --------------------------------------------------------------------------

from ..catalog import table  # noqa: E402
from ._util import dsum6  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "salted_skew_join",
    """
    SELECT o_orderpriority,
           l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority, l_returnflag
    ORDER BY o_orderpriority, l_returnflag
    """,
)
def salted_skew_join(spark, sf_dir):
    """Skew-salted fact⋈dimension join (streamplan.h:50
    LOCAL_ROUNDROBIN analogue): lineitem keys spread over 8 salts, the
    orders side replicated per salt, then aggregated. The oracle is the
    UNSALTED join — hash-equality proves salting changes only the
    shuffle distribution, never the result. At 100 TB this is the
    fallback when one hot key exceeds what AQE skew-split handles;
    deterministic pmod(xxhash64) salt keeps retries/reruns stable.

    Cost honesty: salting REPLICATES the small side n_salts times, so
    on unskewed data (this bench) it is deliberately slower than the
    plain join — the rewrite pays replication to buy reducer balance,
    and wins only when a hot key would otherwise serialize one
    reducer. That trade is the point; do not use it as the default
    join path."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), "l_returnflag", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_equi_join(li, o, ["l_orderkey"], n_salts=8)
    return (
        j.groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # scaled-long spelling of the decimal sum (bit-identical:
            # price is 2 dp ≤ ~1.1e5 — _util.dsum6 preconditions)
            dsum6(F.col("l_extendedprice"), "revenue"),
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )
