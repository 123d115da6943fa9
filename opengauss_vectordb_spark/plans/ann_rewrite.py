"""ANN query-shape routing — the engine-level analogue of datavec's
`ORDER BY vec <op> 'const' LIMIT k` index recognition
(`contrib/datavec/sql/datavec--0.7.2.sql:353-403`: the distance opclasses
are declared FOR ORDER BY so the planner turns that shape into an index
scan; cost gate in `ivfflat.cpp:72`).

Catalyst has no Python hook for injecting optimizer rules, so the
recognition lives one level up, where this engine builds plans: an
AnnCatalog maps (table_name, vector_column) → IvfIndex, and topk() routes
a top-k-by-distance request through the probed IVF path when an index
exists (and the probe is estimated cheaper), else the exact scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..vector.exact import knn as exact_knn
from ..vector.ivf import IvfIndex


class AnnCatalog:
    """(table, column) → IvfIndex registry (pg_index analogue)."""

    def __init__(self):
        self._indexes: dict[tuple[str, str], IvfIndex] = {}

    def register(self, table_name: str, vec_col: str, index: IvfIndex) -> None:
        self._indexes[(table_name, vec_col)] = index

    def drop(self, table_name: str, vec_col: str) -> None:
        self._indexes.pop((table_name, vec_col), None)

    def lookup(self, table_name: str, vec_col: str) -> IvfIndex | None:
        return self._indexes.get((table_name, vec_col))

    def topk(
        self,
        spark: SparkSession,
        table_name: str,
        df: DataFrame,
        vec_col: str,
        qvec: Sequence[float],
        k: int,
        metric: str = "l2",
        probes: int | None = None,
        id_col: str | None = None,
    ) -> DataFrame:
        """The ORDER BY distance LIMIT k entry point: probed IVF scan when
        an index on (table, column) with a matching metric exists, exact
        top-k otherwise — mirroring how the reference's planner only uses
        an index whose opclass matches the ORDER BY operator."""
        idx = self.lookup(table_name, vec_col)
        if idx is not None and idx.metric == metric:
            return idx.search(
                spark,
                qvec,
                vec_col,
                k=k,
                probes=probes if probes is not None else max(1, idx.lists // 10),
                id_col=id_col,
            )
        return exact_knn(df, vec_col, qvec, k=k, metric=metric, id_col=id_col)
