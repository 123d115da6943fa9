#!/usr/bin/env python
"""Decompose per-query wall time: DataFrame build vs noop execution.

Usage: python scripts/profile_queries.py [name ...]
Prints one line per query: build_s, exec_s (min of 2), rounds.
Guide §1: measure first — this separates driver-side query construction
(py4j + analysis) from cluster execution so optimization effort lands on
the right side.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import HEADLINE
    from opengauss_vectordb_spark import registry
    from opengauss_vectordb_spark.session import get_spark

    registry.load_all_queries()
    from opengauss_vectordb_spark.registry import QUERIES

    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from opengauss_vectordb_spark.sources.bucketed import bucketed_tables
    from opengauss_vectordb_spark.vector.queries import (
        _ivf_index,
        _ivf_pq_layout,
    )

    _ivf_index(spark, sf_dir)
    _ivf_pq_layout(spark, sf_dir)
    bucketed_tables(spark, sf_dir)

    print(f"{'query':40s} {'build_s':>8s} {'exec_s':>8s} {'total':>8s}")
    rows = []
    for name in names:
        fn = QUERIES[name]
        best_b = best_e = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            best_b = b if best_b is None else min(best_b, b)
            best_e = e if best_e is None else min(best_e, e)
        rows.append((name, best_b, best_e))
        print(f"{name:40s} {best_b:8.3f} {best_e:8.3f} {best_b+best_e:8.3f}",
              flush=True)
    rows.sort(key=lambda r: -(r[1] + r[2]))
    tot_b = sum(r[1] for r in rows)
    tot_e = sum(r[2] for r in rows)
    print(f"\nTOTAL build={tot_b:.2f}s exec={tot_e:.2f}s")


if __name__ == "__main__":
    main()
