#!/usr/bin/env python
"""Dump .explain("formatted") for headline (or named) queries to
plans/<tag>/<query>_<suffix>.txt — the optimization rounds' before/after
plan evidence.  Not timing-sensitive: explain() only plans, it never runs
the job (queries whose *construction* runs driver-side actions, e.g. the
ANN trainers, do pay those actions).

Usage:
    python scripts/dump_plans.py before              # headline set
    python scripts/dump_plans.py after q41_stateful_thinning q72_mini_clean_corpus
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLAN_TAG (default r13).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tegallega_spark.session import get_spark  # noqa: E402
from tegallega_spark.queries import SPARK_QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r13")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
