#!/usr/bin/env python3
"""Capture .explain("formatted") for every Spark job a query runs.

Monkeypatches DataFrame.collect/count/localCheckpoint so that each
materialization point logs its formatted physical plan before running
(localCheckpoint is made a pass-through so the pre-checkpoint plan is
visible instead of an opaque checkpoint scan). The returned DataFrame's
plan is logged last. Used to produce plans/r06/<query>_{before,after}.txt
— run once against the round-start tree (git worktree/clone) and once
against the current tree:

    python scripts/capture_plans.py <repo_root> <out_dir> <query> [query...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = sys.argv[1]
OUT_DIR = sys.argv[2]
QUERIES = sys.argv[3:]
SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")

sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import DataFrame as BaseDataFrame

    try:  # Spark 4: the concrete class overrides the base's methods
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        DataFrame = BaseDataFrame

    from sheep_spark.session import get_spark

    spark = get_spark("capture-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    qmap = entrymod.queries()
    orig_collect = DataFrame.collect
    orig_count = DataFrame.count
    orig_ckpt = DataFrame.localCheckpoint

    def fmt(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for name in QUERIES:
        plans: list[str] = []

        def log_collect(df, _orig=orig_collect):
            plans.append("== job: collect ==\n" + fmt(df))
            return _orig(df)

        def log_count(df, _orig=orig_count):
            plans.append("== job: count ==\n" + fmt(df))
            return _orig(df)

        def log_ckpt(df, eager=True, _orig=orig_ckpt):
            # log the PRE-checkpoint plan, then checkpoint for real so
            # iterative lineage still truncates
            plans.append("== job: localCheckpoint ==\n" + fmt(df))
            return _orig(df, eager)

        DataFrame.collect = log_collect
        DataFrame.count = log_count
        DataFrame.localCheckpoint = log_ckpt
        try:
            out = qmap[name](spark, SF_DIR)
            if isinstance(out, BaseDataFrame):
                plans.append("== returned DataFrame ==\n" + fmt(out))
        finally:
            DataFrame.collect = orig_collect
            DataFrame.count = orig_count
            DataFrame.localCheckpoint = orig_ckpt
        entrymod.clear_graph_cache()
        path = os.path.join(OUT_DIR, f"{name}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} (repo: {REPO})\n\n")
            f.write("\n".join(plans))
        print(f"wrote {path} ({len(plans)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
