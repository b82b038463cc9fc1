"""Durable superstep checkpoints with per-partition lineage + metrics.

north_rule: "every superstep checkpoints per-partition lineage and
metrics so jobs resume mid-iteration". Layout (one dir per superstep,
atomic via Spark's _SUCCESS marker):

    <root>/iter=0007/data/            parquet snapshot of the state DF
    <root>/iter=0007/metrics.json     {iteration, wall_ms, rows, user metrics,
                                       partitions: [{pid, rows}...], lineage}

``latest()`` returns the newest *complete* superstep (data committed and
metrics present), so a job killed mid-write resumes from the previous
good superstep. The equivalent of the reference pipeline's filesystem
handoffs between stages (scripts/map-worker.sh:28-31) made iteration-
granular.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, job: str = "job"):
        self.spark = spark
        self.root = root
        self.job = job
        os.makedirs(root, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.root, f"iter={it:04d}")

    def save(self, it: int, df: DataFrame, metrics: dict | None = None) -> None:
        t0 = time.time()
        d = self._iter_dir(it)
        df.write.mode("overwrite").parquet(os.path.join(d, "data"))
        per_part = [
            {"pid": r["pid"], "rows": r["rows"]}
            for r in df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        ]
        payload = {
            "job": self.job,
            "iteration": it,
            "rows": sum(p["rows"] for p in per_part),
            "partitions": per_part,
            "wall_ms": int((time.time() - t0) * 1000),
            "lineage": f"{self.job}:iter={it}<-iter={it - 1}" if it > 0 else f"{self.job}:iter=0<-init",
            **(metrics or {}),
        }
        tmp = os.path.join(d, "metrics.json.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(d, "metrics.json"))

    def complete_iterations(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"iter=(\d+)", name)
            if not m:
                continue
            d = os.path.join(self.root, name)
            if os.path.exists(os.path.join(d, "metrics.json")) and os.path.exists(
                os.path.join(d, "data", "_SUCCESS")
            ):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame] | None:
        its = self.complete_iterations()
        if not its:
            return None
        it = its[-1]
        return it, self.spark.read.parquet(os.path.join(self._iter_dir(it), "data"))

    def metrics(self, it: int) -> dict:
        with open(os.path.join(self._iter_dir(it), "metrics.json")) as f:
            return json.load(f)
