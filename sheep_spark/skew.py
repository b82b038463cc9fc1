"""Hub-vertex skew handling (north_star: "salting/range-repartitioning
for hub-vertex skew").

Three layers of defense, outermost first:

1. The degree-ascending sequence itself: hubs are eliminated last, so
   down-assignment gives each hub's edges to their (many distinct)
   lower-pos endpoints' parts — the hub never concentrates a partition
   (the reference's core trick, sequence.h:52-63).
2. AQE skew-join splitting (on in session.py) repairs stragglers at
   runtime.
3. These utilities, for when a specific plan still concentrates a key:
   - ``salted_join``: replicate the small side n_salt× and scatter the
     big side's hot keys across salt buckets;
   - ``salted_distinct_count``: two-phase distinct for per-key distinct
     aggregations whose key is hot;
   - ``range_repartition_by_pos``: contiguous pos ranges → co-locates
     the degree-sorted order (cheap map-side sequential access for CSR
     building).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salt: int = 16, seed: int = 42
) -> DataFrame:
    """Inner join big⋈small on ``key`` with the big side salted: rows of
    a hot key spread over n_salt shuffle buckets, the small side
    replicated n_salt×. Use when one key carries a disproportionate row
    count AND the small side is too big to broadcast outright."""
    salted_big = big.withColumn("_salt", (F.rand(seed) * n_salt).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def salted_distinct_count(
    df: DataFrame, key: str, val: str, out: str = "n_distinct"
) -> DataFrame:
    """Per-key COUNT(DISTINCT val) as distinct-then-count: the first
    (key, val) distinct is partially aggregated map-side, so a hub key
    reaching the shuffle carries at most |distinct vals| rows instead of
    its raw row count. (The evaluator's ECV aggregations use this shape
    inline, evaluate.py.)"""
    return df.select(key, val).distinct().groupBy(key).agg(F.count("*").alias(out))


def range_repartition_by_pos(df: DataFrame, n_partitions: int, pos_col: str = "pos") -> DataFrame:
    """Range-partition by sequence position: partition i holds a
    contiguous pos range, so degree-sorted scans (CSR block building,
    naive pos-chunk partitioning) are sequential per partition and the
    heavy tail (hubs = highest pos) lands in the last partitions where
    AQE can split it."""
    return df.repartitionByRange(n_partitions, pos_col)
