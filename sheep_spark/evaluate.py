"""Partition-quality evaluators — sheep's exhaustive metric suite
(lib/partition.cpp:428-521) as DataFrame aggregations.

All metrics share one physical shape: join the symmetrized edge table to
per-vertex (pos, part) on both endpoints, derive an owner part per edge,
then a two-stage distinct-count per vertex. The two-stage form
(distinct pairs → count per vertex) keeps hub vertices skew-safe: the
heavy groupBy key only ever carries ≤ #parts rows after the first
partial aggregation.

Metrics (names match the reference's printout):
- edges_cut  : undirected edges with endpoints in different parts (:452)
- vcom_vol   : Σ_X |{X's part} ∪ {parts of X's neighbors}| − 1 (:444-460)
- ecv_hash   : edge owned by endpoint with smaller cormen_hash (:455, :423-427)
- ecv_down   : edge owned by lower-pos endpoint (:505) — the headline metric
- ecv_up     : mirror (:506)
- *_balance  : max per-part load for each ownership rule (:436-441, :507-508)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# multiplicative hashes for the ECV(hash) owner rule:
# cormen (partition.cpp:423-427): k * floor((sqrt(5)-1)/2 * 2^32) mod 2^32
# knuth  (partition.cpp:414-421): k * 2654435761 mod 2^32
_CORMEN_S = 2654435769
_KNUTH_S = 2654435761
_HASH_CONSTS = {"cormen": _CORMEN_S, "knuth": _KNUTH_S}


def _mult_hash(col, hash_fn: str):
    return F.pmod(col * F.lit(_HASH_CONSTS[hash_fn]), F.lit(2**32))


def joined_edges(edges_sym: DataFrame, vmeta: DataFrame, broadcast_meta: bool = True) -> DataFrame:
    """Symmetrized edges annotated with (pos, part) of both endpoints.
    The broadcast hint is size-guarded (graph.maybe_broadcast)."""
    from .graph import maybe_broadcast

    v = maybe_broadcast(vmeta) if broadcast_meta else vmeta
    a = v.select(F.col("vid").alias("src"), F.col("pos").alias("pos_a"), F.col("part").alias("part_a"))
    b = v.select(F.col("vid").alias("dst"), F.col("pos").alias("pos_b"), F.col("part").alias("part_b"))
    return edges_sym.join(a, "src").join(b, "dst")


def _sum_distinct_minus_one(pairs: DataFrame, key: str, val: str) -> int:
    """Σ_key (count distinct val) − 1 — computed as distinct-then-count so
    partial aggregation absorbs hub skew before the shuffle."""
    per = pairs.select(key, val).distinct().groupBy(key).agg((F.count("*") - 1).alias("c"))
    row = per.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("s")).collect()[0]
    return int(row["s"])


def evaluate(edges_sym: DataFrame, vmeta: DataFrame, broadcast_meta: bool = True,
             hash_fn: str = "cormen", num_parts: int | None = None) -> dict:
    """Full metric dict in THREE jobs over one cached edge-join:
    (1) scalar counts, (2) all per-vertex distinct-owner sums via a
    metric-tagged union, (3) all per-part max loads likewise. The tagged
    union turns what would be 7 separate aggregations into single
    shuffles with a 'metric' key prefix — same skew-safety, 1/3 the
    passes.

    When the partition count fits a long bitmask (k ≤ 62, every real
    sheep config) the per-vertex distinct-count collapses to
    ``bit_count(bit_or(1 << part))`` — ONE shuffle whose map-side
    partial absorbs all duplicate (vertex, part) pairs, instead of the
    two-stage distinct. ~5× faster at 10M+ edges, exact either way;
    ``num_parts`` is derived from vmeta when not passed."""
    down_owner = F.when(F.col("pos_a") < F.col("pos_b"), F.col("part_a")).otherwise(F.col("part_b"))
    up_owner = F.when(F.col("pos_a") > F.col("pos_b"), F.col("part_a")).otherwise(F.col("part_b"))
    hash_owner = F.when(
        _mult_hash(F.col("src"), hash_fn) < _mult_hash(F.col("dst"), hash_fn),
        F.col("part_a"),
    ).otherwise(F.col("part_b"))
    # owner parts computed once into the cache; every downstream job
    # reads them instead of re-evaluating the when/pmod expressions
    j = (
        joined_edges(edges_sym, vmeta, broadcast_meta)
        .withColumn("down_p", down_owner)
        .withColumn("up_p", up_owner)
        .withColumn("hash_p", hash_owner)
        .persist()
    )
    try:
        down_owner, up_owner, hash_owner = F.col("down_p"), F.col("up_p"), F.col("hash_p")

        scalars = j.agg(
            F.count("*").alias("n_directed"),
            F.sum(
                ((F.col("src") < F.col("dst")) & (F.col("part_a") != F.col("part_b"))).cast("long")
            ).alias("edges_cut"),
        ).collect()[0]
        n_edges = int(scalars["n_directed"]) // 2
        edges_cut = int(scalars["edges_cut"] or 0)

        if num_parts is None:
            num_parts = int(vmeta.agg(F.max("part")).collect()[0][0] or 0) + 1
        if num_parts <= 62:
            # ONE pass over the edge-join: per src, bit_or each ownership
            # rule's part into a long mask (integer shiftleft — no
            # floating point), popcount at the end. vs the tagged union:
            # 1x the scan instead of 5x, same exactness, same hub-safety
            # (the group value is one long regardless of degree).
            masked = j.select(
                "src",
                F.expr("shiftleft(CAST(1 AS BIGINT), part_a)").alias("ma"),
                F.expr("shiftleft(CAST(1 AS BIGINT), part_b)").alias("mb"),
                F.expr("shiftleft(CAST(1 AS BIGINT), down_p)").alias("md"),
                F.expr("shiftleft(CAST(1 AS BIGINT), up_p)").alias("mu"),
                F.expr("shiftleft(CAST(1 AS BIGINT), hash_p)").alias("mh"),
            )
            per_vertex = masked.groupBy("src").agg(
                (F.bit_count(F.bit_or("ma").bitwiseOR(F.bit_or("mb"))) - 1).alias("vcom"),
                (F.bit_count(F.bit_or("md")) - 1).alias("down"),
                (F.bit_count(F.bit_or("mu")) - 1).alias("up"),
                (F.bit_count(F.bit_or("mh")) - 1).alias("hash"),
            )
            row = per_vertex.agg(
                *[F.sum(c).alias(c) for c in ("vcom", "down", "up", "hash")]
            ).collect()[0]
            ecv = {k: int(row[k] or 0) for k in ("vcom", "down", "up", "hash")}
        else:
            # >62 parts: metric-tagged union + two-stage distinct (the
            # hub-skew-safe general form)
            def tagged(metric, p_col):
                return j.select(F.lit(metric).alias("metric"), "src", p_col.alias("p"))

            ecv_rows = (
                tagged("vcom", F.col("part_b"))
                .unionAll(tagged("vcom", F.col("part_a")))
                .unionAll(tagged("down", down_owner))
                .unionAll(tagged("up", up_owner))
                .unionAll(tagged("hash", hash_owner))
            )
            per_vertex = (
                ecv_rows.distinct()
                .groupBy("metric", "src")
                .agg((F.count("*") - 1).alias("c"))
                .groupBy("metric")
                .agg(F.sum("c").alias("s"))
            )
            ecv = {r["metric"]: int(r["s"]) for r in per_vertex.collect()}

        def load_rows(metric, p_col, cond):
            return j.where(cond).select(F.lit(metric).alias("metric"), p_col.alias("part"))

        bal_rows = (
            load_rows("down", down_owner, F.col("pos_a") < F.col("pos_b"))
            .unionAll(load_rows("up", up_owner, F.col("pos_a") > F.col("pos_b")))
            .unionAll(load_rows("hash", hash_owner, F.col("src") < F.col("dst")))
            .unionAll(
                vmeta.select(F.lit("vertex").alias("metric"), F.col("part"))
            )
        )
        balances = {
            r["metric"]: int(r["m"])
            for r in bal_rows.groupBy("metric", "part")
            .count()
            .groupBy("metric")
            .agg(F.max("count").alias("m"))
            .collect()
        }

        return {
            "n_edges": n_edges,
            "edges_cut": edges_cut,
            "vcom_vol": ecv.get("vcom", 0),
            "ecv_down": ecv.get("down", 0),
            "ecv_up": ecv.get("up", 0),
            "ecv_hash": ecv.get("hash", 0),
            "down_balance": balances.get("down", 0),
            "up_balance": balances.get("up", 0),
            "hash_balance": balances.get("hash", 0),
            "vertex_balance": balances.get("vertex", 0),
            "ecv_down_per_edge": ecv.get("down", 0) / max(n_edges, 1),
        }
    finally:
        j.unpersist()


def evaluate_oracle(edges: list[tuple[int, int]], pos: dict[int, int], part: dict[int, int],
                    hash_fn: str = "cormen") -> dict:
    """Pure-python port of the evaluator semantics (partition.cpp:428-521)
    for tests: exact, per the reference's nested-loop definition."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def cormen(k: int) -> int:
        return (k * _HASH_CONSTS[hash_fn]) % 2**32

    edges_cut = vcom = ecv_down = ecv_up = ecv_hash = 0
    down_bal: dict[int, int] = {}
    up_bal: dict[int, int] = {}
    hash_bal: dict[int, int] = {}
    vert_bal: dict[int, int] = {}
    n_edges = sum(len(s) for s in adj.values()) // 2
    for x, nbrs in adj.items():
        vert_bal[part[x]] = vert_bal.get(part[x], 0) + 1
        vset = {part[x]}
        dset, uset, hset = set(), set(), set()
        for y in nbrs:
            if x < y and part[x] != part[y]:
                edges_cut += 1
            vset.add(part[y])
            d = part[x] if pos[x] < pos[y] else part[y]
            u = part[x] if pos[x] > pos[y] else part[y]
            h = part[x] if cormen(x) < cormen(y) else part[y]
            dset.add(d)
            uset.add(u)
            hset.add(h)
            if pos[x] < pos[y]:
                down_bal[part[x]] = down_bal.get(part[x], 0) + 1
            if pos[x] > pos[y]:
                up_bal[part[x]] = up_bal.get(part[x], 0) + 1
            if x < y:
                hash_bal[h] = hash_bal.get(h, 0) + 1
        vcom += len(vset) - 1
        ecv_down += len(dset) - 1
        ecv_up += len(uset) - 1
        ecv_hash += len(hset) - 1
    return {
        "n_edges": n_edges,
        "edges_cut": edges_cut,
        "vcom_vol": vcom,
        "ecv_down": ecv_down,
        "ecv_up": ecv_up,
        "ecv_hash": ecv_hash,
        "down_balance": max(down_bal.values(), default=0),
        "up_balance": max(up_bal.values(), default=0),
        "hash_balance": max(hash_bal.values(), default=0),
        "vertex_balance": max(vert_bal.values(), default=0),
        "ecv_down_per_edge": ecv_down / max(n_edges, 1),
    }
