"""Iterative graph analytics over the (partitioned) edge table.

These are the consumers the partitioner exists for (BASELINE.json
north_rule): PageRank to convergence, connected components, label
propagation, triangle counting. All are expressed as DataFrame joins +
aggregations so Catalyst picks physical strategies; the per-superstep
shuffle volume is what sheep's low-ECV(down) partitioning minimizes.

Physical notes
--------------
- The edge table is hash-repartitioned on ``src`` ONCE and cached; every
  superstep's join then reuses that exchange, shuffling only the O(V)
  rank/label side.
- Per-superstep lineage is truncated with ``localCheckpoint`` (or durable
  parquet checkpoints via checkpointing.py for resume).
- Dangling vertices don't exist: the edge table is symmetrized, so every
  vertex has out-degree ≥ 1 — the PageRank update needs no dangling-mass
  term and matches the plain (1-d)/N + d·Σ formulation the oracle uses.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prepare_edges(edges_sym: DataFrame, n_partitions: int | None = None) -> DataFrame:
    spark = edges_sym.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return edges_sym.repartition(n, "src").persist()


def pagerank(
    edges_sym: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpointer=None,
) -> tuple[DataFrame, dict]:
    """PageRank to L1-convergence ``tol``. Returns (ranks(vid, rank), info).

    When ``checkpointer`` (checkpointing.Checkpointer) is given, each
    superstep is durably written with metrics + lineage and the loop
    resumes from the newest complete superstep.
    """
    edges = _prepare_edges(edges_sym)
    if vertices is not None and "degree" in vertices.columns:
        deg = vertices.select("vid", F.col("degree").cast("double").alias("deg"))
        n = deg.count()
    else:
        deg = edges.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").cast("double").alias("deg")
        )
        n = deg.count()

    # State carries (vid, deg, rank). The superstep recovers deg "for
    # free" as the group row count on the symmetrized edge table, so an
    # iteration costs exactly ONE edge-sized shuffle (groupBy dst) plus a
    # vertex-sized join for the convergence delta.
    start_iter = 0
    state = deg.select("vid", "deg", F.lit(1.0 / n).alias("rank"))
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_iter, state = resumed[0] + 1, resumed[1]
    state = state.persist()

    info = {"iterations": 0, "l1_delta": None, "superstep_secs": [], "n_vertices": n}
    base = (1.0 - damping) / n
    for it in range(start_iter, max_iter):
        t0 = time.time()
        new_state = (
            edges.join(state.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(
                (F.lit(base) + F.lit(damping) * F.sum(F.col("rank") / F.col("deg"))).alias("rank"),
                F.count("*").cast("double").alias("deg"),
            )
            .select("vid", "deg", "rank")
        )
        if (it - start_iter) % 8 == 7:
            new_state = new_state.localCheckpoint(eager=False)
        new_state = new_state.persist()
        if tol > 0.0:
            l1 = (
                new_state.select("vid", F.col("rank").alias("nr"))
                .join(state.select("vid", "rank"), "vid")
                .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))).alias("d"))
                .collect()[0]["d"]
            )
        else:  # fixed-iteration mode: materialize without the delta join
            new_state.count()
            l1 = float("inf")
        state.unpersist()
        state = new_state
        info["iterations"] = it + 1
        info["l1_delta"] = float(l1)
        info["superstep_secs"].append(time.time() - t0)
        if checkpointer is not None:
            checkpointer.save(it, state, {"l1_delta": float(l1)})
        if l1 < tol:
            break
    edges.unpersist()
    return state.select("vid", "rank"), info


def connected_components(
    edges_sym: DataFrame, max_iter: int = 200, checkpointer=None
) -> tuple[DataFrame, dict]:
    """Star-contraction (Boruvka-style) connected components →
    labels(vid, component), component = min vid in the component. The
    distributed analogue of the reference's in-memory union-find
    (lib/unionfind.h:34-103), in O(log V) rounds:

    each round every vertex of the CONTRACTED graph takes label
    s(v) = min(v, min neighbor); the vid→label map composes through the
    contraction, and the contracted edge set (s(a), s(b)), a≠b shrinks
    geometrically until empty. Rounds are edge-sized shuffles — no
    diameter dependence (the naive min-propagation needs O(diameter)
    rounds, hopeless on path-like graphs).
    """
    edges = _prepare_edges(edges_sym)
    labels = edges.select(F.col("src").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("component")
    )
    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_iter, labels = resumed[0] + 1, resumed[1]
    labels = labels.persist()

    # contracted graph (symmetric, no self loops); rebuilt from labels on
    # resume so checkpoints only need the label map
    g = (
        edges.join(labels.select(F.col("vid").alias("src"), F.col("component").alias("ca")), "src")
        .join(labels.select(F.col("vid").alias("dst"), F.col("component").alias("cb")), "dst")
        .where(F.col("ca") != F.col("cb"))
        .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .distinct()
        .persist()
        if start_iter
        else edges.persist()
    )

    info = {"iterations": 0, "changed": None}
    for it in range(start_iter, max_iter):
        star = g.groupBy("src").agg(F.least(F.col("src"), F.min("dst")).alias("lbl")).persist()
        new_labels = (
            labels.join(star.withColumnRenamed("src", "component"), "component", "left")
            .select("vid", F.coalesce("lbl", "component").alias("component"))
        )
        new_g = (
            g.join(star.select(F.col("src"), F.col("lbl").alias("la")), "src")
            .join(star.select(F.col("src").alias("dst"), F.col("lbl").alias("lb")), "dst")
            .where(F.col("la") != F.col("lb"))
            .select(F.col("la").alias("src"), F.col("lb").alias("dst"))
            .distinct()
        )
        # labels references BOTH the star and g lineages → its logical
        # plan doubles per round; eager-truncate it every round (V-sized,
        # cheap). g is materialized by count() below with a lazy truncate.
        new_labels = new_labels.localCheckpoint(eager=True)
        new_g = new_g.localCheckpoint(eager=False).persist()
        remaining = new_g.count()
        labels.unpersist()
        g.unpersist()
        star.unpersist()
        labels, g = new_labels, new_g
        info["iterations"] = it + 1
        info["changed"] = remaining
        if checkpointer is not None:
            checkpointer.save(it, labels, {"changed": remaining})
        if remaining == 0:
            break
    edges.unpersist()
    g.unpersist()
    return labels, info


def label_propagation(
    edges_sym: DataFrame, max_iter: int = 10, init: DataFrame | None = None,
    checkpointer=None,
) -> tuple[DataFrame, dict]:
    """Synchronous LPA with a fully deterministic schedule: new label =
    most frequent neighbor label, ties broken by smallest label; a vertex
    keeps its label when it has no neighbors. Fixed round count
    (deterministic, oracle-friendly) rather than oscillation detection.
    """
    edges = _prepare_edges(edges_sym)
    labels = init or edges.select(F.col("src").alias("vid")).distinct().withColumn(
        "label", F.col("vid")
    )
    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_iter, labels = resumed[0] + 1, resumed[1]
    labels = labels.localCheckpoint(eager=True)
    w = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("label"))
    info = {"iterations": 0}
    for it in range(start_iter, max_iter):
        counts = (
            edges.join(labels.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        info["iterations"] = it + 1
        if checkpointer is not None:
            checkpointer.save(it, labels, {})
    edges.unpersist()
    return labels, info


def triangle_count(edges_sym: DataFrame, vertices: DataFrame) -> int:
    """Global triangle count via degree-ordered orientation — the same
    degree-ascending order as sheep's sequence (sequence.h:52-63) bounds
    the wedge intermediate exactly like down-assignment bounds ECV."""
    per = triangles_per_edge_base(edges_sym, vertices)
    row = per.agg(F.coalesce(F.count("*"), F.lit(0)).alias("n")).collect()[0]
    return int(row["n"])


def triangles_per_edge_base(edges_sym: DataFrame, vertices: DataFrame) -> DataFrame:
    """One row per triangle (a<b<c in pos space). Orientation: every edge
    directed from lower to higher pos, so each triangle is counted exactly
    once and hub fan-out is bounded by in-ascending-degree wedges."""
    v = F.broadcast(vertices.select("vid", "pos"))
    e = (
        edges_sym.join(v.withColumnRenamed("vid", "src").withColumnRenamed("pos", "pa"), "src")
        .join(v.withColumnRenamed("vid", "dst").withColumnRenamed("pos", "pb"), "dst")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .persist()
    )
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
    return tris.select("a", "b", "c")
