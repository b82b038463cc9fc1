import random

from sheep_spark import evaluate, graph, partitioner
from tests.conftest import degree_pos, edges_df, random_graph


def test_spark_evaluator_matches_python_port(spark):
    """DataFrame metric suite == direct python port of the reference's
    nested-loop evaluator (partition.cpp:428-521)."""
    edges = random_graph(90, 200, seed=21)
    pos = degree_pos(edges)
    rng = random.Random(4)
    part = {v: rng.randrange(4) for v in pos}

    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    assign = spark.createDataFrame(list(part.items()), "vid long, part int")
    vmeta = partitioner.vertex_meta(verts, assign)

    got = evaluate.evaluate(sym, vmeta)
    want = evaluate.evaluate_oracle(edges, pos, part)
    assert got == want


def test_canonical_once_path_matches_doubled(spark):
    """evaluate(once=canonical) — the r6 single-scan explode form — must
    equal the doubled-view path AND the python port, for the full suite
    and the fast subset."""
    from pyspark.sql import functions as F

    edges = random_graph(70, 160, seed=33)
    pos = degree_pos(edges)
    rng = random.Random(9)
    part = {v: rng.randrange(5) for v in pos}
    sym = edges_df(spark, edges)
    canon = sym.where(F.col("src") < F.col("dst"))
    verts = graph.vertices_from_edges(sym)
    assign = spark.createDataFrame(list(part.items()), "vid long, part int")
    vmeta = partitioner.vertex_meta(verts, assign)

    want = evaluate.evaluate_oracle(edges, pos, part)
    got_canon = evaluate.evaluate(sym, vmeta, once=canon)
    assert got_canon == want
    fast = ("edges_cut", "ecv_down", "down_balance")
    got_fast = evaluate.evaluate(sym, vmeta, metrics=fast, once=canon)
    assert all(got_fast[k] == want[k] for k in fast)


def test_evaluator_single_part_zero_cut(spark):
    edges = random_graph(40, 80, seed=2)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    assign = verts.selectExpr("vid", "CAST(0 AS INT) AS part")
    m = evaluate.evaluate(sym, partitioner.vertex_meta(verts, assign))
    assert m["edges_cut"] == 0
    assert m["vcom_vol"] == 0
    assert m["ecv_down"] == 0
    assert m["down_balance"] == m["n_edges"]


def test_knuth_hash_variant_matches_port(spark):
    """ECV(hash) under the knuth constant (partition.cpp:414-421) — the
    reference's second multiplicative hash — vs the python port."""
    from tests.conftest import degree_pos, edges_df, random_graph

    edges = random_graph(50, 120, seed=77)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    assign = partitioner.naive_partition(verts, 4)
    vmeta = partitioner.vertex_meta(verts, assign).persist()
    got = evaluate.evaluate(sym, vmeta, hash_fn="knuth")
    pos = degree_pos(edges)
    part = {r.vid: r.part for r in assign.collect()}
    want = evaluate.evaluate_oracle(edges, pos, part, hash_fn="knuth")
    for k in ("ecv_hash", "hash_balance"):
        assert got[k] == want[k], k
    # and the two constants genuinely differ on this graph's ownership
    base = evaluate.evaluate_oracle(edges, pos, part, hash_fn="cormen")
    assert ("ecv_hash", got["ecv_hash"]) != ("ecv_hash", None) and base["n_edges"] == want["n_edges"]


def test_metrics_subset_fast_mode(spark):
    """metrics=(...) subset mode (the at-scale quality gate) must return
    exactly the requested keys with the same values as the full suite."""
    edges = random_graph(70, 150, seed=11)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    vmeta = partitioner.vertex_meta(verts, partitioner.naive_partition(verts, 4)).persist()
    full = evaluate.evaluate(sym, vmeta)
    fast = evaluate.evaluate(sym, vmeta, metrics=("edges_cut", "ecv_down", "down_balance"))
    assert set(fast) == {"n_edges", "edges_cut", "ecv_down", "down_balance", "ecv_down_per_edge"}
    for k in fast:
        assert fast[k] == full[k], k
    # balances-only and ecv-only subsets hit each single-job path
    bal_only = evaluate.evaluate(sym, vmeta, metrics=("vertex_balance", "up_balance"))
    assert bal_only["vertex_balance"] == full["vertex_balance"]
    assert bal_only["up_balance"] == full["up_balance"]
    ecv_only = evaluate.evaluate(sym, vmeta, metrics=("vcom_vol",))
    assert ecv_only["vcom_vol"] == full["vcom_vol"]
    import pytest

    with pytest.raises(ValueError):
        evaluate.evaluate(sym, vmeta, metrics=("nope",))


def test_bitmask_and_distinct_paths_agree(spark):
    """The k<=62 bitmask single-pass and the general tagged-distinct path
    must produce identical metrics (num_parts=100 forces the fallback)."""
    from tests.conftest import edges_df, random_graph

    edges = random_graph(40, 90, seed=3)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    vmeta = partitioner.vertex_meta(verts, partitioner.naive_partition(verts, 5)).persist()
    fast = evaluate.evaluate(sym, vmeta)
    slow = evaluate.evaluate(sym, vmeta, num_parts=100)
    assert fast == slow
