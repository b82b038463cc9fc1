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
