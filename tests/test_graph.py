from pyspark.sql import functions as F

from sheep_spark import graph
from tests.conftest import SF_DIR, degree_pos, edges_df, random_graph


def test_symmetrize_invariants(spark):
    raw = spark.createDataFrame([(1, 2), (2, 1), (3, 3), (1, 2), (4, 1)], "a long, b long")
    sym = graph.symmetrize(raw, "a", "b")
    rows = {(r.src, r.dst) for r in sym.collect()}
    assert rows == {(1, 2), (2, 1), (1, 4), (4, 1)}


def test_degree_sequence_matches_oracle(spark):
    edges = random_graph(60, 120, seed=7)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym).collect()
    pos_oracle = degree_pos(edges)
    deg_oracle: dict[int, int] = {}
    for a, b in edges:
        deg_oracle[a] = deg_oracle.get(a, 0) + 1
        deg_oracle[b] = deg_oracle.get(b, 0) + 1
    assert {r.vid: r.pos for r in verts} == pos_oracle
    assert {r.vid: r.degree for r in verts} == deg_oracle


def test_attach_rank_total_order(spark):
    df = spark.createDataFrame([(v,) for v in [5, 3, 9, 1, 7, 2]], "x long")
    ranked = {r.x: r.pos for r in graph.attach_rank(df, ["x"]).collect()}
    assert ranked == {1: 0, 2: 1, 3: 2, 5: 3, 7: 4, 9: 5}


def test_tpch_graph_deterministic(spark):
    e1, v1 = graph.graph_from_tpch(spark, SF_DIR)
    n_edges = e1.count()
    assert n_edges % 2 == 0 and n_edges > 0
    assert e1.where(F.col("src") == F.col("dst")).count() == 0
    # doubled: reversed set equals forward set
    fwd = e1.where(F.col("src") < F.col("dst")).count()
    rev = e1.where(F.col("src") > F.col("dst")).count()
    assert fwd == rev == n_edges // 2
    # pos is a dense permutation ordered by (degree, vid)
    rows = sorted(v1.collect(), key=lambda r: r.pos)
    assert [r.pos for r in rows] == list(range(len(rows)))
    assert all(
        (a.degree, a.vid) < (b.degree, b.vid) for a, b in zip(rows, rows[1:])
    )


def test_degree_sequence_driver_and_distributed_agree(spark):
    """The driver lexsort rank (small-V funnel) and the distributed
    two-phase rank must produce identical (vid, degree, pos) rows."""
    from tests.conftest import edges_df, random_graph

    from sheep_spark import graph

    edges = random_graph(150, 400, seed=31)
    sym = edges_df(spark, edges)
    a = graph.vertices_from_edges(sym)  # n << cap → driver path
    b = graph.vertices_from_edges(sym, driver_rank_max=0)  # force distributed
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
