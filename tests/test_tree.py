import pytest

from sheep_spark import graph, tree
from tests.conftest import degree_pos, edges_df, random_graph


def spark_tree(spark, edges, n_partials):
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    ep = graph.edges_pos(sym, verts)
    n = verts.count()
    t = tree.build_tree(ep, n, n_partials=n_partials)
    rows = sorted(t.collect(), key=lambda r: r.jnid)
    parent = [r.parent for r in rows]
    pst = [r.pst_weight for r in rows]
    return parent, pst


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("n_partials", [1, 4, 16])
def test_distributed_tree_equals_serial_oracle(spark, seed, n_partials):
    """Merge associativity (jnode.cpp:174-201): the distributed build must
    equal the serial jtree.cpp:34-55 semantics for ANY partial count."""
    edges = random_graph(80, 160, seed=seed)
    pos = degree_pos(edges)
    parent_o, pst_o = tree.serial_tree_oracle(edges, pos)
    parent_s, pst_s = spark_tree(spark, edges, n_partials)
    assert parent_s == parent_o
    assert pst_s == pst_o


def test_tree_structural_invariants(spark):
    edges = random_graph(120, 200, seed=9)
    parent, pst = spark_tree(spark, edges, 4)
    n = len(parent)
    # parent strictly later in the sequence (elimination goes upward)
    assert all(p is None or p > j for j, p in enumerate(parent))
    # sum pst_weight == number of undirected edges (each counted at its lo end)
    assert sum(pst) == len(edges)
    # roots == number of connected components (python union-find oracle)
    uf = {}

    def find(x):
        while uf.get(x, x) != x:
            uf[x] = uf.get(uf[x], uf[x])
            x = uf[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            uf[ra] = rb
    n_comp = len({find(v) for v in {v for e in edges for v in e}})
    assert sum(1 for p in parent if p is None) == n_comp


def test_disconnected_graph(spark):
    edges = [(0, 1), (1, 2), (10, 11), (12, 13), (11, 12)]
    pos = degree_pos(edges)
    parent_o, pst_o = tree.serial_tree_oracle(edges, pos)
    parent_s, pst_s = spark_tree(spark, edges, 4)
    assert parent_s == parent_o and pst_s == pst_o
    assert sum(1 for p in parent_s if p is None) == 2
