import numpy as np

from sheep_spark import analytics, graph
from tests.conftest import degree_pos, edges_df, random_graph


def numpy_pagerank(edges, d=0.85, tol=1e-12, max_iter=2000):
    vids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = r / deg
        nr = np.full(n, (1 - d) / n)
        for a, b in edges:
            nr[idx[b]] += d * contrib[idx[a]]
            nr[idx[a]] += d * contrib[idx[b]]
        if np.abs(nr - r).sum() < tol:
            r = nr
            break
        r = nr
    return {v: r[idx[v]] for v in vids}


def test_pagerank_allclose_oracle(spark):
    edges = random_graph(70, 150, seed=13)
    sym = edges_df(spark, edges)
    ranks, info = analytics.pagerank(sym, tol=1e-8, max_iter=150)
    got = {r.vid: r.rank for r in ranks.collect()}
    want = numpy_pagerank(edges)
    assert info["l1_delta"] < 1e-8
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want)
    # probability mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_connected_components_exact(spark):
    edges = [(0, 1), (1, 2), (5, 6), (7, 8), (8, 9), (9, 7), (20, 21)]
    sym = edges_df(spark, edges)
    labels, info = analytics.connected_components(sym)
    got = {r.vid: r.component for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}
    assert info["changed"] == 0


def test_connected_components_path_graph_logarithmic(spark):
    """Diameter-independence regression (ADVICE r1): a 400-vertex path has
    diameter 399; star contraction must label it in O(log V) rounds, not
    O(diameter). Single-sided min contraction shrinks paths ~1 vertex
    per round and would blow the round budget here."""
    n = 400
    sym = edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    labels, info = analytics.connected_components(sym, max_iter=25)
    assert info["converged"] and info["iterations"] <= 25
    got = {r.vid: r.component for r in labels.collect()}
    assert got == {v: 0 for v in range(n)}


def test_connected_components_unconverged_warns(spark):
    import warnings

    sym = edges_df(spark, [(i, i + 1) for i in range(64)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, info = analytics.connected_components(sym, max_iter=1)
    assert not info["converged"]
    assert any(issubclass(x.category, RuntimeWarning) for x in w)


def test_connected_components_random_vs_unionfind(spark):
    edges = random_graph(150, 160, seed=17)  # sparse → several components
    sym = edges_df(spark, edges)
    labels, _ = analytics.connected_components(sym)
    got = {r.vid: r.component for r in labels.collect()}

    uf = {}

    def find(x):
        while uf.get(x, x) != x:
            uf[x] = uf.get(uf[x], uf[x])
            x = uf[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            uf[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in {v for e in edges for v in e}}
    assert got == want


def triangle_brute(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    vids = sorted(adj)
    for i, a in enumerate(vids):
        for b in adj[a]:
            if b <= a:
                continue
            count += len(adj[a] & adj[b] & {c for c in vids if c > b})
    return count


def test_triangle_count_exact(spark):
    edges = random_graph(40, 150, seed=23)
    sym = edges_df(spark, edges)
    verts = graph.vertices_from_edges(sym)
    assert analytics.triangle_count(sym, verts) == triangle_brute(edges)


def python_lpa(edges, iters):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[label[u]] = counts.get(label[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        label = new
    return label


def test_label_propagation_deterministic_and_exact(spark):
    edges = random_graph(60, 130, seed=29)
    sym = edges_df(spark, edges)
    l1, _ = analytics.label_propagation(sym, max_iter=4)
    l2, _ = analytics.label_propagation(sym, max_iter=4)
    got1 = {r.vid: r.label for r in l1.collect()}
    got2 = {r.vid: r.label for r in l2.collect()}
    assert got1 == got2
    assert got1 == python_lpa(edges, 4)
