import numpy as np
import pytest

from sheep_spark import graph, tree
from tests.conftest import degree_pos, edges_df, random_graph


def _sweep_pairs(lo, hi, n):
    kid, par = tree._eliminate(
        np.asarray(lo, dtype=np.int64), np.asarray(hi, dtype=np.int64), n, select=False
    )
    return set(zip(kid.tolist(), par.tolist()))


@pytest.mark.parametrize("seed", range(10))
def test_msf_select_preserves_sweep_output(seed):
    """Boruvka pre-selection must be a pure input filter: sweeping the
    selected subset yields the identical (kid, parent) set as sweeping
    everything (MSF threshold property; VERDICT r2 task 1). Covers dense
    and sparse inputs, duplicate edges, and multi-component graphs."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 300))
    m = int(rng.integers(10, 2500))
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo = np.minimum(a, b)[keep].astype(np.int64)
    hi = np.maximum(a, b)[keep].astype(np.int64)
    if seed % 2 == 0:  # half the seeds: deduped like edges_pos output
        pairs = np.unique(np.stack([lo, hi], 1), axis=0)
        lo, hi = pairs[:, 0], pairs[:, 1]
    sl, sh = tree._msf_select(lo, hi, n)
    assert len(sl) <= len(lo)
    assert _sweep_pairs(sl, sh, n) == _sweep_pairs(lo, hi, n)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("chunk", [17, 64, 509])
def test_msf_select_chunked_preserves_sweep_output(seed, chunk):
    """Filter-Kruskal chunking (r6) must be invisible to the sweep: any
    chunk size yields the same (kid, parent) set as the unchunked
    selection — a heavier chunk's edge is dropped only when lighter
    SELECTED edges already connect its endpoints (cycle property)."""
    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(20, 300))
    m = int(rng.integers(10, 2500))
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo = np.minimum(a, b)[keep].astype(np.int64)
    hi = np.maximum(a, b)[keep].astype(np.int64)
    sl, sh = tree._msf_select(lo, hi, n, chunk_edges=chunk)
    assert _sweep_pairs(sl, sh, n) == _sweep_pairs(lo, hi, n)


def test_msf_select_dense_graph_selects_at_most_v_minus_1():
    """On a dense graph run to completion, selection returns exactly the
    MSF — ≤ V-1 edges — which is the whole point of enabling it on the
    driver sweep path."""
    rng = np.random.default_rng(99)
    n = 100
    a = rng.integers(0, n, 8000)
    b = rng.integers(0, n, 8000)
    keep = a != b
    lo = np.minimum(a, b)[keep].astype(np.int64)
    hi = np.maximum(a, b)[keep].astype(np.int64)
    sl, sh = tree._msf_select(lo, hi, n)
    assert len(sl) <= n - 1
    assert _sweep_pairs(sl, sh, n) == _sweep_pairs(lo, hi, n)


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


def test_csweep_matches_interpreted_sweep():
    """The compiled union-find sweep (r6, _csweep) must emit the exact
    (kid -> parent) mapping of the interpreted fallback, with and
    without the Boruvka pre-selection, across random multigraphs."""
    import numpy as np

    from sheep_spark import _csweep

    if _csweep.loaded() is None:  # no toolchain: the fallback IS the path
        import pytest

        pytest.skip("C sweep unavailable; interpreted fallback in use")

    def pairs(lo, hi, n, select, force_python):
        if force_python:
            real, real_ss = _csweep.loaded, _csweep.loaded_sort_sweep
            _csweep.loaded = lambda: None
            _csweep.loaded_sort_sweep = lambda: None
            try:
                k, p = tree._eliminate(lo.copy(), hi.copy(), n, select=select)
            finally:
                _csweep.loaded = real
                _csweep.loaded_sort_sweep = real_ss
        else:
            k, p = tree._eliminate(lo.copy(), hi.copy(), n, select=select)
        assert len(set(k.tolist())) == len(k)  # each kid adopted once
        return dict(zip(k.tolist(), p.tolist()))

    rng = np.random.default_rng(29)
    for trial, (n, m) in enumerate([(6, 3), (40, 200), (500, 3000), (4000, 30000)]):
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        keep = a != b
        lo = np.minimum(a, b)[keep].astype(np.int64)
        hi = np.maximum(a, b)[keep].astype(np.int64)
        for select in (True, False):
            assert pairs(lo, hi, n, select, False) == pairs(lo, hi, n, select, True), (
                trial,
                select,
            )


def test_sort_sweep_matches_interpreted_and_emits_bincounts():
    """The compiled counting-sort + sweep (r6 late, _csweep.sheep_sort_sweep)
    must emit the exact (kid -> parent) mapping of the interpreted path
    (equal-hi order differs — counting sort keeps input order, the packed
    value sort uses lo order — but same-hi edges commute), and its fused
    pre_weight/pst_weight byproducts must equal the numpy bincounts.
    Covers multigraphs with duplicate edges, a disconnected graph, the
    empty input, and out-of-range rejection."""
    from sheep_spark import _csweep

    if _csweep.loaded_sort_sweep() is None:
        pytest.skip("C sort-sweep unavailable; fallback paths in use")

    def interp(lo, hi, n):
        real, real_ss = _csweep.loaded, _csweep.loaded_sort_sweep
        _csweep.loaded = lambda: None
        _csweep.loaded_sort_sweep = lambda: None
        try:
            k, p = tree._eliminate(lo.copy(), hi.copy(), n, select=False)
        finally:
            _csweep.loaded = real
            _csweep.loaded_sort_sweep = real_ss
        return dict(zip(k.tolist(), p.tolist()))

    rng = np.random.default_rng(83)
    for n, m in [(5, 2), (60, 400), (700, 5000), (3000, 40000)]:
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        keep = a != b
        lo = np.minimum(a, b)[keep].astype(np.int64)
        hi = np.maximum(a, b)[keep].astype(np.int64)
        w: dict = {}
        k, p = tree._eliminate(lo, hi, n, weights_out=w)
        assert dict(zip(k.tolist(), p.tolist())) == interp(lo, hi, n)
        assert np.array_equal(w["pre_weight"], np.bincount(hi, minlength=n))
        assert np.array_equal(w["pst_weight"], np.bincount(lo, minlength=n))

    # empty input
    w = {}
    k, p = tree._eliminate(np.array([], np.int64), np.array([], np.int64), 7,
                           weights_out=w)
    assert len(k) == 0 and np.array_equal(w["pre_weight"], np.zeros(7, np.int64))

    # out-of-range ids must raise, not corrupt
    with pytest.raises(ValueError):
        tree._eliminate(np.array([0], np.int64), np.array([5], np.int64), 3)
    with pytest.raises(ValueError):
        tree._eliminate(np.array([-1], np.int64), np.array([2], np.int64), 3)
