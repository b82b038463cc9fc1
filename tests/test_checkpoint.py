from sheep_spark import analytics
from sheep_spark.checkpointing import Checkpointer
from tests.conftest import edges_df, random_graph


def test_pagerank_resume_matches_straight_run(spark, tmp_path):
    """Kill after superstep i → resume from checkpoint → same scores
    (FIXTURES.md F8)."""
    edges = random_graph(50, 110, seed=31)
    sym = edges_df(spark, edges)

    straight, info = analytics.pagerank(sym, tol=1e-7, max_iter=40)
    want = {r.vid: r.rank for r in straight.collect()}

    ck = Checkpointer(spark, str(tmp_path / "pr"), job="pagerank")
    # "killed" run: only 5 supersteps happen
    analytics.pagerank(sym, tol=1e-7, max_iter=5, checkpointer=ck)
    assert ck.complete_iterations() == [0, 1, 2, 3, 4]

    resumed, rinfo = analytics.pagerank(sym, tol=1e-7, max_iter=40, checkpointer=ck)
    got = {r.vid: r.rank for r in resumed.collect()}
    assert rinfo["iterations"] == info["iterations"]  # same total superstep count
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)

    # per-partition lineage + metrics recorded every superstep
    m = ck.metrics(3)
    assert m["lineage"] == "pagerank:iter=3<-iter=2"
    assert m["rows"] == sum(p["rows"] for p in m["partitions"])
    assert "l1_delta" in m


def test_cc_resume(spark, tmp_path):
    edges = random_graph(80, 100, seed=37)
    sym = edges_df(spark, edges)
    straight, _ = analytics.connected_components(sym)
    want = {r.vid: r.component for r in straight.collect()}

    ck = Checkpointer(spark, str(tmp_path / "cc"), job="cc")
    analytics.connected_components(sym, max_iter=2, checkpointer=ck)
    resumed, _ = analytics.connected_components(sym, checkpointer=ck)
    got = {r.vid: r.component for r in resumed.collect()}
    assert got == want


def test_lp_resume(spark, tmp_path):
    edges = random_graph(60, 130, seed=41)
    sym = edges_df(spark, edges)
    straight, _ = analytics.label_propagation(sym, max_iter=4)
    want = {r.vid: r.label for r in straight.collect()}

    ck = Checkpointer(spark, str(tmp_path / "lp"), job="lp")
    analytics.label_propagation(sym, max_iter=2, checkpointer=ck)
    resumed, _ = analytics.label_propagation(sym, max_iter=4, checkpointer=ck)
    got = {r.vid: r.label for r in resumed.collect()}
    assert got == want
