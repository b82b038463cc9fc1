import numpy as np
import pytest

from sheep_spark import ann

EMB = "/root/testdata/sf0.001/embeddings.parquet"
QUERIES = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


def numpy_topk(pdf, query_ids, k=10):
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    cand_mask = ~np.isin(ids, query_ids)
    for q in query_ids:
        qi = np.where(ids == q)[0][0]
        sims = mat @ mat[qi] / (norms * norms[qi])
        order = sorted(
            [(round(s, 6), i) for s, i in zip(sims[cand_mask], ids[cand_mask])],
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[q] = [(i, s) for s, i in order]
    return out


def test_cosine_topk_matches_numpy(emb):
    got = {}
    for r in ann.cosine_topk(emb, QUERIES, k=10).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    want = numpy_topk(emb.toPandas(), QUERIES)
    for q in QUERIES:
        got_list = [(n, c) for _, n, c in sorted(got[q])]
        assert [n for n, _ in got_list] == [n for n, _ in want[q]]
        assert all(abs(c - wc) < 2e-6 for (_, c), (_, wc) in zip(got_list, want[q]))


def test_lsh_recall_against_exact(emb):
    """Bucketed ANN recalls a reasonable fraction of exact top-10 (8
    hyperplanes on 64-dim data) and never invents non-candidates."""
    exact = {
        (r.query_id, r.neighbor_id) for r in ann.cosine_topk(emb, QUERIES, k=10).collect()
    }
    lsh = {(r.query_id, r.neighbor_id) for r in ann.lsh_topk(emb, QUERIES, k=10).collect()}
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.2  # deterministic given md5 planes; observed ~0.4+
    # deterministic across runs
    lsh2 = {(r.query_id, r.neighbor_id) for r in ann.lsh_topk(emb, QUERIES, k=10).collect()}
    assert lsh == lsh2


def test_lsh_plan_has_no_nested_loop(emb):
    """The multi-table match must execute as per-table equi-joins on the
    bucket key — an OR-of-equalities condition degenerates to
    BroadcastNestedLoopJoin and LSH saves nothing (VERDICT r1)."""
    plan = ann.lsh_topk(emb, QUERIES, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_pairs_all_pairs_mode(emb):
    """All-pairs bucket mode: every reported pair really clears the
    cosine bar (verified against numpy), ids canonical a<b, no dupes."""
    got = ann.lsh_pairs(emb, min_cosine=0.2, n_planes=2, n_tables=4).collect()
    assert len(got) == len({(r.id_a, r.id_b) for r in got})
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lookup = {int(v): i for i, v in enumerate(ids)}
    for r in got:
        assert r.id_a < r.id_b
        want = round(float(mat[lookup[r.id_a]] @ mat[lookup[r.id_b]]), 6)
        assert abs(r.cosine - want) < 1e-6
        assert r.cosine >= 0.2
    # plan check: self-joins are bucket-key equi-joins too
    plan = ann.lsh_pairs(emb, 0.2, 2, 4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
