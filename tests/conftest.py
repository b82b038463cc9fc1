import random

import pytest

from sheep_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
HEP_TH = "/root/reference/data/hep-th.dat"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sheep-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def random_graph(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    """Seeded undirected simple-graph edge list on vids 0..n-1 (some may
    be isolated and therefore absent, matching engine semantics)."""
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def degree_pos(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Python oracle for the degree-ascending sequence (sequence.h:52-63):
    pos = rank under (degree asc, vid asc) over non-isolated vertices."""
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda v: (deg[v], v))
    return {v: i for i, v in enumerate(order)}


def edges_df(spark, edges):
    from sheep_spark.graph import symmetrize

    df = spark.createDataFrame(edges, "src long, dst long")
    return symmetrize(df)
