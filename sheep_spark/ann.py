"""Approximate-nearest-neighbor search over an embedding column
(``embeddings(vec_id, embedding array<float>, label)``).

- ``cosine_topk``: exact brute-force baseline. The dot product runs
  JVM-side via ``aggregate(zip_with(...))`` on double-cast arrays (no
  Python). Queries are broadcast; the candidate side streams, so the
  shape is a broadcast nested loop the optimizer handles well. For 100 TB
  embeddings the exact path is the per-bucket verifier, not the scan.

- ``lsh_topk``: scale path — random-hyperplane LSH (sign of dot with
  deterministic md5-derived hyperplanes) buckets candidates; exact
  cosine re-rank within buckets. Recall is tunable with n_planes/probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(pairs: DataFrame, a: str = "qe", b: str = "ce", out: str = "cosine") -> DataFrame:
    return pairs.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (neighbors exclude
    all query ids). Deterministic tie-break: (cosine desc, neighbor id).
    Output: (query_id, neighbor_id, cosine rounded to 6)."""
    emb = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("ce")
    )
    queries = emb.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("ce").alias("qe")
    )
    cands = emb.where(~F.col("nid").isin(query_ids))
    scored = with_cosine(F.broadcast(queries).crossJoin(cands))
    scored = scored.select(
        "query_id", F.col("nid").alias("neighbor_id"), F.round(F.col("cosine"), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("int").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7):
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG
    state, reproducible across engines/runs)."""
    import hashlib

    import numpy as np

    planes = []
    for p in range(n_planes):
        vals = []
        for c in range(0, dim, 8):
            h = hashlib.md5(f"{seed}:{p}:{c}".encode()).digest()
            vals.extend(b / 255.0 - 0.5 for b in h[:8])
        planes.append(vals[:dim])
    return np.array(planes)


def lsh_bucket_expr(vec_col, planes) -> "F.Column":
    """Signature = bit per hyperplane (sign of projection), as a string
    bucket key; stays JVM-side via aggregate/zip_with per plane."""
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(_dot(vec_col, arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bucketed(embeddings: DataFrame, n_planes: int, n_tables: int,
              id_col: str, vec_col: str) -> DataFrame:
    """(nid, ce, bucket_0..bucket_{T-1}): one sign-bucket key per table."""
    dim = len(embeddings.select(vec_col).first()[0])
    emb = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("ce")
    )
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7 + t)
        emb = emb.withColumn(f"bucket_{t}", lsh_bucket_expr(F.col("ce"), planes))
    return emb


def lsh_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 4,
    n_tables: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN with ``n_tables`` independent hyperplane tables:
    a candidate matches if it shares the query's bucket in ANY table
    (classic multi-table LSH — single-table sign buckets are far too
    fine for weakly correlated vectors). Exact cosine re-rank on the
    candidate union.

    Physical plan (the part that must survive 100×): one EQUI-join per
    table on that table's bucket column, then a union + dropDuplicates
    of the candidate sets. Each per-table join hashes on the bucket key
    — never a nested loop over all candidates (the OR-of-equalities
    formulation degenerates to BroadcastNestedLoopJoin; see
    tests/test_ann.py::test_lsh_plan_has_no_nested_loop).

    The bucketed table is deliberately NOT cached (r2 leaked it
    forever): column pruning means each per-table branch computes only
    its own bucket column off the scan, so the total bucket math is the
    same as a cached plan — and an E-sized row cache is exactly what
    can't exist at 100 TB anyway."""
    emb = _bucketed(embeddings, n_planes, n_tables, id_col, vec_col)
    queries = emb.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"),
        F.col("ce").alias("qe"),
        *[F.col(f"bucket_{t}").alias(f"qb_{t}") for t in range(n_tables)],
    )
    cands = emb.where(~F.col("nid").isin(query_ids))
    per_table = [
        F.broadcast(queries.select("query_id", "qe", F.col(f"qb_{t}").alias("bk")))
        .join(cands.select("nid", "ce", F.col(f"bucket_{t}").alias("bk")), "bk")
        .select("query_id", "qe", "nid", "ce")
        for t in range(n_tables)
    ]
    matched = per_table[0]
    for m in per_table[1:]:
        matched = matched.unionAll(m)
    matched = matched.dropDuplicates(["query_id", "nid"])
    scored = with_cosine(matched).select(
        "query_id", F.col("nid").alias("neighbor_id"), F.round(F.col("cosine"), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("int").alias("rank"))
    )


def lsh_pairs(
    embeddings: DataFrame, min_cosine: float = 0.8, n_planes: int = 8,
    n_tables: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs near-duplicate mode — what an embedding-dedup pipeline
    actually runs: per-table self-join on the bucket key (a shuffle on
    the key, no driver state), union the tables, dedup, exact cosine
    verify ≥ ``min_cosine``. Output (id_a < id_b, cosine).

    Scale shape mirrors textops.minhash_lsh_pairs: candidate volume is
    Σ_buckets |bucket|² per table — tune n_planes up to shrink buckets.
    Uncached by design, like lsh_topk: each self-join branch computes
    only its own bucket column off the scan (2× the vector math of a
    cache, none of the E-sized storage)."""
    emb = _bucketed(embeddings, n_planes, n_tables, id_col, vec_col)
    per_table = [
        emb.select(F.col("nid").alias("id_a"), F.col("ce").alias("qe"),
                   F.col(f"bucket_{t}").alias("bk"))
        .join(
            emb.select(F.col("nid").alias("id_b"), F.col("ce").alias("ce"),
                       F.col(f"bucket_{t}").alias("bk")),
            "bk",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "qe", "ce")
        for t in range(n_tables)
    ]
    cand = per_table[0]
    for m in per_table[1:]:
        cand = cand.unionAll(m)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return (
        with_cosine(cand)
        .select("id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine"))
        .where(F.col("cosine") >= min_cosine)
    )
