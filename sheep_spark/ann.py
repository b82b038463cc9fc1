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


def lsh_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 4,
    n_tables: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN with ``n_tables`` independent hyperplane tables:
    a candidate matches if it shares the query's bucket in ANY table
    (classic multi-table LSH — single-table sign buckets are far too
    fine for weakly correlated vectors). Exact cosine re-rank on the
    candidate union. At scale each table join is a shuffle on the bucket
    key instead of a full cross join; recall rises with n_tables,
    selectivity with n_planes."""
    dim = len(embeddings.select(vec_col).first()[0])
    emb = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("ce")
    )
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7 + t)
        emb = emb.withColumn(f"bucket_{t}", lsh_bucket_expr(F.col("ce"), planes))
    emb = emb.persist()
    queries = emb.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"),
        F.col("ce").alias("qe"),
        *[F.col(f"bucket_{t}").alias(f"qb_{t}") for t in range(n_tables)],
    )
    cands = emb.where(~F.col("nid").isin(query_ids))
    match_any = None
    for t in range(n_tables):
        m = F.col(f"qb_{t}") == F.col(f"bucket_{t}")
        match_any = m if match_any is None else (match_any | m)
    scored = with_cosine(F.broadcast(queries).join(cands, on=match_any))
    scored = scored.select(
        "query_id", F.col("nid").alias("neighbor_id"), F.round(F.col("cosine"), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rn").cast("int").alias("rank"))
    )
