"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship sheep pipeline on sf0.001. ``queries`` maps
every SQL-expressible operator from SURVEY.md §2 (+ the training-data
ops) to a (spark, sf_dir) callable; ``oracle_sql`` holds the DuckDB
equivalents. Non-SQL-expressible ops (union-find tree build, FFD
packing, LSH/simhash with driver-side state) appear in ``queries`` only
→ rows-only checks.

Column names are aliased identically on both sides; sums are cast to
BIGINT (DuckDB SUM(int)→HUGEINT otherwise); floats are rounded so the
value-hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

V_MOD = 4999
K = 8  # partition count used by the assignment/metric queries
PR_ITERS = 5
CC_MOD = 7  # sparsifier for the CC query: dense enough for a small
# diameter (few supersteps), sparse enough for a tractable DuckDB closure

# ---------------------------------------------------------------------------
# shared derivations (Spark side)
# ---------------------------------------------------------------------------


_GRAPH_CACHE: dict = {}
_GRAPH_CACHE_MAX = 2  # bounded: evicted entries are unpersisted (ADVICE r1)


def _graph(spark: SparkSession, sf_dir: str):
    """Memoized per (session, sf_dir): the driver runs every query in one
    session, so the symmetrize + rank work (and its cache) is shared.
    Bounded LRU — long-lived sessions touching many sf_dirs don't
    accumulate cached blocks."""
    from sheep_spark import graph

    # applicationId, not id(spark): CPython recycles addresses, so a new
    # session could alias a dead entry's key (VERDICT r4 nit)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _GRAPH_CACHE:
        # refresh recency: move the hit to the end (ADVICE r2 — popitem()
        # evicted LIFO and hits never refreshed, so this wasn't an LRU)
        _GRAPH_CACHE[key] = _GRAPH_CACHE.pop(key)
    else:
        while len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
            oldest = next(iter(_GRAPH_CACHE))
            e_old, v_old = _GRAPH_CACHE.pop(oldest)
            for df in (e_old, v_old):
                try:
                    df.unpersist()
                except Exception:
                    pass  # its session may already be stopped
        edges = graph.edges_from_tpch(spark, sf_dir, V_MOD).persist()
        verts = graph.vertices_from_edges(edges).persist()
        _GRAPH_CACHE[key] = (edges, verts)
    return _GRAPH_CACHE[key]


def clear_graph_cache() -> None:
    """Unpersist and drop every memoized graph (bench loops / REPLs)."""
    while _GRAPH_CACHE:
        _, (e, v) = _GRAPH_CACHE.popitem()
        for df in (e, v):
            try:
                df.unpersist()
            except Exception:
                pass


def _naive_meta(spark: SparkSession, sf_dir: str):
    from sheep_spark import partitioner

    edges, verts = _graph(spark, sf_dir)
    assign = partitioner.naive_partition(verts, K)
    return edges, verts, partitioner.vertex_meta(verts, assign)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_edges(spark, sf_dir):
    edges, _ = _graph(spark, sf_dir)
    return edges


def q_degree_rank(spark, sf_dir):
    _, verts = _graph(spark, sf_dir)
    return verts.select("vid", "degree", "pos")


def q_naive_assign(spark, sf_dir):
    _, _, vmeta = _naive_meta(spark, sf_dir)
    return vmeta.select("vid", "part")


def q_down_assign(spark, sf_dir):
    from sheep_spark import partitioner

    edges, _, vmeta = _naive_meta(spark, sf_dir)
    return partitioner.down_assign(edges, vmeta)


def q_down_reassign(spark, sf_dir):
    """Bounded-shuffle reassignment: delta moves when the partition
    vector changes from naive-k8 to naive-k7 over the same sequence."""
    from sheep_spark import partitioner

    edges, verts, vmeta_old = _naive_meta(spark, sf_dir)
    vmeta_new = partitioner.vertex_meta(verts, partitioner.naive_partition(verts, 7))
    return partitioner.down_reassign(edges, vmeta_old, vmeta_new)


def q_partition_metrics(spark, sf_dir):
    from sheep_spark import evaluate

    edges, _, vmeta = _naive_meta(spark, sf_dir)
    m = evaluate.evaluate(edges, vmeta)
    cols = [
        "n_edges", "edges_cut", "vcom_vol", "ecv_down", "ecv_up", "ecv_hash",
        "down_balance", "up_balance", "hash_balance", "vertex_balance",
    ]
    return spark.createDataFrame([tuple(int(m[c]) for c in cols)], ", ".join(f"{c} long" for c in cols))


def q_pagerank5(spark, sf_dir):
    from sheep_spark import analytics

    edges, verts = _graph(spark, sf_dir)
    ranks, _ = analytics.pagerank(edges, verts, tol=0.0, max_iter=PR_ITERS)
    return ranks.select("vid", F.round("rank", 10).alias("rank5"))


def q_cc(spark, sf_dir):
    from sheep_spark import analytics

    edges, _ = _graph(spark, sf_dir)
    sub = edges.where((F.col("src") + F.col("dst")) % CC_MOD == 0)
    labels, _ = analytics.connected_components(sub)
    return labels.select("vid", "component")


def q_triangles(spark, sf_dir):
    from sheep_spark import analytics

    edges, verts = _graph(spark, sf_dir)
    n = analytics.triangle_count(edges, verts)
    return spark.createDataFrame([(n,)], "n_triangles long")


def q_tokens(spark, sf_dir):
    from sheep_spark import textops

    return textops.token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    from sheep_spark import textops

    return textops.quality_score(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    from sheep_spark import textops

    return textops.lang_id(_docs(spark, sf_dir))


def q_exact_dedup(spark, sf_dir):
    from sheep_spark import textops

    return textops.exact_dedup(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from sheep_spark import textops

    return textops.fingerprint(_docs(spark, sf_dir))


def q_jaccard(spark, sf_dir):
    from sheep_spark import textops

    return textops.jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_rolling_fingerprint(spark, sf_dir):
    from sheep_spark import textops

    return textops.rolling_fingerprint(_docs(spark, sf_dir))


def q_jaccard_ngram(spark, sf_dir):
    from sheep_spark import textops

    return textops.jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, ngram_chars=5)


def q_minhash_lsh(spark, sf_dir):
    from sheep_spark import textops

    return textops.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_ann(spark, sf_dir):
    from sheep_spark import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def q_events_rollup(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "new_session",
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.coalesce(F.lag(F.col("ts").cast("timestamp").cast("long")).over(w), F.lit(-10**9))
            > 1800
        ).cast("int"),
    )
    return flagged.groupBy("user_id").agg(F.sum("new_session").cast("long").alias("n_sessions"))


# --- non-SQL-expressible (rows-only checks) --------------------------------


def q_elim_tree(spark, sf_dir):
    from sheep_spark import graph, tree

    edges, verts = _graph(spark, sf_dir)
    return tree.build_tree(graph.edges_pos(edges, verts), verts.count())


def q_sheep_assign(spark, sf_dir):
    from sheep_spark import graph, partitioner, tree

    edges, verts = _graph(spark, sf_dir)
    t = tree.build_tree(graph.edges_pos(edges, verts), verts.count())
    return partitioner.sheep_partition(t, verts, K)


def q_sheep_metrics(spark, sf_dir):
    from sheep_spark import evaluate, graph, partitioner, tree

    edges, verts = _graph(spark, sf_dir)
    t = tree.build_tree(graph.edges_pos(edges, verts), verts.count())
    assign = partitioner.sheep_partition(t, verts, K)
    m = evaluate.evaluate(edges, partitioner.vertex_meta(verts, assign))
    cols = ["n_edges", "edges_cut", "vcom_vol", "ecv_down", "down_balance", "vertex_balance"]
    return spark.createDataFrame([tuple(int(m[c]) for c in cols)], ", ".join(f"{c} long" for c in cols))


_TW_FACTS_CACHE: dict = {}


def q_tree_width_facts(spark, sf_dir):
    """T2/T6 jxn machinery: fill-tree facts (width/fill/heights) of the
    degree sequence — the reference's -w / find_max_width mode. The
    facts dict is memoized per sf_dir (the facts depend only on the
    data, not the session — ADVICE r4) so the *_golden companion reuses
    it instead of re-running the kernel."""
    from sheep_spark import graph, jxn

    key = sf_dir
    if key not in _TW_FACTS_CACHE:
        edges, verts = _graph(spark, sf_dir)
        _, f = jxn.build_jxn_tree(graph.edges_pos(edges, verts), verts.count())
        _TW_FACTS_CACHE[key] = f
    f = _TW_FACTS_CACHE[key]
    cols = ["vert_cnt", "edge_cnt", "width", "fill", "vert_height", "edge_height", "root_cnt"]
    return spark.createDataFrame(
        [tuple(int(f[c]) for c in cols)], ", ".join(f"{c} long" for c in cols)
    )


def q_tree_width_facts_golden(spark, sf_dir):
    return fingerprint_df(spark, q_tree_width_facts(spark, sf_dir))


def q_pagerank_csr5(spark, sf_dir):
    """CSR gather-scatter PageRank — same math as q_pagerank5, different
    physical plan; shares its SQL oracle (values identical to 1e-10)."""
    from sheep_spark import csr, partitioner

    edges, verts = _graph(spark, sf_dir)
    vmeta = partitioner.vertex_meta(verts, partitioner.naive_partition(verts, K)).persist()
    try:
        blocks = csr.build_csr_blocks(edges, vmeta)
        # pagerank_csr's final state is eagerly localCheckpoint'ed, so the
        # vmeta cache can be released before returning (hygiene standard)
        ranks, _ = csr.pagerank_csr(blocks, vmeta, tol=0.0, max_iter=PR_ITERS)
        return ranks.select("vid", F.round("rank", 10).alias("rank5"))
    finally:
        vmeta.unpersist()


def q_fennel_assign(spark, sf_dir):
    from sheep_spark import partitioner

    edges, verts = _graph(spark, sf_dir)
    return partitioner.fennel_partition(edges, verts, K)


def q_tree_facts(spark, sf_dir):
    from sheep_spark import graph, tree

    edges, verts = _graph(spark, sf_dir)
    t = tree.build_tree(graph.edges_pos(edges, verts), verts.count())
    f = tree.tree_facts_full(t)
    cols = ["vert_cnt", "edge_cnt", "width", "vert_height", "edge_height", "root_cnt"]
    return spark.createDataFrame(
        [tuple(int(f[c]) for c in cols)], ", ".join(f"{c} long" for c in cols)
    )


def q_label_prop(spark, sf_dir):
    from sheep_spark import analytics

    edges, _ = _graph(spark, sf_dir)
    sub = edges.where((F.col("src") + F.col("dst")) % CC_MOD == 0)
    labels, _ = analytics.label_propagation(sub, max_iter=3)
    return labels


def q_simhash(spark, sf_dir):
    from sheep_spark import textops

    return textops.simhash64(_docs(spark, sf_dir))


def q_lsh_ann(spark, sf_dir):
    from sheep_spark import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.lsh_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def q_lsh_pairs(spark, sf_dir):
    from sheep_spark import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.lsh_pairs(emb, min_cosine=0.2, n_planes=2, n_tables=4)


def q_pages_extract(spark, sf_dir):
    """Synthetic corpus → byte-identity check inside the query: returns
    per-page match flag counts (must be all matched)."""
    from sheep_spark import corpus, extract

    pages = corpus.generate_pages(spark, 500, seed=42)
    checked = extract.with_extracted_text(pages)
    return checked.select(
        (F.col("text") == F.col("extracted_text")).cast("int").alias("match")
    ).groupBy("match").count()


# ---------------------------------------------------------------------------
# golden fingerprints for the non-SQL queries (VERDICT r3 task 4)
# ---------------------------------------------------------------------------

#: Committed md5 fingerprints of the five driver-side (non-SQL-
#: expressible) query outputs at sf0.01, computed once from the
#: pytest-verified implementations (each is checked against an
#: independent python port in tests/) via scripts/golden_fingerprints.py.
#: The outputs are deterministic: fixed seeds, fixed tie-breaks, and the
#: tree build is partial-count-invariant (associativity property test).
#: PINNED TO sf0.01 — the correctness gate's scale; other sf_dirs
#: legitimately produce different outputs, so the *_golden queries are
#: only meaningful there.
GOLDEN_FP = {
    "elim_tree": "d28a7269510e78bd734a21eb7347df07",
    "tree_facts": "1cea4187d896e6f9278f8a5b1e145c50",
    "fennel_assign": "c5fe5866d740c163e917a3f2755f1ec2",
    "sheep_assign": "d93c8a449be7d2449f992bfb7af4ec32",
    "sheep_partition_metrics": "38009d14c5f80ecc4c61e50aeb111dd4",
    "tree_width_facts": "bd6dd50aa38afee188e3cf7507110cca",
}


def fingerprint_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """One row ``(fp string)``: order-insensitive md5 of the frame —
    columns sorted by name, each row rendered ``v1|v2|...`` (floats
    %.9g, None→NULL, bool→int), row strings sorted. Collects to the
    driver: these are SELF-CHECK queries over sf0.01-sized outputs
    (≤5k rows), not scale operators."""
    import hashlib

    cols = sorted(df.columns)

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    lines = sorted("|".join(norm(v) for v in row) for row in df.select(*cols).collect())
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return spark.createDataFrame([(h.hexdigest(),)], "fp string")


def q_elim_tree_golden(spark, sf_dir):
    return fingerprint_df(spark, q_elim_tree(spark, sf_dir))


def q_tree_facts_golden(spark, sf_dir):
    return fingerprint_df(spark, q_tree_facts(spark, sf_dir))


def q_fennel_assign_golden(spark, sf_dir):
    return fingerprint_df(spark, q_fennel_assign(spark, sf_dir))


def q_sheep_assign_golden(spark, sf_dir):
    return fingerprint_df(spark, q_sheep_assign(spark, sf_dir))


def q_sheep_metrics_golden(spark, sf_dir):
    return fingerprint_df(spark, q_sheep_metrics(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full sheep pipeline on sf0.001 → partition-quality row."""
    return q_sheep_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_build": q_edges,
        "degree_rank": q_degree_rank,
        "naive_assign": q_naive_assign,
        "down_assign": q_down_assign,
        "down_reassign": q_down_reassign,
        "partition_metrics": q_partition_metrics,
        "pagerank5": q_pagerank5,
        "pagerank_csr5": q_pagerank_csr5,
        "connected_components": q_cc,
        "triangle_count": q_triangles,
        "token_stats": q_tokens,
        "quality_score": q_quality,
        "lang_id": q_langid,
        "exact_dedup": q_exact_dedup,
        "fingerprint": q_fingerprint,
        "rolling_fingerprint": q_rolling_fingerprint,
        "jaccard_pairs": q_jaccard,
        "jaccard_ngram_pairs": q_jaccard_ngram,
        "minhash_lsh_pairs": q_minhash_lsh,
        "ann_cosine_topk": q_ann,
        "events_rollup": q_events_rollup,
        "sessionize": q_sessionize,
        "label_propagation": q_label_prop,
        "simhash": q_simhash,
        "ann_lsh_topk": q_lsh_ann,
        "ann_lsh_pairs": q_lsh_pairs,
        "pages_extract_identity": q_pages_extract,
        # rows-only (genuinely non-SQL-expressible: union-find tree build,
        # driver FFD packing / FENNEL stream — sequential by definition)
        "elim_tree": q_elim_tree,
        "tree_facts": q_tree_facts,
        "fennel_assign": q_fennel_assign,
        "sheep_assign": q_sheep_assign,
        "sheep_partition_metrics": q_sheep_metrics,
        # golden self-checks for the five rows-only queries above: the
        # Spark side fingerprints the full output; the "oracle" is the
        # committed constant in GOLDEN_FP (computed once from the
        # pytest-verified implementations at sf0.01 — see its docstring)
        "tree_width_facts": q_tree_width_facts,
        "elim_tree_golden": q_elim_tree_golden,
        "tree_width_facts_golden": q_tree_width_facts_golden,
        "tree_facts_golden": q_tree_facts_golden,
        "fennel_assign_golden": q_fennel_assign_golden,
        "sheep_assign_golden": q_sheep_assign_golden,
        "sheep_partition_metrics_golden": q_sheep_metrics_golden,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_GRAPH_CTE = f"""
raw AS (
  SELECT CAST(l_orderkey % {V_MOD} AS BIGINT) AS a,
         CAST((l_partkey * 31 + l_suppkey * 7) % {V_MOD} AS BIGINT) AS b
  FROM lineitem
  WHERE (l_orderkey % {V_MOD}) <> ((l_partkey * 31 + l_suppkey * 7) % {V_MOD})
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM raw
    UNION ALL
    SELECT b AS src, a AS dst FROM raw
  )
),
verts AS (SELECT src AS vid, COUNT(*) AS degree FROM edges GROUP BY src),
seq AS (
  SELECT vid, degree,
         CAST(ROW_NUMBER() OVER (ORDER BY degree, vid) - 1 AS BIGINT) AS pos
  FROM verts
),
nv AS (SELECT COUNT(*) AS n FROM seq),
assign AS (
  SELECT vid, pos, CAST((pos * {K}) // (SELECT n FROM nv) AS INT) AS part FROM seq
),
ej AS (
  SELECT e.src, e.dst, sa.pos AS pos_a, sa.part AS part_a, sb.pos AS pos_b, sb.part AS part_b
  FROM edges e JOIN assign sa ON e.src = sa.vid JOIN assign sb ON e.dst = sb.vid
)
"""

_TOKS_CTE = r"""
toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
)
"""


def _pagerank5_sql() -> str:
    damping = 0.85
    lines = [
        "WITH " + _GRAPH_CTE.strip().rstrip(),
        f""",
r0 AS (SELECT vid, degree AS deg, 1.0 / (SELECT n FROM nv) AS rank FROM seq)""",
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        lines.append(
            f""",
r{i} AS (
  SELECT e.dst AS vid, COUNT(*) AS deg,
         (1.0 - {damping}) / (SELECT n FROM nv)
         + {damping} * SUM(p.rank / p.deg) AS rank
  FROM edges e JOIN {prev} p ON e.src = p.vid
  GROUP BY e.dst
)"""
        )
        prev = f"r{i}"
    lines.append(f"\nSELECT vid, ROUND(rank, 10) AS rank5 FROM {prev}")
    return "".join(lines)


def _label_prop_sql(iters: int = 3) -> str:
    """LPA unrolled like _pagerank5_sql: per round, new label = mode of
    neighbor labels with smallest-label tie-break (ROW_NUMBER over
    cnt DESC, label ASC) — exactly analytics.label_propagation."""
    parts = [
        "WITH " + _GRAPH_CTE.strip(),
        f""",
sub AS (SELECT src, dst FROM edges WHERE (src + dst) % {CC_MOD} = 0),
l0 AS (SELECT DISTINCT src AS vid, src AS label FROM sub)""",
    ]
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(
            f""",
l{i} AS (
  SELECT vid, label FROM (
    SELECT e.dst AS vid, p.label, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY COUNT(*) DESC, p.label ASC) AS rn
    FROM sub e JOIN {prev} p ON e.src = p.vid
    GROUP BY e.dst, p.label
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    parts.append(f"\nSELECT vid, label FROM {prev}")
    return "".join(parts)


def _simhash_sql() -> str:
    """64-bit SimHash: per (doc, bit) ±1 vote over token md5 bits, then
    hex-string assembly — mirrors textops.simhash64 nibble for nibble.
    Bit b lives in hex char p = 16 - b//4 of md5(tok), at in-nibble
    offset b % 4."""
    return r"""WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((strpos('0123456789abcdef',
                                substr(md5(tok), CAST(16 - b // 4 AS INT), 1)) - 1)
                        >> CAST(b % 4 AS INT)) & 1 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM toks, (SELECT unnest(range(64)) AS b)
  GROUP BY doc_id, b
),
nibs AS (
  SELECT doc_id, CAST(16 - b // 4 AS INT) AS p,
         SUM(CASE WHEN vote > 0 THEN (1 << CAST(b % 4 AS INT)) ELSE 0 END) AS nib
  FROM votes GROUP BY doc_id, 2
)
SELECT doc_id,
       string_agg(substr('0123456789abcdef', CAST(nib + 1 AS INT), 1), '' ORDER BY p) AS simhash
FROM nibs GROUP BY doc_id"""


def _ann_lsh_sql(dim: int = 64, n_planes: int = 4, n_tables: int = 4, k: int = 10) -> str:
    """Multi-table hyperplane-LSH ANN with the md5-derived plane literals
    inlined (same _hyperplanes family the Spark path uses); candidate =
    bucket match in ANY table, exact cosine re-rank."""
    from sheep_spark.ann import _hyperplanes

    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7 + t)
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e, ["
            + ", ".join(repr(float(x)) for x in plane)
            + "]) >= 0 THEN '1' ELSE '0' END)"
            for plane in planes
        )
        buckets.append(f"({bits}) AS bucket_{t}")
    qcols = ", ".join(f"bucket_{t} AS qb_{t}" for t in range(n_tables))
    ccols = ", ".join(f"bucket_{t}" for t in range(n_tables))
    match = " OR ".join(f"qb_{t} = bucket_{t}" for t in range(n_tables))
    return f"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
b AS (SELECT vec_id, e, {", ".join(buckets)} FROM emb),
q AS (SELECT vec_id AS query_id, e AS qe, {qcols} FROM b WHERE vec_id IN (0,1,2,3,4)),
c AS (SELECT vec_id AS nid, e AS ce, {ccols} FROM b WHERE vec_id NOT IN (0,1,2,3,4)),
cand AS (SELECT DISTINCT query_id, qe, nid, ce FROM q JOIN c ON ({match})),
scored AS (SELECT query_id, nid AS neighbor_id,
                  ROUND(list_cosine_similarity(qe, ce), 6) AS cosine FROM cand),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


def _ann_lsh_pairs_sql(dim: int = 64, n_planes: int = 2, n_tables: int = 4,
                       min_cosine: float = 0.2) -> str:
    """All-pairs LSH dedup mode: candidate = bucket match in ANY table
    (id_a < id_b), exact cosine verify ≥ min_cosine."""
    from sheep_spark.ann import _hyperplanes

    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=7 + t)
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e, ["
            + ", ".join(repr(float(x)) for x in plane)
            + "]) >= 0 THEN '1' ELSE '0' END)"
            for plane in planes
        )
        buckets.append(f"({bits}) AS bucket_{t}")
    match = " OR ".join(f"x.bucket_{t} = y.bucket_{t}" for t in range(n_tables))
    return f"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
b AS (SELECT vec_id, e, {", ".join(buckets)} FROM emb),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.e AS ea, y.e AS eb
         FROM b x JOIN b y ON x.vec_id < y.vec_id AND ({match}))
SELECT id_a, id_b, ROUND(list_cosine_similarity(ea, eb), 6) AS cosine
FROM cand WHERE ROUND(list_cosine_similarity(ea, eb), 6) >= {min_cosine}"""


def oracle_sql() -> dict[str, str]:
    stop_en = "the|and|of|to|a|in|is|it|that|for"
    stop_de = "der|die|das|und|ist|nicht|ein|mit|auf|sich"
    stop_fr = "le|la|les|et|est|un|une|des|dans|pour"
    return {
        "edges_build": f"WITH {_GRAPH_CTE} SELECT src, dst FROM edges",
        "degree_rank": f"WITH {_GRAPH_CTE} SELECT vid, degree, pos FROM seq",
        "naive_assign": f"WITH {_GRAPH_CTE} SELECT vid, part FROM assign",
        "down_assign": f"""WITH {_GRAPH_CTE}
            SELECT src, dst,
                   CASE WHEN pos_a < pos_b THEN part_a ELSE part_b END AS part
            FROM ej WHERE src < dst""",
        "down_reassign": f"""WITH {_GRAPH_CTE},
            a_new AS (
              SELECT vid, CAST((pos * 7) // (SELECT n FROM nv) AS INT) AS part_new FROM seq
            ),
            own AS (
              SELECT e.src, e.dst,
                     CASE WHEN sa.pos < sb.pos THEN e.src ELSE e.dst END AS owner_vid
              FROM edges e JOIN assign sa ON e.src = sa.vid JOIN assign sb ON e.dst = sb.vid
              WHERE e.src < e.dst
            ),
            ch AS (
              SELECT a.vid AS owner_vid, a.part AS part_old, b.part_new
              FROM assign a JOIN a_new b ON a.vid = b.vid
              WHERE a.part <> b.part_new
            )
            SELECT o.src, o.dst, ch.part_old, ch.part_new
            FROM own o JOIN ch USING (owner_vid)""",
        "partition_metrics": f"""WITH {_GRAPH_CTE},
            downs AS (SELECT src, CASE WHEN pos_a < pos_b THEN part_a ELSE part_b END AS p FROM ej),
            ups   AS (SELECT src, CASE WHEN pos_a > pos_b THEN part_a ELSE part_b END AS p FROM ej),
            hashs AS (SELECT src, dst,
                      CASE WHEN (src * 2654435769) % 4294967296 < (dst * 2654435769) % 4294967296
                           THEN part_a ELSE part_b END AS p FROM ej),
            vcom  AS (SELECT src, part_b AS p FROM ej UNION ALL SELECT src, part_a FROM ej)
            SELECT
              (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM edges) AS n_edges,
              (SELECT COUNT(*) FROM ej WHERE src < dst AND part_a <> part_b) AS edges_cut,
              (SELECT CAST(SUM(c - 1) AS BIGINT) FROM (SELECT src, COUNT(DISTINCT p) AS c FROM vcom GROUP BY src)) AS vcom_vol,
              (SELECT CAST(SUM(c - 1) AS BIGINT) FROM (SELECT src, COUNT(DISTINCT p) AS c FROM downs GROUP BY src)) AS ecv_down,
              (SELECT CAST(SUM(c - 1) AS BIGINT) FROM (SELECT src, COUNT(DISTINCT p) AS c FROM ups GROUP BY src)) AS ecv_up,
              (SELECT CAST(SUM(c - 1) AS BIGINT) FROM (SELECT src, COUNT(DISTINCT p) AS c FROM hashs GROUP BY src)) AS ecv_hash,
              (SELECT MAX(c) FROM (SELECT part_a, COUNT(*) AS c FROM ej WHERE pos_a < pos_b GROUP BY part_a)) AS down_balance,
              (SELECT MAX(c) FROM (SELECT part_a, COUNT(*) AS c FROM ej WHERE pos_a > pos_b GROUP BY part_a)) AS up_balance,
              (SELECT MAX(c) FROM (SELECT p, COUNT(*) AS c FROM hashs WHERE src < dst GROUP BY p)) AS hash_balance,
              (SELECT MAX(c) FROM (SELECT part, COUNT(*) AS c FROM assign GROUP BY part)) AS vertex_balance""",
        "pagerank5": _pagerank5_sql(),
        "pagerank_csr5": _pagerank5_sql(),
        "connected_components": f"""WITH RECURSIVE {_GRAPH_CTE},
            sub AS (SELECT src, dst FROM edges WHERE (src + dst) % {CC_MOD} = 0),
            reach(vid, r) AS (
              SELECT src, src FROM sub
              UNION
              SELECT s.dst, reach.r FROM reach JOIN sub s ON s.src = reach.vid
            )
            SELECT vid, MIN(r) AS component FROM reach GROUP BY vid""",
        "triangle_count": f"""WITH {_GRAPH_CTE},
            o AS (SELECT CASE WHEN pos_a < pos_b THEN pos_a ELSE pos_b END AS a,
                         CASE WHEN pos_a < pos_b THEN pos_b ELSE pos_a END AS b
                  FROM ej WHERE src < dst)
            SELECT COUNT(*) AS n_triangles
            FROM o e1 JOIN o e2 ON e2.a = e1.b JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b""",
        "token_stats": r"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_text,
                   CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens,
                   CAST(len(regexp_extract_all(text,
                        '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents""",
        "quality_score": rf"""
            SELECT doc_id,
                   ROUND(CAST(len(regexp_extract_all(lower(text), '\b({stop_en})\b')) AS DOUBLE)
                         / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stopword_ratio,
                   ROUND(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                         / length(text), 6) AS punct_ratio,
                   ROUND(CAST(length(text) AS DOUBLE)
                         / len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_token_len
            FROM documents""",
        "lang_id": rf"""
            SELECT doc_id, lang,
                   CASE WHEN en >= de AND en >= fr THEN 'en'
                        WHEN de >= fr THEN 'de'
                        ELSE 'fr' END AS lang_guess
            FROM (
              SELECT doc_id, lang,
                     len(regexp_extract_all(lower(text), '\b({stop_en})\b')) AS en,
                     len(regexp_extract_all(lower(text), '\b({stop_de})\b')) AS de,
                     len(regexp_extract_all(lower(text), '\b({stop_fr})\b')) AS fr
              FROM documents)""",
        "exact_dedup": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_md5,
                   MIN(doc_id) AS keeper_doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY 1""",
        "fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
            FROM documents""",
        "rolling_fingerprint": r"""
            WITH norm AS (
              SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM documents
            )
            SELECT doc_id,
                   CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(t)+1),
                         i -> CAST(unicode(substr(t, CAST(i AS INT), 1)) AS BIGINT))),
                     (acc, c) -> (acc * 131 + c) % 2147483647
                   ) AS BIGINT) AS rolling_hash
            FROM norm""",
        "jaccard_pairs": f"""WITH {_TOKS_CTE},
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS DOUBLE) AS i
              FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ROUND(i / (sa.sz + sb.sz - i), 6) >= 0.5""",
        "jaccard_ngram_pairs": r"""WITH norm AS (
              SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
              FROM documents
            ),
            toks AS (
              SELECT DISTINCT doc_id, substr(t, CAST(i.i AS INT), 5) AS tok
              FROM norm, LATERAL (SELECT unnest(range(1, greatest(length(t) - 3, 1))) AS i) i
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS DOUBLE) AS i
              FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ROUND(i / (sa.sz + sb.sz - i), 6) >= 0.5""",
        "minhash_lsh_pairs": f"""WITH {_TOKS_CTE},
            sig AS (
              SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || ' ' || tok)) AS minhash
              FROM toks, (SELECT unnest(range(16)) AS seed)
              GROUP BY doc_id, seed
            ),
            bk AS (
              SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                     md5(string_agg(CAST(seed AS VARCHAR) || ':' || minhash, '|'
                         ORDER BY CAST(seed AS VARCHAR) || ':' || minhash)) AS bkey
              FROM sig GROUP BY doc_id, band
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
            ),
            agree AS (
              SELECT c.doc_a, c.doc_b,
                     ROUND(SUM(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
              FROM cand c
              JOIN sig a ON a.doc_id = c.doc_a
              JOIN sig b ON b.doc_id = c.doc_b AND b.seed = a.seed
              GROUP BY 1, 2
            )
            SELECT * FROM agree WHERE est_jaccard >= 0.5""",
        "ann_cosine_topk": """
            WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     ROUND(list_cosine_similarity(q.e, c.e), 6) AS cosine
              FROM emb q JOIN emb c ON c.vec_id NOT IN (0,1,2,3,4)
              WHERE q.vec_id IN (0,1,2,3,4)
            ),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
              FROM scored
            )
            SELECT * FROM ranked WHERE rank <= 10""",
        "events_rollup": """
            SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
                   COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2""",
        "sessionize": """
            SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM (
              SELECT user_id,
                     CASE WHEN epoch(ts) - COALESCE(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)), -1000000000) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM events)
            GROUP BY user_id""",
        "label_propagation": _label_prop_sql(3),
        "simhash": _simhash_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_lsh_pairs": _ann_lsh_pairs_sql(),
        # q_pages_extract is self-checking (byte-identity per page inside
        # the query); the oracle is the expected constant: all 500 match.
        "pages_extract_identity": "SELECT 1 AS match, CAST(500 AS BIGINT) AS count",
        # golden self-checks (non-SQL ops): the oracle is the committed
        # fingerprint constant — see GOLDEN_FP
        "elim_tree_golden": f"SELECT '{GOLDEN_FP['elim_tree']}' AS fp",
        "tree_facts_golden": f"SELECT '{GOLDEN_FP['tree_facts']}' AS fp",
        "fennel_assign_golden": f"SELECT '{GOLDEN_FP['fennel_assign']}' AS fp",
        "sheep_assign_golden": f"SELECT '{GOLDEN_FP['sheep_assign']}' AS fp",
        "sheep_partition_metrics_golden": (
            f"SELECT '{GOLDEN_FP['sheep_partition_metrics']}' AS fp"
        ),
        "tree_width_facts_golden": f"SELECT '{GOLDEN_FP['tree_width_facts']}' AS fp",
    }
