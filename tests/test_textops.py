import duckdb
import pytest

from sheep_spark import textops

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return con


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_dedup_matches_duckdb(docs, duck):
    got = rows(textops.exact_dedup(docs))
    want = sorted(
        duck.execute(
            r"""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
                       MIN(doc_id), CAST(COUNT(*) AS BIGINT)
                FROM documents GROUP BY 1"""
        ).fetchall()
    )
    assert got == want


def test_token_stats_matches_duckdb(docs, duck):
    got = rows(textops.token_stats(docs))
    want = sorted(
        duck.execute(
            r"""SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT),
                   CAST(length(text) AS BIGINT),
                   CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT),
                   CAST(len(regexp_extract_all(text,
                        '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
                        AS BIGINT)
                FROM documents"""
        ).fetchall()
    )
    assert got == want


def test_bpe_ish_count_on_tricky_text(spark, duck):
    """Java regex (Spark) and RE2 (DuckDB) must agree on the BPE-ish
    pattern over contractions, digits, punctuation runs, and unicode."""
    texts = [
        "I'll don't can've it's 123 4.5x",
        "héllo wörld — naïve café!!",
        "  leading  spaces\tand\ttabs  ",
        "a1b2c3 ... ?!? 'quoted'",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = rows(textops.token_stats(df).select("doc_id", "n_bpe_tokens"))
    duck.execute("CREATE OR REPLACE TABLE tricky(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO tricky VALUES (?, ?)", list(enumerate(texts)))
    want = sorted(
        duck.execute(
            r"""SELECT doc_id, CAST(len(regexp_extract_all(text,
                '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
                AS BIGINT) FROM tricky"""
        ).fetchall()
    )
    assert got == want


def test_rolling_fingerprint_matches_python(docs):
    """Rabin-Karp fold == direct python recomputation (incl. the
    empty-text guard and mod arithmetic)."""
    got = {r.doc_id: r.rolling_hash for r in textops.rolling_fingerprint(docs).collect()}
    import re

    pdf = docs.select("doc_id", "text").toPandas()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        t = re.sub(r"\s+", " ", text.strip().lower())
        h = 0
        for ch in t:
            h = (h * textops.ROLLING_BASE + ord(ch)) % textops.ROLLING_MOD
        assert got[doc_id] == h, doc_id


def test_jaccard_ngram_matches_duckdb(docs, duck):
    """Char-5-gram Jaccard mode == DuckDB lateral-unnest formulation."""
    got = rows(textops.jaccard_pairs(docs, 0.5, ngram_chars=5))
    want = sorted(
        duck.execute(
            r"""WITH norm AS (
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
                SELECT doc_a, doc_b, ROUND(i / (sa.sz + sb.sz - i), 6)
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE ROUND(i / (sa.sz + sb.sz - i), 6) >= 0.5"""
        ).fetchall()
    )
    assert got == want


def test_minhash_estimates_jaccard(docs):
    """MinHash estimate correlates with exact Jaccard on true near-dups."""
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in textops.jaccard_pairs(docs, 0.5).collect()}
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in textops.minhash_lsh_pairs(docs, threshold=0.25).collect()
    }
    # 16 hashes / 4 bands: P(recall | j=0.8) = 1-(1-0.8^4)^4 ≈ 0.88 —
    # check aggregate recall, not per-pair (LSH is probabilistic by design)
    strong = {p for p, j in exact.items() if j >= 0.8}
    recalled = strong & set(est)
    assert len(recalled) >= 0.7 * len(strong)
    for p in recalled:
        assert abs(est[p] - exact[p]) < 0.45  # 16-hash estimator is coarse


def test_simhash_matches_python_port(docs):
    import hashlib

    got = {r.doc_id: r.simhash for r in textops.simhash64(docs).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = set(text.strip().lower().split())
        tally = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for b in range(64):
                tally[b] += 1 if (h >> b) & 1 else -1
        want = format(sum(1 << b for b in range(64) if tally[b] > 0), "016x")
        assert got[doc_id] == want


def test_lang_id_deterministic(docs):
    a = {r.doc_id: r.lang_guess for r in textops.lang_id(docs).collect()}
    b = {r.doc_id: r.lang_guess for r in textops.lang_id(docs).collect()}
    assert a == b
    assert set(a.values()) <= {"en", "de", "fr"}
