"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the exact ``pages`` schema from BASELINE.json:input_hint —
(url string, warc_ts timestamp, html binary, text string, lang string) —
with bytes fully determined by (seed, i): link targets come from md5
counter-mode draws against a Zipf(alpha) inverse CDF (hub vertices
exist, exponent ~1.3 per FIXTURES.md F1), and the golden ``text`` column
is produced by running the SAME pinned extractor the engine uses
(extract.extract_text_bytes), so the byte-identity invariant is
well-defined from birth.

Generation is distributed: ``spark.range(n)`` → Arrow-batched
``mapInPandas``; each worker rebuilds the (tiny) Zipf CDF locally —
nothing is broadcast, nothing depends on partitioning.
"""

from __future__ import annotations

import datetime
import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .extract import extract_text_bytes

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

_WORDS = (
    "graph edge vertex crawl index rank link page web data spark shuffle "
    "partition tree merge degree order scan join hash"
).split()


def _u64(*parts) -> int:
    return int.from_bytes(hashlib.md5(":".join(map(str, parts)).encode()).digest()[:8], "big")


def page_url(i: int, n_sites: int = 50) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def _zipf_cdf(n: int, alpha: float) -> np.ndarray:
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-alpha)
    return np.cumsum(w) / w.sum()


def build_html(i: int, n_pages: int, cdf: np.ndarray, seed: int, n_sites: int = 50) -> bytes:
    rng_base = ("page", seed, i)
    n_links = 4 + _u64(*rng_base, "n") % 12
    n_words = 20 + _u64(*rng_base, "w") % 40
    words = " ".join(_WORDS[_u64(*rng_base, "t", j) % len(_WORDS)] for j in range(n_words))
    anchors = []
    for j in range(n_links):
        u = (_u64(*rng_base, "l", j) % 2**53) / 2**53
        target = int(np.searchsorted(cdf, u))
        anchors.append(
            f'<a href="{page_url(target, n_sites)}">anchor {j} to {target}</a>'
        )
    body = f"<p>{words}</p>\n<ul>" + "".join(f"<li>{a}</li>" for a in anchors) + "</ul>"
    doc = (
        f"<html><head><title>page {i}</title>"
        f"<script>var x={i};</script><style>p{{margin:0}}</style></head>"
        f"<body><h1>Page {i}</h1>{body}</body></html>"
    )
    return doc.encode("utf-8")


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, alpha: float = 1.3, n_sites: int = 50,
    n_partitions: int | None = None,
) -> DataFrame:
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cdf = _zipf_cdf(n_pages, alpha)
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                blob = build_html(i, n_pages, cdf, seed, n_sites)
                lang_draw = _u64("lang", seed, i) % 100
                lang = "en" if lang_draw >= 5 else ("de" if lang_draw % 2 == 0 else "fr")
                rows.append(
                    (
                        page_url(i, n_sites),
                        _EPOCH + datetime.timedelta(seconds=i),
                        blob,
                        extract_text_bytes(blob),
                        lang,
                    )
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(n_pages, numPartitions=n_partitions).mapInPandas(gen, PAGES_SCHEMA)
