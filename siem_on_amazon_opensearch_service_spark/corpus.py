"""Deterministic Common-Crawl-style page corpus (FIXTURES.md section 1).

Shape per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

``html`` is a deterministic wrapper of ``text`` so the per-row
invariant "extracted text byte-identical per url" (the analog of the
reference's record->parsed-fields invariant, ref siem/__init__.py:519-574)
is testable: extract_text(html) == text, byte for byte.

Everything is seeded (numpy Generator, seed param) -- no wall-clock,
no external data. Generation is vectorized and chunked so multi-
million-row bench corpora build quickly and can be produced directly
as Spark partitions via mapInPandas (see :func:`pages_df`).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def vocabulary(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic vocabulary: w0000..wNNNN plus a few mixed-case /
    unicode-bearing shapes the analyzer must normalize."""
    return [f"w{i:05d}" for i in range(size)]


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


#: rows are generated in fixed chunks; chunk c uses rng seed (seed, c),
#: so any partitioning of the row space yields identical rows.
CHUNK = 8192

_LANGS = ["en"] * 19 + ["ja", "de"]


def _make_chunk(chunk_id: int, lo: int, hi: int, seed: int,
                vocab: np.ndarray, probs: np.ndarray) -> pd.DataFrame:
    """Rows [lo, hi) of chunk ``chunk_id`` (absolute row ids), fully
    vectorized: one rng per chunk, one choice() call for all tokens."""
    base = chunk_id * CHUNK
    size = CHUNK
    rng = np.random.default_rng([seed, chunk_id])
    dls = np.clip(np.exp(rng.normal(5.0, 0.6, size=size)), 1, 2000).astype(np.int64)
    total = int(dls.sum())
    tok_idx = rng.choice(len(vocab), size=total, p=probs)
    salt_pos = (rng.random(size) * dls).astype(np.int64)
    upper_doc = rng.random(size) < 0.3
    upper_pos = (rng.random(size) * dls).astype(np.int64)

    words = vocab[tok_idx]
    ends = np.cumsum(dls)
    starts = ends - dls
    # per-doc salt term + occasional upper-cased token (analyzer exercise)
    words[starts + salt_pos] = np.array(
        [f"salt{base + j}" for j in range(size)], dtype=object
    )
    up_sel = np.flatnonzero(upper_doc & (dls > 3))
    up_idx = starts[up_sel] + upper_pos[up_sel]
    words[up_idx] = np.char.upper(words[up_idx].astype(str)).astype(object)

    rows = []
    s, e = lo - base, hi - base
    for j in range(s, e):
        i = base + j
        text = " ".join(words[starts[j]:ends[j]].tolist())
        html = (
            b"<html><head><title>t" + str(i).encode() + b"</title></head><body>"
            + text.encode("utf-8")
            + b"</body></html>"
        )
        rows.append(
            (
                f"https://host{i % 97}.example.com/p/{i}",
                EPOCH + dt.timedelta(seconds=i * 37),
                html,
                text,
                _LANGS[i % len(_LANGS)],
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def make_pages_pdf(n: int, seed: int = 42, offset: int = 0) -> pd.DataFrame:
    """Generate rows [offset, offset+n) deterministically.

    Rows depend only on (seed, absolute row id) -- independent of how
    the row space is partitioned -- so Spark-parallel generation equals
    single-shot generation.
    """
    vocab = np.array(vocabulary(), dtype=object)
    probs = _zipf_probs(len(vocab))
    out = []
    pos = offset
    end = offset + n
    while pos < end:
        c = pos // CHUNK
        hi = min(end, (c + 1) * CHUNK)
        out.append(_make_chunk(c, pos, hi, seed, vocab, probs))
        pos = hi
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["url", "warc_ts", "html", "text", "lang"]
    )


def pages_df(spark: SparkSession, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Distributed deterministic corpus: each Spark task generates its
    own row range (no driver-side materialization, no collect)."""
    bounds = np.linspace(0, n, partitions + 1, dtype=np.int64)
    ranges = [(int(bounds[i]), int(bounds[i + 1])) for i in range(partitions)]
    rdf = spark.createDataFrame(ranges, "start long, stop long").repartition(partitions, "start")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start, stop in zip(b["start"], b["stop"]):
                if stop > start:
                    yield make_pages_pdf(int(stop - start), seed=seed, offset=int(start))

    return rdf.mapInPandas(gen, schema=PAGES_SCHEMA)


def extract_text_col(html_col) -> F.Column:
    """Extract body text from the html binary, byte-identically (the
    input_hint invariant). Native expressions only: decode + regex.

    Mirrors the reference's 'one shared extraction function' posture
    (ref siem/utils.py:207-289 is its closest text-extraction analog).
    """
    s = F.decode(html_col, "UTF-8")
    return F.regexp_extract(s, "(?s)<body>(.*)</body>", 1)


def extract_text_py(html: bytes) -> str:
    """Pure-Python twin of :func:`extract_text_col` (oracle)."""
    import re

    m = re.search(rb"<body>(.*)</body>", html, re.DOTALL)
    return m.group(1).decode("utf-8") if m else ""


def queries_pdf(n_queries: int = 100, seed: int = 7) -> pd.DataFrame:
    """Reference query set (FIXTURES.md section 2): 1-5 terms mixing
    hot/mid/rare vocabulary ranks, some absent terms, mixed case."""
    vocab = vocabulary()
    rng = np.random.default_rng(seed)
    qids, texts, ks = [], [], []
    tiers = [(0, 20), (20, 500), (500, 5000), (5000, len(vocab))]
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 6))
        terms = []
        for _ in range(n_terms):
            lo, hi = tiers[int(rng.integers(0, len(tiers)))]
            t = vocab[int(rng.integers(lo, hi))]
            if rng.random() < 0.1:
                t = t.upper()
            terms.append(t)
        if qid % 17 == 0:
            terms.append("zzz_absent_term")
        k = 10
        if qid % 23 == 0:
            k = 1
        elif qid % 29 == 0:
            k = 100
        qids.append(qid)
        texts.append(" ".join(terms))
        ks.append(k)
    return pd.DataFrame({"qid": qids, "query": texts, "k": ks})
