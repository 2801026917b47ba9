"""Search-as-you-type index acceleration: the mapping's
``index_prefixes`` / ``search_as_you_type`` field option.

Reference surface: OpenSearch's ``search_as_you_type`` field type and
the ``index_prefixes`` option on text fields — Lucene indexes each
term's edge n-grams (``s``, ``se``, ``sea``, …, capped at
``max_chars``) into a hidden ``._index_prefix`` subfield, so a
prefix/``match_phrase_prefix``/``match_bool_prefix`` query matches an
INDEXED TERM by equality instead of enumerating the vocabulary. The
classic space-for-speed inverted-index trade.

Spark restatement: a (prefix, term) dictionary table derived from
``term_stats`` in one pass — vocabulary-sized × ≤max_gram rows, still
metadata next to the postings — persisted SORTED BY PREFIX. A prefix
query's vocabulary rewrite then plans as ``prefix = 'sea'`` — an
EqualTo pushed into the parquet scan (row-group min/max + dictionary
skipping on the sorted layout) — where the un-accelerated path LIKE-
scans every term_stats row. Prefixes LONGER than ``max_gram`` use the
equality on the first ``max_gram`` chars plus a residual LIKE refine
over the handful of surviving rows (exactly Lucene's
``_index_prefix`` + filter behavior past ``max_chars``).

Results are pinned IDENTICAL to the un-accelerated vocabulary-first
rewrite (`querystring._const_leaf_rows`); only the physical plan
changes. The hook is `querystring._prefix_vocab_terms`, used by every
surface that compiles a prefix leaf (query_string, the `_search` body
compiler's prefix / match_phrase_prefix / match_bool_prefix, msearch,
suggesters).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex

__all__ = ["build_prefix_vocab", "add_index_prefixes"]

DEFAULT_MAX_GRAM = 12


def build_prefix_vocab(ix: PostingsIndex,
                       max_gram: int = DEFAULT_MAX_GRAM) -> DataFrame:
    """(prefix, term) edge-ngram dictionary from ``term_stats`` — one
    narrow projection + explode, no postings touched. A term shorter
    than ``max_gram`` contributes exactly ``len(term)`` rows."""
    if max_gram < 1:
        raise ValueError("max_gram must be >= 1")
    return ix.term_stats.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, least(length(term), "
                f"{int(max_gram)})), i -> substr(term, 1, i))"
            )
        ).alias("prefix"),
        F.col("term"),
    )


def add_index_prefixes(spark: SparkSession, path: str,
                       max_gram: int = DEFAULT_MAX_GRAM) -> PostingsIndex:
    """Build + persist the prefix dictionary for a SAVED index (the
    ``PUT mapping index_prefixes`` analog) and return the reloaded
    handle with acceleration active. Layout: ``{path}/prefix_vocab``
    parquet sorted by prefix (row-group pruning on the equality), plus
    a tiny ``prefix_meta.json`` carrying ``max_gram``."""
    ix = PostingsIndex.load(spark, path)
    pv = build_prefix_vocab(ix, max_gram=max_gram)
    (
        # range-partition + sort: globally prefix-ordered files, so
        # the equality lookup prunes to one row group in one file
        pv.repartitionByRange("prefix")
        .sortWithinPartitions("prefix", "term")
        .write.mode("overwrite")
        .parquet(f"{path}/prefix_vocab")
    )
    with open(os.path.join(path, "prefix_meta.json"), "w") as f:
        json.dump({"max_gram": int(max_gram)}, f)
    return PostingsIndex.load(spark, path)
