"""BPE tokenizer APPLY at corpus scale.

A training-data pipeline tokenizes every document with the model's
byte-pair-encoding tokenizer before packing — the tokenizer is trained
offline (tiny data), but the APPLY pass runs over the full corpus, so
it must be a distributed one-pass operator. This module implements the
standard BPE encode (Sennrich et al. 2016; the GPT-2 merge-rank
algorithm): pre-tokenize with the BPE-ish regex, split each pretoken
into symbols, then repeatedly merge the lowest-rank adjacent pair
until no ranked pair remains.

Spark shape: the merge table (pair -> rank, vocabulary-sized metadata)
broadcasts into ONE ``mapInPandas`` pass — the merge loop is
inherently sequential PER PRETOKEN, which is exactly the granularity
Arrow batches parallelize, so this is the legitimate pandas-UDF case
(the per-element loop cannot be expressed as native columns). Encoding
is deterministic: ranks break ties, then leftmost-first.

A tiny deterministic trainer (:func:`bpe_train`) exists for tests and
self-contained pipelines: greedy highest-count pair (ties by pair
lexicographic order), the textbook algorithm — at production scale you
train offline on a sample and ship the merges file.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import BPE_ISH_PATTERN

_PRE_RE = re.compile(BPE_ISH_PATTERN)

#: end-of-word marker (the Sennrich convention), so merges never
#: cross pretoken boundaries and "low" / "lower" share prefix pairs.
EOW = "</w>"


def _pretokens(text: str) -> list[str]:
    return _PRE_RE.findall(text.lower()) if text else []


def _symbols(pretok: str) -> tuple[str, ...]:
    return tuple(pretok[:-1]) + (pretok[-1] + EOW,)


def bpe_encode_word(pretok: str, ranks: dict) -> list[str]:
    """Encode ONE pretoken against the merge-rank table (GPT-2
    algorithm: repeatedly merge the best-ranked adjacent pair)."""
    syms = list(_symbols(pretok))
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best:best + 2] = [syms[best] + syms[best + 1]]
    return syms


def py_bpe_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python twin: full-document token stream."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out: list[str] = []
    for w in _pretokens(text):
        out.extend(bpe_encode_word(w, ranks))
    return out


def bpe_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Deterministic textbook trainer (tests / self-contained use):
    greedy highest-count adjacent pair, ties broken lexicographically.
    Train on a driver-side SAMPLE — the apply pass is the distributed
    part."""
    words = Counter()
    for t in texts:
        for w in _pretokens(t):
            words[_symbols(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        top = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(top)
        merged = top[0] + top[1]
        new_words: Counter = Counter()
        for syms, cnt in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == top):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Distributed apply: ``(id, tokens array<string>, n_tokens)`` in
    ONE ``mapInPandas`` pass with the merge-rank table broadcast via
    closure (vocabulary-sized metadata; a GPT-2-class tokenizer is
    ~50k merges — a few MB per executor)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    src = docs.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("_t"))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            toks = []
            for t in b["_t"]:
                out: list[str] = []
                for w in _pretokens(t or ""):
                    out.extend(bpe_encode_word(w, ranks))
                toks.append(out)
            yield pd.DataFrame({
                "id": b["id"],
                "tokens": toks,
                "n_tokens": [len(x) for x in toks],
            })

    return src.mapInPandas(
        enc, schema="id long, tokens array<string>, n_tokens long")
