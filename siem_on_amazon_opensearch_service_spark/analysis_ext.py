"""Analyzer-chain extensions: stopword filter, synonym filter, and a
minimal English stemmer — the commonly-configured OpenSearch analysis
filters beyond the standard tokenizer (``stop``, ``synonym``,
``stemmer: minimal_english``).

The shared core analyzer (analysis.py) stays THE one definition used
by the index and every oracle; these filters compose AFTER it, as in
Lucene's token-filter chain. All three are native Column expressions
(filter / transform / regexp chains — whole-stage codegen, no
Python), each with a pure-Python twin for oracles and a DuckDB twin
for the driver gate.

Composition with the index: an analyzed field is materialized by
re-joining the filtered token stream with spaces
(:func:`analyzed_text`) and feeding it to the standard build —
because tokens contain no separator characters, re-tokenizing the
joined string reproduces the filtered stream exactly, so BM25 over
the analyzed field needs no index-side changes (pinned by tests).

Stemmer scope: the Harman "S-stemmer" (suffix rules sses→ss, ies→y
(len>4), trailing s dropped unless the word ends in ss/us/is or is
too short) — the ``minimal_english`` family, deliberately NOT a full
Porter (whose measure conditions don't codegen as a regexp chain);
the point is parity of the FILTER-CHAIN mechanics with a
deterministic cross-engine rule set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analysis import tokens_col


# ---------------------------------------------------------------------------
# stopword filter
# ---------------------------------------------------------------------------

#: Lucene's classic English stopword set (StandardAnalyzer/
#: EnglishAnalyzer default, public constant).
ENGLISH_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on "
    "or such that the their then there these they this to was will with"
).split()


def stop_filter(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """Drop stopwords from a token array (native ``filter``; the
    stopword set folds into the expression as a literal array —
    query/config metadata, never a join)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def py_stop_filter(tokens: list[str],
                   stopwords: list[str] | None = None) -> list[str]:
    sw = set(stopwords or ENGLISH_STOPWORDS)
    return [t for t in tokens if t not in sw]


def duckdb_stop_sql(arr_expr: str,
                    stopwords: list[str] | None = None) -> str:
    sw = ", ".join(f"'{w}'" for w in (stopwords or ENGLISH_STOPWORDS))
    return f"list_filter({arr_expr}, t -> NOT list_contains([{sw}], t))"


# ---------------------------------------------------------------------------
# synonym filter
# ---------------------------------------------------------------------------

def synonym_filter(tokens: Column, mapping: dict[str, str]) -> Column:
    """Map each token through a synonym table (the ``synonym`` filter
    in its contraction form: variants rewrite to one canonical term —
    how search-time synonym normalization is usually configured).
    The mapping folds into a literal map expression."""
    if not mapping:
        return tokens
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.transform(tokens, lambda t: F.coalesce(m[t], t))


def py_synonym_filter(tokens: list[str], mapping: dict[str, str]) -> list[str]:
    return [mapping.get(t, t) for t in tokens]


def duckdb_synonym_sql(arr_expr: str, mapping: dict[str, str]) -> str:
    if not mapping:
        return arr_expr
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return (
        f"list_transform({arr_expr}, t -> CASE t {whens} ELSE t END)"
    )


# ---------------------------------------------------------------------------
# minimal English stemmer (S-stemmer)
# ---------------------------------------------------------------------------

def s_stem(token: Column) -> Column:
    """Harman S-stemmer as a native conditional chain:

    1. ``...sses`` -> ``...ss``
    2. ``...ies``  -> ``...y``   (only when length > 4)
    3. ``...s``    -> drop, unless the word ends in ``ss``/``us``/
       ``is`` or has length <= 2.
    """
    t = token
    return (
        F.when(t.endswith("sses"),
               F.concat(F.substring(t, 1, F.length(t) - 4), F.lit("ss")))
        .when(t.endswith("ies") & (F.length(t) > 4),
              F.concat(F.substring(t, 1, F.length(t) - 3), F.lit("y")))
        .when(
            t.endswith("s") & ~t.endswith("ss") & ~t.endswith("us")
            & ~t.endswith("is") & (F.length(t) > 2),
            F.substring(t, 1, F.length(t) - 1),
        )
        .otherwise(t)
    )


def py_s_stem(token: str) -> str:
    if token.endswith("sses"):
        return token[:-4] + "ss"
    if token.endswith("ies") and len(token) > 4:
        return token[:-3] + "y"
    if (token.endswith("s") and not token.endswith(("ss", "us", "is"))
            and len(token) > 2):
        return token[:-1]
    return token


def duckdb_s_stem_sql(t: str) -> str:
    return (
        f"CASE WHEN {t} LIKE '%sses' THEN substr({t}, 1, len({t})-4) || 'ss' "
        f"WHEN {t} LIKE '%ies' AND len({t}) > 4 "
        f"THEN substr({t}, 1, len({t})-3) || 'y' "
        f"WHEN {t} LIKE '%s' AND {t} NOT LIKE '%ss' AND {t} NOT LIKE '%us' "
        f"AND {t} NOT LIKE '%is' AND len({t}) > 2 "
        f"THEN substr({t}, 1, len({t})-1) "
        f"ELSE {t} END"
    )


# ---------------------------------------------------------------------------
# chain + analyzed-field materialization
# ---------------------------------------------------------------------------

def analyzed_tokens(text: Column | str,
                    stopwords: list[str] | None = None,
                    synonyms: dict[str, str] | None = None,
                    stem: bool = False) -> Column:
    """Full chain: standard tokenize -> stop -> synonym -> stem.
    Filter order matches the Lucene convention (stop before synonym
    before stemmer when all are configured)."""
    toks = tokens_col(text)
    if stopwords is not None:
        toks = stop_filter(toks, stopwords)
    if synonyms:
        toks = synonym_filter(toks, synonyms)
    if stem:
        toks = F.transform(toks, s_stem)
    return toks


def py_analyzed_tokens(text: str,
                       stopwords: list[str] | None = None,
                       synonyms: dict[str, str] | None = None,
                       stem: bool = False) -> list[str]:
    from .analysis import tokenize_py

    toks = tokenize_py(text)
    if stopwords is not None:
        toks = py_stop_filter(toks, stopwords)
    if synonyms:
        toks = py_synonym_filter(toks, synonyms)
    if stem:
        toks = [py_s_stem(t) for t in toks]
    return toks


def analyzed_text(text: Column | str,
                  stopwords: list[str] | None = None,
                  synonyms: dict[str, str] | None = None,
                  stem: bool = False) -> Column:
    """Space-joined analyzed token stream — feed this to the standard
    index build to get an analyzed FIELD without index-side changes
    (re-tokenizing reproduces the stream exactly: tokens contain no
    separators)."""
    return F.array_join(
        analyzed_tokens(text, stopwords, synonyms, stem), " ")


# ---------------------------------------------------------------------------
# _analyze API
# ---------------------------------------------------------------------------

def analyze_text(text: str,
                 stopwords: list[str] | None = None,
                 synonyms: dict[str, str] | None = None,
                 stem: bool = False) -> list[dict]:
    """``POST /_analyze``: the token stream the engine would index for
    ``text``, with offsets and positions — the debugging endpoint the
    dashboards' Dev Tools exposes.  Pure driver-side work (the API
    analyzes ONE string; the distributed twin is ``analyzed_tokens``).

    ``start_offset``/``end_offset`` index into the lowercased input
    (identical to the raw input for ASCII); ``position`` is the index
    in the post-filter stream — contiguous across removed stopwords,
    matching the engine's positional index (which builds positions
    from the filtered stream, not Lucene's gap-preserving increments).
    """
    import re as _re

    from .analysis import TOKEN_SPLIT_PATTERN

    token_re = _re.compile(TOKEN_SPLIT_PATTERN.replace("[^", "[", 1))
    out = []
    pos = 0
    stopset = set(stopwords or [])
    for m in token_re.finditer((text or "").lower()):
        tok = m.group(0)
        if tok in stopset:
            continue
        if synonyms:
            tok = synonyms.get(tok, tok)
        if stem:
            tok = py_s_stem(tok)
        out.append({"token": tok, "start_offset": m.start(),
                    "end_offset": m.end(), "position": pos,
                    "type": "<ALPHANUM>"})
        pos += 1
    return out


# ---------------------------------------------------------------------------
# CJK bigram tokenizer (the OpenSearch ``cjk`` analyzer family)
# ---------------------------------------------------------------------------

#: Han + Hiragana + Katakana (the scripts CJKBigramFilter bigrams by
#: default). One combined class: mixed-script bigrams form across
#: adjacent CJK characters, as in Lucene's default (no ignored_scripts).
CJK_CLASS = "一-鿿぀-ゟ゠-ヿ"
_CJK_RUNS = f"([a-z0-9]+|[{CJK_CLASS}]+)"


def cjk_tokens_col(col: Column | str) -> Column:
    """Tokenizer VARIANT (not a post-filter): latin/digit runs tokenize
    as in the core analyzer; runs of CJK characters emit overlapping
    character bigrams (a lone CJK char emits as a unigram) — Lucene's
    CJKAnalyzer / ``cjk_bigram`` behavior, the analyzer the reference's
    Japanese deployments configure for message fields.

    Plug into the index via ``build_index(..., tokenizer=
    cjk_tokens_col)`` and query via the matching ``py_cjk_tokens``.
    Native expressions only (regexp_extract_all / transform / substr /
    flatten) — whole-stage codegen, no Python in the scan."""
    c = F.col(col) if isinstance(col, str) else col
    runs = F.regexp_extract_all(F.lower(c), F.lit(_CJK_RUNS), 1)

    def expand(r: Column) -> Column:
        bigrams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(r) - 1, F.lit(1))),
            lambda i: r.substr(i, F.lit(2)),
        )
        return F.when(r.rlike("^[a-z0-9]"), F.array(r)).otherwise(bigrams)

    return F.flatten(F.transform(runs, expand))


def py_cjk_tokens(text: str) -> list[str]:
    """Pure-Python twin (oracle + query-string path)."""
    import re as _re

    if not text:
        return []
    out: list[str] = []
    for r in _re.findall(_CJK_RUNS, text.lower()):
        if _re.match("^[a-z0-9]", r):
            out.append(r)
        elif len(r) == 1:
            out.append(r)
        else:
            out.extend(r[i:i + 2] for i in range(len(r) - 1))
    return out


def duckdb_cjk_sql(expr: str) -> str:
    """DuckDB twin producing the identical token array."""
    return (
        f"flatten(list_transform("
        f"regexp_extract_all(lower({expr}), '{_CJK_RUNS}', 1), "
        f"r -> CASE WHEN regexp_matches(r, '^[a-z0-9]') THEN [r] "
        f"ELSE list_transform("
        f"range(1, greatest(length(r) - 1, 1) + 1), "
        f"i -> substring(r, i::INT, 2)) END))"
    )
