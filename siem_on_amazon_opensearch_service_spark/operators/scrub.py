"""Corpus scrubbing operators for web-scale training-data curation:
PII redaction, URL canonicalization, and corpus-frequency boilerplate
line removal (the CCNet-style paragraph/line dedup pass).

Everything is native column expressions (whole-stage codegen) except
the boilerplate pass, which needs one corpus-level aggregate — a
single hash-aggregate over *line digests* (32 bytes/line shuffled,
never the text) followed by one shuffle join back to the exploded
lines. No Python UDFs anywhere.

Scale design (100 TB posture):

* PII redaction is a pure map-side regexp_replace chain — zero
  shuffle, fully pushdown-compatible (the scan still prunes columns).
* URL canonicalization is per-row string/array algebra (split →
  filter tracking params → sort → join) — map-side only, and the
  canonical form is exactly what a URL-level exact-dedup groupBy
  wants as its key.
* Boilerplate removal shuffles (line_hash) once for the document
  frequency count and once for the order-preserving reassembly
  (doc_id). Line df is Zipf-skewed (empty/boilerplate lines are the
  head) — the df aggregate is map-side combinable so the skew hits
  the combiner, not the shuffle; the reassembly key (doc_id) is
  uniform by construction.

Cross-engine determinism: the redaction regexes avoid lookaround and
stick to character classes valid in both Java regex (Spark) and RE2
(DuckDB); hashes are md5 over explicit strings.

Reference analog: the SIEM loader scrubs/renames fields per log type
(siem/index.py transform chain) but has no corpus-level text hygiene;
these operators are the training-pipeline generalization (CCNet:
Wenzek et al., "CCNet: Extracting high quality monolingual datasets
from web crawl data", LREC 2020).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: pattern -> replacement token, applied in order. Order matters:
#: emails go first so their host part can't be half-eaten by the IP
#: pass; IPs before phones so dotted quads never match phone digits.
PII_RULES: list[tuple[str, str]] = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``text_redacted`` plus per-rule hit counts
    (``n_email/n_ip/n_phone``). Map-side only."""
    out = df
    redacted = F.col(text_col)
    names = ["n_email", "n_ip", "n_phone"]
    for (pat, repl), name in zip(PII_RULES, names):
        out = out.withColumn(
            name, F.regexp_count(redacted, F.lit(pat)).cast("long")
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.withColumn("text_redacted", redacted)


def duckdb_redact_sql(text_expr: str) -> tuple[str, list[str]]:
    """(redacted_expr, [count_exprs...]) DuckDB twin of redact_pii.

    Counts are taken against the same progressively-redacted string
    the Spark side uses, so rule order has identical semantics."""
    counts = []
    cur = text_expr
    for pat, repl in PII_RULES:
        counts.append(
            f"len(regexp_extract_all({cur}, '{pat}'))::BIGINT"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return cur, counts


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

#: query parameters dropped during canonicalization (tracking junk).
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref")


def canonical_url(url_col) -> Column:
    """Canonical form of a URL column (native expressions only):

    * scheme + host lowercased, leading ``www.`` stripped
    * default ports stripped (``:80`` http, ``:443`` https)
    * fragment dropped
    * tracking params (utm_*, fbclid, gclid, msclkid, ref) dropped
    * surviving query params sorted bytewise
    * trailing ``/`` on a bare path stripped

    The result is the natural key for URL-level exact dedup."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host_port = F.lower(F.regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    host_port = F.regexp_replace(host_port, "^www\\.", "")
    host_port = F.when(
        (scheme == "https"), F.regexp_replace(host_port, ":443$", "")
    ).otherwise(host_port)
    host_port = F.when(
        (scheme == "http"), F.regexp_replace(host_port, ":80$", "")
    ).otherwise(host_port)
    path = F.regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    qs = F.regexp_extract(u, "\\?([^#]*)", 1)
    parts = F.split(qs, "&")

    def _keep(x: Column) -> Column:
        cond = x != ""
        for p in TRACKING_PREFIXES:
            cond = cond & ~x.startswith(p)
        for e in TRACKING_EXACT:
            cond = cond & ~x.startswith(e + "=") & (x != e)
        return cond

    kept = F.filter(parts, _keep)
    query = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme, F.lit("://"), host_port, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def duckdb_canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of canonical_url (list_filter / list_sort)."""
    # DuckDB regexp_extract yields NULL (not '') on no-match; coalesce
    # every component so the final concat never nulls out.
    scheme = (f"lower(coalesce(regexp_extract({url_expr}, "
              f"'^([A-Za-z][A-Za-z0-9+.-]*)://', 1), ''))")
    hp = (f"lower(coalesce(regexp_extract({url_expr}, "
          f"'^[^:/?#]+://([^/?#]*)', 1), ''))")
    hp = f"regexp_replace({hp}, '^www\\.', '')"
    hp = (f"CASE WHEN {scheme} = 'https' THEN regexp_replace({hp}, ':443$', '') "
          f"WHEN {scheme} = 'http' THEN regexp_replace({hp}, ':80$', '') "
          f"ELSE {hp} END")
    path = (f"coalesce(regexp_extract({url_expr}, "
            f"'^[^:/?#]+://[^/?#]*([^?#]*)', 1), '')")
    path = f"regexp_replace({path}, '/+$', '')"
    qs = f"coalesce(regexp_extract({url_expr}, '\\?([^#]*)', 1), '')"
    conds = ["x <> ''"]
    for p in TRACKING_PREFIXES:
        conds.append(f"NOT starts_with(x, '{p}')")
    for e in TRACKING_EXACT:
        conds.append(f"NOT starts_with(x, '{e}=')")
        conds.append(f"x <> '{e}'")
    keep = " AND ".join(conds)
    kept = f"list_filter(string_split({qs}, '&'), x -> {keep})"
    # list_sort/array_to_string of an empty list yields NULL in DuckDB
    query = f"coalesce(array_to_string(list_sort({kept}), '&'), '')"
    return (f"{scheme} || '://' || {hp} || {path} || "
            f"(CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)")


# ---------------------------------------------------------------------------
# boilerplate line removal (corpus-frequency filter)
# ---------------------------------------------------------------------------

def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 0.3,
) -> DataFrame:
    """Drop every line that occurs in more than ``max_df_ratio`` of
    documents (CCNet-style boilerplate removal), preserving the
    original line order of what survives.

    Returns (id_col, n_lines, n_kept, text_clean). Docs whose lines
    are ALL boilerplate are retained with n_kept=0 and empty text.

    Plan: posexplode (narrow) → line-df hash aggregate (map-side
    combinable; shuffles md5 digests only) → shuffle join back on the
    digest → order-restoring groupBy(doc_id). Two shuffles total,
    both on keys with bounded skew (see module docstring)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    n_docs = df.select(
        F.count("*").cast("double").alias("_n_docs")
    )
    line_df = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("line_docs"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("line_docs") > F.col("_n_docs") * max_df_ratio)
        .select("lh")
    )
    kept = lines.join(line_df, "lh", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return (
        totals.join(agg, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def duckdb_strip_boilerplate_sql(
    docs_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    max_df_ratio: float = 0.3,
) -> str:
    """DuckDB twin of strip_boilerplate. ``docs_sql`` is a relation
    SQL producing (doc_id, text)."""
    return f"""
    WITH _docs AS ({docs_sql}),
    _lx AS (
      SELECT {id_expr} AS doc_id, string_split({text_expr}, chr(10)) AS ls
      FROM _docs
    ),
    _ln AS (
      SELECT doc_id, unnest(ls) AS line,
             generate_subscripts(ls, 1) AS pos
      FROM _lx
    ),
    _tot AS (SELECT count(*)::DOUBLE AS n FROM _docs),
    _boiler AS (
      SELECT md5(line) AS lh FROM _ln, _tot
      GROUP BY md5(line), _tot.n
      HAVING count(DISTINCT doc_id) > _tot.n * {max_df_ratio}
    ),
    _kept AS (
      SELECT doc_id, pos, line FROM _ln
      WHERE md5(line) NOT IN (SELECT lh FROM _boiler)
    ),
    _agg AS (
      SELECT doc_id, count(*)::BIGINT AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS text_clean
      FROM _kept GROUP BY doc_id
    )
    SELECT l.doc_id, len(l.ls)::BIGINT AS n_lines,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept,
           coalesce(a.text_clean, '') AS text_clean
    FROM _lx l LEFT JOIN _agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# per-domain quotas (C4 / RefinedWeb-style host caps)
# ---------------------------------------------------------------------------

def url_host(url_col) -> Column:
    """Lowercased host (port and leading ``www.`` stripped) — the
    domain-quota key. Pure regexp, codegen."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    return F.regexp_replace(host, "^www\\.", "")


def duckdb_url_host_sql(url_expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(lower(coalesce(regexp_extract("
        f"{url_expr}, '^[^:/?#]+://([^/?#]*)', 1), ''))"
        ", ':[0-9]+$', ''), '^www\\.', '')"
    )


def cap_per_domain(docs: DataFrame, max_per_domain: int,
                   url_col: str = "url",
                   order_col: str | None = None) -> DataFrame:
    """Keep at most ``max_per_domain`` docs per host — the domain
    quota every web-corpus recipe applies so mega-hosts can't dominate
    the training mix (C4 keeps per-domain caps; RefinedWeb documents
    the same step). Survivors are the FIRST ``max_per_domain`` by
    ``order_col`` (default: the url itself — deterministic without
    any quality model; pass a quality score to keep the best instead).

    Plan: one window partitioned by host (shuffle keyed by host,
    row_number rank, filter) — group size is per-host traffic; a
    pathological mega-host is one hot partition, which is exactly the
    salting discussion in `index/build.py` (quotas are usually applied
    AFTER per-host sampling at 100 TB, where the window input is
    already bounded)."""
    from pyspark.sql import Window

    order = F.col(order_col) if order_col else F.col(url_col)
    w = (Window.partitionBy(url_host(url_col))
         .orderBy(order.asc(), F.col(url_col).asc()))
    return (docs.withColumn("_dr", F.row_number().over(w))
            .filter(F.col("_dr") <= int(max_per_domain)).drop("_dr"))


def domain_stats(docs: DataFrame, url_col: str = "url",
                 top_n: int = 20) -> DataFrame:
    """Per-host doc counts, top-N — the quota-tuning report."""
    return (docs.groupBy(url_host(url_col).alias("host"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("host"))
            .limit(top_n))
