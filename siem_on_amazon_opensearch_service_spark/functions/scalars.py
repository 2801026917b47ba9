"""Scalar function library — the reference's F-series utilities
(SURVEY.md section 2.8) re-expressed as native Spark column
expressions (no Python in the hot path), each with a DuckDB-twin SQL
generator where the correctness gate needs one.

Reference citations:
  epoch auto-ranging      siem/utils.py:349-378
  url request-line split  siem/utils.py:207-289
  ip validation           siem/utils.py:195-204
  xff parsing             siem/utils.py:292-302 + siem/xff.py:174-218
  protocol number -> name sf_vpcflowlogs.py:24-42
  http status -> outcome  sf_apache_access.py:61-71
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# timestamps (F2/F13): epoch auto-ranging s / ms / us
# ---------------------------------------------------------------------------

#: boundaries: >= 1e15 -> microseconds, >= 1e12 -> milliseconds, else
#: seconds (the reference's digit-count ranging, siem/utils.py:349-366).
EPOCH_US = 1_000_000_000_000_000
EPOCH_MS = 1_000_000_000_000


def epoch_auto_ts(col: str | Column) -> Column:
    """Epoch number of unknown unit -> timestamp (UTC)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    secs = (
        F.when(c >= EPOCH_US, c / 1e6)
        .when(c >= EPOCH_MS, c / 1e3)
        .otherwise(c)
    )
    return F.timestamp_seconds(secs)


def duckdb_epoch_auto_sql(expr: str) -> str:
    return (
        f"to_timestamp(CASE WHEN {expr} >= {EPOCH_US} THEN {expr} / 1e6 "
        f"WHEN {expr} >= {EPOCH_MS} THEN {expr} / 1e3 "
        f"ELSE {expr}::DOUBLE END)"
    )


# ---------------------------------------------------------------------------
# URL fields (F3): request-target -> url.* (double-decode, split order
# mirrors the reference exactly: decode twice, then split fragment,
# query, path, extension)
# ---------------------------------------------------------------------------

_URL_RE = r"^(?:([a-z][a-z0-9+.-]*):\/\/)?([^\/:?#]*)(?::([0-9]+))?([^?#]*)?(?:\?([^#]*))?(?:#(.*))?$"


def url_fields(col: str | Column) -> dict[str, Column]:
    """scheme/domain/port/path/query/fragment/extension columns from a
    URL string. Pure regex (same pattern string runs in DuckDB), with
    the reference's double URL-decode applied to path."""
    c = F.col(col) if isinstance(col, str) else col

    def grp(i: int) -> Column:
        return F.regexp_extract(c, _URL_RE, i)

    path = F.url_decode(F.url_decode(grp(4)))
    ext = F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1)
    return {
        "scheme": grp(1),
        "domain": grp(2),
        "port": grp(3),
        "path": path,
        "query": grp(5),
        "fragment": grp(6),
        "extension": ext,
    }


def duckdb_url_sql(expr: str) -> dict[str, str]:
    def grp(i: int) -> str:
        return f"coalesce(regexp_extract({expr}, '{_URL_RE}', {i}), '')"

    # DuckDB (this build) has no url_decode; emulate one decode round
    # for the escape subset the oracle inputs use (%20, %25 — order
    # matters: %20 first so %2520 -> %20 -> ' ' across two rounds).
    # Full percent-decoding parity vs Python urllib is covered by
    # pytest (tests/test_sources_functions.py), not the SQL oracle.
    def dec(s: str) -> str:
        return f"replace(replace({s}, '%20', ' '), '%25', '%')"

    path = dec(dec(grp(4)))
    return {
        "scheme": grp(1),
        "domain": grp(2),
        "port": grp(3),
        "path": path,
        "query": grp(5),
        "fragment": grp(6),
        "extension": f"coalesce(regexp_extract({path}, '\\.([A-Za-z0-9]+)$', 1), '')",
    }


# ---------------------------------------------------------------------------
# IP helpers (F5 + `ip` type semantics)
# ---------------------------------------------------------------------------

_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
)


def is_ipv4(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_IPV4_RE)


def ipv4_to_long(col: str | Column) -> Column:
    """Dotted quad -> uint32 as long (the `ip`-typed column encoding
    used by the range-join dimension tables, ref ioc.py:167-230)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.split(c, r"\.")
    return (
        F.element_at(p, 1).cast("long") * 16777216
        + F.element_at(p, 2).cast("long") * 65536
        + F.element_at(p, 3).cast("long") * 256
        + F.element_at(p, 4).cast("long")
    )


def long_to_ipv4(col: str | Column) -> Column:
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c % 256,
    )


# ---------------------------------------------------------------------------
# XFF client-ip selection (F4 + J4, simplified trusted-prefix form)
# ---------------------------------------------------------------------------

def xff_client_ip(xff_col: str | Column, trusted_prefixes: list[str]) -> Column:
    """Rightmost-untrusted selection: split the X-Forwarded-For list,
    keep valid IPv4s, scan right-to-left, first IP not matching any
    trusted prefix wins (ref siem/xff.py:174-218's semantics with
    prefix-trust instead of the sqlite range table)."""
    c = F.col(xff_col) if isinstance(xff_col, str) else xff_col
    ips = F.filter(
        F.transform(F.split(c, ","), lambda s: F.trim(s)),
        lambda s: s.rlike(_IPV4_RE),
    )
    def untrusted(ip: Column) -> Column:
        cond = F.lit(True)
        for p in trusted_prefixes:
            cond = cond & ~ip.startswith(p)
        return cond

    cand = F.filter(F.reverse(ips), untrusted)
    return F.when(F.size(cand) > 0, F.element_at(cand, 1)).otherwise(
        F.when(F.size(ips) > 0, F.element_at(ips, 1))
    )


# ---------------------------------------------------------------------------
# protocol / outcome maps (F10, F11)
# ---------------------------------------------------------------------------

PROTOCOLS = {1: "icmp", 6: "tcp", 17: "udp", 41: "ipv6", 47: "gre", 50: "esp",
             58: "ipv6-icmp", 132: "sctp"}


def protocol_name(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = F.create_map(
        *[F.lit(x) for kv in PROTOCOLS.items() for x in kv]
    )
    return F.coalesce(m[c.cast("int")], c.cast("string"))


def duckdb_protocol_sql(expr: str) -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in PROTOCOLS.items())
    return f"(CASE {expr}::INT {whens} ELSE {expr}::VARCHAR END)"


# ---------------------------------------------------------------------------
# J6: user-agent parsing (reference siem/user_agent.py:22-54 wraps the
# ua_parser regex cascade; restated as a native first-match regex
# cascade for the dominant families — extensible the same way the
# ua_parser corpus is, one (pattern, family) row at a time)
# ---------------------------------------------------------------------------

UA_RULES: list[tuple[str, str]] = [
    # (regex with version group, family) — order matters: first match
    # wins, so more specific families come first (Edge/Chrome both
    # carry "Chrome/", bots before browsers).
    (r"(?:Googlebot|bingbot|DuckDuckBot|Baiduspider)/?([0-9.]*)", "Bot"),
    (r"curl/([0-9.]+)", "curl"),
    (r"Edg(?:e|A|iOS)?/([0-9.]+)", "Edge"),
    (r"OPR/([0-9.]+)", "Opera"),
    (r"Chrome/([0-9.]+)", "Chrome"),
    (r"Version/([0-9.]+).*Safari", "Safari"),
    (r"Firefox/([0-9.]+)", "Firefox"),
    (r"MSIE ([0-9.]+)", "IE"),
]


def ua_fields(col: str | Column) -> dict[str, Column]:
    """(browser family, version, os) from a User-Agent string.

    Native expression cascade (first matching rule wins), no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    family: Column = F.lit("Other")
    version: Column = F.lit("")
    for pattern, fam in reversed(UA_RULES):
        hit = c.rlike(pattern)
        family = F.when(hit, F.lit(fam)).otherwise(family)
        version = F.when(hit, F.regexp_extract(c, pattern, 1)).otherwise(version)
    os_col = (
        F.when(c.rlike(r"Windows NT"), "Windows")
        .when(c.rlike(r"Android"), "Android")
        .when(c.rlike(r"iPhone|iPad|iOS"), "iOS")
        .when(c.rlike(r"Mac OS X|Macintosh"), "macOS")
        .when(c.rlike(r"Linux"), "Linux")
        .otherwise("Other")
    )
    return {"ua_family": family, "ua_version": version, "ua_os": os_col}


def duckdb_ua_sql(expr: str) -> dict[str, str]:
    fam = "'Other'"
    ver = "''"
    for pattern, f_ in reversed(UA_RULES):
        p = pattern.replace("'", "''")
        fam = f"(CASE WHEN regexp_matches({expr}, '{p}') THEN '{f_}' ELSE {fam} END)"
        ver = (
            f"(CASE WHEN regexp_matches({expr}, '{p}') THEN "
            f"coalesce(regexp_extract({expr}, '{p}', 1), '') ELSE {ver} END)"
        )
    os_sql = (
        f"(CASE WHEN regexp_matches({expr}, 'Windows NT') THEN 'Windows' "
        f"WHEN regexp_matches({expr}, 'Android') THEN 'Android' "
        f"WHEN regexp_matches({expr}, 'iPhone|iPad|iOS') THEN 'iOS' "
        f"WHEN regexp_matches({expr}, 'Mac OS X|Macintosh') THEN 'macOS' "
        f"WHEN regexp_matches({expr}, 'Linux') THEN 'Linux' "
        f"ELSE 'Other' END)"
    )
    return {"ua_family": fam, "ua_version": ver, "ua_os": os_sql}


def http_outcome(status_col: str | Column) -> Column:
    """HTTP status -> ECS event.outcome (ref sf_apache_access.py:61-71)."""
    c = (F.col(status_col) if isinstance(status_col, str) else status_col).cast("int")
    return (
        F.when(c < 400, "success")
        .when(c >= 400, "failure")
        .otherwise("unknown")
    )
