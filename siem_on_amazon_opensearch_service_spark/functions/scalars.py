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
    # try_cast: a non-numeric epoch field ('-', '', garbage) must
    # yield NULL, not an ANSI CAST_INVALID_INPUT that kills the job —
    # the reference's log-and-drop contract for malformed input
    raw = F.col(col) if isinstance(col, str) else col
    c = raw.cast("string").try_cast("double")
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
# timestamps (F2, full dispatcher breadth; ref siem/utils.py:308-443)
# ---------------------------------------------------------------------------


def syslog_ts(col: str | Column, now_utc: str) -> Column:
    """Syslog timestamp ('MMM d HH:mm:ss', no year) with the
    reference's year inference (siem/utils.py:381-413): assume the
    current year; a result in the future means the log rolled over a
    year boundary, so subtract one year. ``now_utc`` is an explicit
    'YYYY-MM-DD HH:MM:SS' reference instant (deterministic -- the
    caller supplies "now")."""
    c = F.col(col) if isinstance(col, str) else col
    now = F.lit(now_utc).cast("timestamp")
    year = F.date_format(now, "yyyy")
    # normalize the syslog double-space day padding ('Jan  3') first.
    norm = F.regexp_replace(c, r"\s+", " ")
    # try_to_timestamp: garbage lines — and well-formed 'Feb 29'
    # lines whenever the inferred year is not a leap year — must
    # parse to NULL, never throw under ANSI
    parsed = F.try_to_timestamp(
        F.concat(year, F.lit(" "), norm), F.lit("yyyy MMM d HH:mm:ss")
    )
    return F.when(parsed > now, parsed - F.expr("INTERVAL 1 YEAR")).otherwise(
        parsed
    )


def duckdb_syslog_sql(expr: str, now_utc: str) -> str:
    parsed = (
        f"strptime(strftime(TIMESTAMP '{now_utc}', '%Y') || ' ' || "
        f"regexp_replace({expr}, '\\s+', ' ', 'g'), '%Y %b %-d %H:%M:%S')"
    )
    return (
        f"(CASE WHEN {parsed} > TIMESTAMP '{now_utc}' "
        f"THEN {parsed} - INTERVAL 1 YEAR ELSE {parsed} END)"
    )


#: (spark format, duckdb format) pairs tried in order by the
#: format-list dispatcher -- the reference's per-logtype strptime
#: lists (siem/utils.py:415-443) collapse to a coalesce over formats.
TS_FORMATS: list[tuple[str, str]] = [
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy/MM/dd HH:mm:ss", "%Y/%m/%d %H:%M:%S"),
    ("dd/MMM/yyyy:HH:mm:ss", "%d/%b/%Y:%H:%M:%S"),
    ("MM-dd-yyyy HH:mm:ss", "%m-%d-%Y %H:%M:%S"),
]


def ts_from_formats(col: str | Column,
                    formats: list[tuple[str, str]] = TS_FORMATS) -> Column:
    """First-successful-format parse: coalesce of try_to_timestamp over
    the format list (NULL when none match -- the reference logs and
    drops those rows)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(sf)) for sf, _ in formats]
    )


def duckdb_ts_formats_sql(expr: str,
                          formats: list[tuple[str, str]] = TS_FORMATS) -> str:
    tries = ", ".join(f"try_strptime({expr}, '{df}')" for _, df in formats)
    return f"coalesce({tries})"


def tz_shift_to_utc(ts_col: str | Column, offset_hours: Column) -> Column:
    """Local timestamp + per-source UTC offset (hours, may be
    fractional) -> UTC instant (ref siem/utils.py:605-615 applies a
    per-logtype configured offset). Pure epoch arithmetic so both
    engines agree to the second."""
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.timestamp_seconds(
        F.unix_timestamp(t) - (offset_hours * 3600).cast("long")
    )


def duckdb_tz_shift_sql(ts_expr: str, offset_expr: str) -> str:
    return (
        f"to_timestamp(floor(epoch({ts_expr}))::BIGINT"
        f" - (({offset_expr}) * 3600)::BIGINT)"
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

    # try_url_decode at BOTH levels: a singly-encoded '%25' or a
    # stray '%' in attack-traffic request lines must not throw; the
    # outer coalesce keeps the once-decoded (or raw) path instead of
    # nulling the whole row's fields
    once = F.coalesce(F.try_url_decode(grp(4)), grp(4))
    path = F.coalesce(F.try_url_decode(once), once)
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
    # try_cast: a hostname / empty string / malformed token in an
    # ip-typed source column yields NULL, not an ANSI cast error
    return (
        F.element_at(p, 1).try_cast("long") * 16777216
        + F.element_at(p, 2).try_cast("long") * 65536
        + F.element_at(p, 3).try_cast("long") * 256
        + F.element_at(p, 4).try_cast("long")
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
# IPv6 (J2 parity): the reference splits an IPv6 address into THREE
# integer columns (>>80, >>32 & 2^48-1, & 2^32-1) so sqlite can range-
# scan it (ref ioc_database/lambda_function.py:296-346). Same split
# here: hi/mid/lo longs (48+48+32 bits), each well inside a BIGINT,
# with lexicographic (hi, mid, lo) struct comparison replacing the
# 128-bit compare in range joins. Native expressions only; '::'
# zero-compression handled, IPv4-mapped forms out of scope (as in the
# reference, which normalizes those upstream).
# ---------------------------------------------------------------------------

_HEX_DIGITS = "0123456789abcdef"


def _pad_groups(arr: Column) -> Column:
    return F.array_join(F.transform(arr, lambda g: F.lpad(g, 4, "0")), "")


_V4_TAIL_RE = r"((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"


def _v4_tail_to_groups(c: Column) -> Column:
    """'::ffff:1.2.3.4' -> '::ffff:102:304' (dotted-quad tail rewritten
    as two hex groups, the RFC 4291 mixed notation)."""
    tail = F.regexp_extract(c, _V4_TAIL_RE, 0)
    n = ipv4_to_long(tail)
    rewritten = F.concat(
        F.substring(c, F.lit(1), F.length(c) - F.length(tail)),
        F.lower(F.hex((n / 65536).cast("long"))),
        F.lit(":"),
        F.lower(F.hex(n.cast("long") % 65536)),
    )
    return F.when(tail != "", rewritten).otherwise(c)


def ipv6_to_hex32(col: str | Column) -> Column:
    """IPv6 string -> 32-hex-char canonical form (zero-compression
    expanded, groups zero-padded, RFC 4291 dotted-quad tails
    normalized)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = _v4_tail_to_groups(c)
    parts = F.split(c, "::", 2)
    left = F.filter(F.split(F.get(parts, 0), ":"), lambda x: x != "")
    right = F.filter(
        F.coalesce(F.split(F.get(parts, 1), ":"), F.array().cast("array<string>")),
        lambda x: x != "",
    )
    missing = F.lit(8) - F.size(left) - F.size(right)
    compressed = F.concat(
        _pad_groups(left),
        F.substring(F.lit("0" * 32), F.lit(1), missing * 4),
        _pad_groups(right),
    )
    plain = _pad_groups(F.filter(F.split(c, ":"), lambda x: x != ""))
    return F.when(c.contains("::"), compressed).otherwise(plain)


def ipv6_to_3long(col: str | Column) -> dict[str, Column]:
    """IPv6 string -> {ip6_hi, ip6_mid, ip6_lo} long columns (top 48 /
    middle 48 / low 32 bits -- the reference's 3-column layout)."""
    h = ipv6_to_hex32(col)
    return {
        "ip6_hi": F.conv(F.substring(h, 1, 12), 16, 10).cast("long"),
        "ip6_mid": F.conv(F.substring(h, 13, 12), 16, 10).cast("long"),
        "ip6_lo": F.conv(F.substring(h, 25, 8), 16, 10).cast("long"),
    }


def longs_to_ipv6(hi: Column, mid: Column, lo: Column) -> Column:
    """(hi, mid, lo) -> uncompressed lowercase IPv6 string."""
    h = F.concat(
        F.lpad(F.lower(F.hex(hi)), 12, "0"),
        F.lpad(F.lower(F.hex(mid)), 12, "0"),
        F.lpad(F.lower(F.hex(lo)), 8, "0"),
    )
    groups = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.substring(h, i * 4 + 1, 4),
    )
    return F.array_join(groups, ":")


def duckdb_ipv6_hex32_sql(expr: str) -> str:
    """DuckDB twin of :func:`ipv6_to_hex32` (list ops + lambdas)."""
    e0 = f"lower({expr})"
    tail = f"coalesce(regexp_extract({e0}, '{_V4_TAIL_RE}', 0), '')"
    tp = f"string_split({tail}, '.')"
    v4 = (
        f"({tp}[1]::BIGINT * 16777216 + {tp}[2]::BIGINT * 65536"
        f" + {tp}[3]::BIGINT * 256 + {tp}[4]::BIGINT)"
    )
    rewritten = (
        f"substr({e0}, 1, len({e0}) - len({tail}))"
        f" || lower(to_hex({v4} // 65536)) || ':' || lower(to_hex({v4} % 65536))"
    )
    e = f"(CASE WHEN {tail} <> '' THEN {rewritten} ELSE {e0} END)"
    pad = (
        "list_aggregate(list_transform(list_filter(string_split({src}, ':'),"
        " x -> x <> ''), g -> lpad(g, 4, '0')), 'string_agg', '')"
    )
    left = pad.format(src=f"string_split({e}, '::')[1]")
    right = pad.format(src=f"coalesce(string_split({e}, '::')[2], '')")
    nleft = (
        f"len(list_filter(string_split(string_split({e}, '::')[1], ':'),"
        " x -> x <> ''))"
    )
    nright = (
        f"len(list_filter(string_split(coalesce(string_split({e}, '::')[2],"
        " ''), ':'), x -> x <> ''))"
    )
    compressed = (
        f"coalesce({left}, '') || repeat('0000', 8 - {nleft} - {nright})"
        f" || coalesce({right}, '')"
    )
    plain = pad.format(src=e)
    return (
        f"(CASE WHEN contains({e}, '::') THEN {compressed} ELSE {plain} END)"
    )


def duckdb_hex_to_long_sql(expr: str, start: int, length: int) -> str:
    """Hex substring -> BIGINT without conv() (DuckDB lacks it): fold
    digit values * 16^position; exact because 16^11 * 15 < 2^53."""
    h = f"substr({expr}, {start}, {length})"
    return (
        f"list_aggregate(list_transform(range(1, {length} + 1), i -> "
        f"(strpos('{_HEX_DIGITS}', substr({h}, i::INT, 1)) - 1)"
        f" * power(16, {length} - i)), 'sum')::BIGINT"
    )


#: the `mid` value of an IPv4-mapped IPv6 address (::ffff:a.b.c.d):
#: bits 47..32 are all-ones, so v4 and v6 facts share ONE (hi, mid,
#: lo) space and one dimension table, as the 3-column layout intends.
V4_MAPPED_MID = 0xFFFF


def ip_any_to_3long(col: str | Column) -> dict[str, Column]:
    """Mixed v4/v6 string -> the 3-column space: IPv6 split hi/mid/lo,
    IPv4 embedded at (0, 0xffff, uint32) -- its IPv4-mapped position."""
    c = F.col(col) if isinstance(col, str) else col
    is6 = c.contains(":")
    v6 = ipv6_to_3long(c)
    return {
        "ip6_hi": F.when(is6, v6["ip6_hi"]).otherwise(F.lit(0)),
        "ip6_mid": F.when(is6, v6["ip6_mid"]).otherwise(F.lit(V4_MAPPED_MID)),
        "ip6_lo": F.when(is6, v6["ip6_lo"]).otherwise(ipv4_to_long(c)),
    }


def duckdb_ip_any_3long_sql(expr: str) -> dict[str, str]:
    hex_sql = duckdb_ipv6_hex32_sql(expr)
    p = f"string_split({expr}, '.')"
    v4 = (
        f"({p}[1]::BIGINT * 16777216 + {p}[2]::BIGINT * 65536"
        f" + {p}[3]::BIGINT * 256 + {p}[4]::BIGINT)"
    )
    is6 = f"contains({expr}, ':')"
    return {
        "ip6_hi": f"(CASE WHEN {is6} THEN "
        f"{duckdb_hex_to_long_sql(hex_sql, 1, 12)} ELSE 0 END)",
        "ip6_mid": f"(CASE WHEN {is6} THEN "
        f"{duckdb_hex_to_long_sql(hex_sql, 13, 12)} ELSE {V4_MAPPED_MID} END)",
        "ip6_lo": f"(CASE WHEN {is6} THEN "
        f"{duckdb_hex_to_long_sql(hex_sql, 25, 8)} ELSE {v4} END)",
    }


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


def xff_client_ip_ranged(df, id_col: str, source_col: str, xff_col: str,
                         trusted_ranges, out_col: str = "client_ip"):
    """XFF client selection with RANGE-TABLE trust -- the reference's
    full semantics (siem/xff.py:77-91 select_clientip_from_xff +
    _query_db:174-218, which checks each candidate against a sqlite
    *range* table, not a prefix list):

    * source ip NOT inside any trusted range -> client = source ip
      (the XFF header is untrustworthy);
    * else walk the XFF list RIGHT-TO-LEFT, first ip not inside a
      trusted range wins;
    * every candidate trusted -> '' (the reference's fallthrough).

    Like the reference, candidates are NOT pre-validated: an invalid
    token can never be trusted (its int form is NULL, matching no
    range), so it is selectable exactly as the reference's
    check_trusted_ipaddress -> None path selects it.

    ``trusted_ranges``: (net_start long, net_end long) inclusive over
    the v4 uint32 space (the trusted_proxy.db shape) -- a
    proxy-dimension table, broadcast by construction. Dataflow: one
    posexplode of [source] + reverse(xff) (lists are header-sized), a
    broadcast range join for the trust bit, one groupBy(id) to pick
    the winner -- no driver round-trips, fact side shuffles once on
    the id.
    """
    from pyspark.sql import functions as _F

    # coalesce the XFF side to '': a NULL header would null the
    # whole concat, emit ZERO candidate rows for the id, and lose the
    # source ip (most events have no X-Forwarded-For at all)
    cand = _F.concat(
        _F.array(_F.col(source_col)),
        _F.reverse(
            _F.transform(
                _F.split(_F.coalesce(_F.col(xff_col), _F.lit("")), ","),
                lambda s: _F.trim(s))
        ),
    )
    exploded = df.select(
        id_col, _F.posexplode(cand).alias("_pos", "_ip")
    )
    ip_int = _F.when(
        _F.col("_ip").rlike(_IPV4_RE), ipv4_to_long(_F.col("_ip"))
    )
    joined = exploded.withColumn("_int", ip_int).join(
        F.broadcast(trusted_ranges),
        (_F.col("_int") >= _F.col("net_start"))
        & (_F.col("_int") <= _F.col("net_end")),
        "left",
    )
    flags = joined.groupBy(id_col, "_pos", "_ip").agg(
        _F.max(_F.col("net_start").isNotNull()).alias("_trusted")
    )
    picked = flags.groupBy(id_col).agg(
        _F.max(_F.when(_F.col("_pos") == 0, _F.col("_trusted")))
        .alias("_src_trusted"),
        _F.max(_F.when(_F.col("_pos") == 0, _F.col("_ip"))).alias("_src"),
        _F.min(
            _F.when(
                (_F.col("_pos") > 0) & ~_F.col("_trusted"),
                _F.struct("_pos", "_ip"),
            )
        ).alias("_fu"),
    )
    client = _F.when(~_F.col("_src_trusted"), _F.col("_src")).otherwise(
        _F.coalesce(_F.col("_fu._ip"), _F.lit(""))
    )
    return df.join(
        picked.select(id_col, client.alias(out_col)), id_col, "left"
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
    # try_cast: VPC Flow Logs emit '-' for NODATA/SKIPDATA records —
    # fall through to the string form instead of an ANSI cast error
    return F.coalesce(m[c.cast("string").try_cast("int")],
                      c.cast("string"))


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


# ---------------------------------------------------------------------------
# F6/F7: cloud-resource identifier extraction (ref siem/utils.py:98-175)
# -- generic regex / path-segment pulls, kept for line-by-line parity
# ---------------------------------------------------------------------------

_ACCOUNT_RE = r"(?:^|[^0-9])([0-9]{12})(?:[^0-9]|$)"
_REGION_RE = r"\b((?:us|eu|ap|sa|ca|me|af|il)-(?:gov-)?[a-z]+-[0-9])\b"
_INSTANCE_RE = r"\b(i-[0-9a-f]{8,17})\b"


def aws_ids_from_text(col: str | Column) -> dict[str, Column]:
    """F6 (ref siem/utils.py:98-141): first 12-digit account id,
    region code and EC2 instance id found in free text -- empty string
    when absent, matching the reference's get-or-default."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "account_id": F.regexp_extract(c, _ACCOUNT_RE, 1),
        "region": F.regexp_extract(c, _REGION_RE, 1),
        "instance_id": F.regexp_extract(c, _INSTANCE_RE, 1),
    }


def rds_identifiers(log_group_col: str | Column,
                    cluster_markers: tuple[str, ...] = ("cluster",)) -> dict[str, Column]:
    """F7 (ref siem/utils.py:144-175): cluster/instance identifier
    from a log-group-style path ``/aws/rds/<kind>/<identifier>/...``:
    the segment after the kind marker; kind containing a cluster
    marker fills cluster_id, otherwise instance_id."""
    c = F.col(log_group_col) if isinstance(log_group_col, str) else log_group_col
    parts = F.filter(F.split(c, "/"), lambda s: s != "")
    kind = F.get(parts, 2)
    ident = F.coalesce(F.get(parts, 3), F.lit(""))
    is_cluster = F.lit(False)
    for m in cluster_markers:
        is_cluster = is_cluster | kind.contains(m)
    return {
        "cluster_id": F.when(is_cluster, ident).otherwise(F.lit("")),
        "instance_id": F.when(~is_cluster, ident).otherwise(F.lit("")),
    }


def tz_string_to_hours(col: str | Column) -> Column:
    """F14 (ref siem/utils.py:605-615): '+05:30' / '-08:00' / '+9' ->
    signed fractional hours as double. Native split + sign arithmetic;
    invalid strings yield NULL (try_cast semantics)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    sign = F.when(c.startswith("-"), -1.0).otherwise(1.0)
    body = F.regexp_replace(c, r"^[+-]", "")
    parts = F.split(body, ":")
    hours = F.get(parts, 0).try_cast("double")
    minutes = F.coalesce(
        F.get(parts, 1).try_cast("double"), F.lit(0.0)
    )
    return sign * (hours + minutes / 60.0)


def regroup_underscored(df, sep: str = "_"):
    """F8 (ref siem/utils.py:178-192): flat ``a_b``-style columns
    regrouped into nested structs (``userIdentity_type`` ->
    ``userIdentity.type``), one level per call (apply repeatedly for
    deeper nesting). Columns without the separator pass through; every
    separated column regroups -- a lone ``a_b`` becomes a one-field
    struct ``a{b}``, exactly like the reference's dict put. Pure
    projection: a plan-time column rebuild, zero per-row cost beyond
    the struct wrap."""
    groups: dict[str, list[str]] = {}
    flat: list[str] = []
    for name in df.columns:
        if sep in name:
            head, _ = name.split(sep, 1)
            groups.setdefault(head, []).append(name)
        else:
            flat.append(name)
    cols: list[Column] = [F.col(n) for n in flat]
    for head, members in groups.items():
        cols.append(
            F.struct(
                *[
                    F.col(m).alias(m.split(sep, 1)[1])
                    for m in members
                ]
            ).alias(head)
        )
    return df.select(*cols)


def http_outcome(status_col: str | Column) -> Column:
    """HTTP status -> ECS event.outcome (ref sf_apache_access.py:61-71)."""
    raw = F.col(status_col) if isinstance(status_col, str) else status_col
    # try_cast: access logs use '-' for aborted requests — that's the
    # 'unknown' arm, which an ANSI cast error would make unreachable
    c = raw.cast("string").try_cast("int")
    return (
        F.when(c < 400, "success")
        .when(c >= 400, "failure")
        .otherwise("unknown")
    )
