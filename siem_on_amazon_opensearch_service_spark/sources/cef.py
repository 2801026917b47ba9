"""CEF source (reference S8: siem/fileformat_cef.py:29-75).

CEF line = ``CEF:ver|vendor|product|dev_ver|sig|name|severity|ext``
where ``ext`` is space-separated ``k=v`` pairs. The reference splits
the header on unescaped pipes and regex-parses the extension; here
both are native expressions (sentinel-encoded escape handling +
limited split + map_from_entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_FIELDS = [
    "cef_version", "device_vendor", "device_product", "device_version",
    "signature_id", "name", "severity",
]

#: sentinel bytes for the two CEF escape sequences during the header
#: split (control chars never appear in CEF text).
_S_BACKSLASH = "\x01"   # stands for the escaped backslash '\\'
_S_PIPE = "\x02"        # stands for the escaped pipe '\|'


def parse_cef(df: DataFrame, line_col: str) -> DataFrame:
    r"""Header fields as columns + ``ext`` map column of k=v pairs.

    CEF escaping (``\\`` = literal backslash, ``\|`` = literal pipe)
    cannot be handled by a lookbehind split: ``vendor\\|`` ends in an
    ESCAPED BACKSLASH followed by a REAL delimiter, which a
    ``(?<!\\)`` lookbehind wrongly treats as escaped, shifting every
    later header field by one. So the two escape sequences are
    sentinel-encoded first, the line splits on plain pipes with
    LIMIT 8 — the 8th field is the extension, which the spec does NOT
    require to escape pipes, so the limited split keeps its raw pipes
    intact instead of silently truncating at the first one — and each
    field restores its escapes afterwards.

    Repeated extension keys keep the LAST value (real devices emit
    them; ``map_from_entries`` would otherwise throw
    DUPLICATED_MAP_KEY under Spark's default map-dedup policy).
    """
    c = F.col(line_col)
    enc = F.replace(
        F.replace(c, F.lit("\\\\"), F.lit(_S_BACKSLASH)),
        F.lit("\\|"), F.lit(_S_PIPE),
    )
    parts = F.split(enc, r"\|", 8)

    def unesc(col: F.Column) -> F.Column:
        return F.replace(
            F.replace(col, F.lit(_S_PIPE), F.lit("|")),
            F.lit(_S_BACKSLASH), F.lit("\\"),
        )

    def hdr(i: int) -> F.Column:
        return unesc(F.element_at(parts, i + 1))

    header_cols = [
        (F.regexp_replace(hdr(0), "^CEF:", "") if i == 0 else hdr(i)).alias(n)
        for i, n in enumerate(HEADER_FIELDS)
    ]
    ext_raw = F.when(F.size(parts) >= 8, F.element_at(parts, 8)).otherwise(F.lit(""))
    ents = F.filter(
        F.transform(
            # split on spaces that precede a k= token
            F.split(ext_raw, r"\s+(?=[A-Za-z0-9_]+=)"),
            lambda kv: F.struct(
                F.regexp_extract(kv, r"^([A-Za-z0-9_]+)=", 1).alias("k"),
                unesc(
                    F.regexp_replace(kv, r"^[A-Za-z0-9_]+=", "")
                ).alias("v"),
            ),
        ),
        lambda s: s["k"] != "",
    )
    # last-wins key dedup: drop entry i when a later entry shares its
    # key (F.filter's index is 0-based; slice is 1-based)
    deduped = F.filter(
        ents,
        lambda e, i: ~F.exists(
            F.slice(ents, i + 2, F.size(ents)),
            lambda e2: e2["k"] == e["k"],
        ),
    )
    ext_map = F.map_from_entries(deduped)
    return df.select("*", *header_cols, ext_map.alias("ext"))
