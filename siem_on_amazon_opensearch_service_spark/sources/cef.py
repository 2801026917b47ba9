"""CEF source (reference S8: siem/fileformat_cef.py:29-75).

CEF line = ``CEF:ver|vendor|product|dev_ver|sig|name|severity|ext``
where ``ext`` is space-separated ``k=v`` pairs. The reference splits
the header on unescaped pipes and regex-parses the extension; here
both are native expressions (lookbehind split + map_from_entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_FIELDS = [
    "cef_version", "device_vendor", "device_product", "device_version",
    "signature_id", "name", "severity",
]


def parse_cef(df: DataFrame, line_col: str) -> DataFrame:
    """Header fields as columns + ``ext`` map column of k=v pairs.

    The split matches only unescaped pipes (negative lookbehind, the
    same semantics as the reference's escape handling); the escape is
    unfolded per field afterwards. The extension is the 8th field —
    CEF guarantees it contains no unescaped pipes.
    """
    c = F.col(line_col)
    parts = F.split(c, r"(?<!\\)\|")

    def hdr(i: int) -> F.Column:
        return F.regexp_replace(F.element_at(parts, i + 1), r"\\\|", "|")

    header_cols = [
        (F.regexp_replace(hdr(0), "^CEF:", "") if i == 0 else hdr(i)).alias(n)
        for i, n in enumerate(HEADER_FIELDS)
    ]
    ext_raw = F.when(F.size(parts) >= 8, F.element_at(parts, 8)).otherwise(F.lit(""))
    ext_map = F.map_from_entries(
        F.filter(
            F.transform(
                # split on spaces that precede a k= token
                F.split(ext_raw, r"\s+(?=[A-Za-z0-9_]+=)"),
                lambda kv: F.struct(
                    F.regexp_extract(kv, r"^([A-Za-z0-9_]+)=", 1).alias("k"),
                    F.regexp_replace(kv, r"^[A-Za-z0-9_]+=", "").alias("v"),
                ),
            ),
            lambda s: s["k"] != "",
        )
    )
    return df.select("*", *header_cols, ext_map.alias("ext"))
