"""Windows-event XML source (reference S7:
siem/fileformat_winevtxml.py:67-161).

The reference assembles ``<Event ...>...</Event>`` blocks, parses
with xmltodict, flattens EventData name/value pairs to a map, and
unwraps the EventID qualifier. Native restatement: regex extraction
for the fixed system fields + ``map_from_entries`` over the
name/value ``<Data>`` elements — no XML library needed for this
fixed, flat schema (a full tree parser would go through mapInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_winevt(df: DataFrame, xml_col: str) -> DataFrame:
    c = F.col(xml_col)
    event_id = F.regexp_extract(c, r"<EventID(?:\s[^>]*)?>(\d+)</EventID>", 1)
    provider = F.regexp_extract(c, r"<Provider Name=['\"]([^'\"]+)['\"]", 1)
    computer = F.regexp_extract(c, r"<Computer>([^<]+)</Computer>", 1)
    time_created = F.regexp_extract(c, r"<TimeCreated SystemTime=['\"]([^'\"]+)['\"]", 1)
    data_kvs = F.map_from_entries(
        F.filter(
            F.transform(
                F.regexp_extract_all(
                    c, F.lit(r"<Data Name=['\"]([^'\"]+)['\"]>([^<]*)</Data>"), 0
                ),
                lambda d: F.struct(
                    F.regexp_extract(d, r"Name=['\"]([^'\"]+)['\"]", 1).alias("k"),
                    F.regexp_extract(d, r">([^<]*)</Data>", 1).alias("v"),
                ),
            ),
            lambda s: s["k"] != "",
        )
    )
    return df.select(
        "*",
        event_id.alias("event_id_str"),
        provider.alias("provider"),
        computer.alias("computer"),
        time_created.alias("time_created"),
        data_kvs.alias("event_data"),
    )
