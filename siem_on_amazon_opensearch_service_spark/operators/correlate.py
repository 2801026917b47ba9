"""Finding-correlation engine — the OpenSearch Security Analytics
*correlation rules* surface: link findings produced by different
detection rules (different log sources) when they occur **within a
time window and share an entity value** (the plugin's
``correlate: [{index, query, field}, ...]`` + ``time_window`` shape;
the reference stack feeds exactly these indices from es_loader).

Semantics reproduced: given a findings frame (one row per fired
detection: id, rule, entity, timestamp) and a correlation rule naming
two detection-rule groups A and B, emit every (a, b) pair with
``a.entity == b.entity`` and ``|a.ts - b.ts| <= window``.

Spark-first physical plan — the naive formulation is an equi-join on
entity plus a RANGE predicate, which Catalyst would execute fine
until one entity is hot; worse, an unbounded time predicate over a
100 TB year of findings makes every entity's full history a join
group. The scale shape used here is the **banded interval join** (the
same trick as the GeoIP range join): each side buckets its timestamp
by the window width, the LEFT side expands to its own and the two
adjacent buckets (``explode`` of a 3-element literal array — narrow,
×3), and the join key becomes ``(entity, bucket)``. Every true pair
lands in exactly one expanded bucket triple, the exact ``abs(Δts) <=
window`` filter runs post-join, and join-group size is bounded by
per-entity traffic within ±1 window — independent of corpus length.
AQE handles residual hot entities (skew-join split); dedup of the ×3
expansion is by construction (a pair is emitted only from B's OWN
bucket — the left expansion covers it exactly once).

All of it is plain relational algebra, so the DuckDB oracle replays
the SAME result with the naive inequality join — the gate proves the
banded plan equals the declarative semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_findings(findings: DataFrame, rules_a: list[str],
                       rules_b: list[str], window_s: int,
                       entity_col: str = "entity",
                       ts_col: str = "ts",
                       id_col: str = "finding_id",
                       rule_col: str = "rule_id") -> DataFrame:
    """Correlated pairs: one row per (finding from ``rules_a``,
    finding from ``rules_b``) sharing ``entity_col`` within
    ``window_s`` seconds. Self-pairs (same finding id) are excluded;
    when the groups overlap, each unordered pair appears once per
    (a-role, b-role) assignment, matching the SQL twin.

    Returns ``(entity, a_id, a_rule, a_ts, b_id, b_rule, b_ts,
    delta_s)``.
    """
    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    base = findings.select(
        F.col(entity_col).alias("entity"),
        F.col(id_col).alias("fid"),
        F.col(rule_col).alias("rid"),
        F.col(ts_col).cast("timestamp").alias("fts"),
        ts_long.alias("sec"),
        (ts_long / F.lit(window_s)).cast("long").alias("bucket"),
    )
    side_a = (
        base.filter(F.col("rid").isin(list(rules_a)))
        # expand A to the 3 buckets any partner within ±window can
        # occupy; B stays in its own bucket so each pair joins once
        .withColumn("bucket", F.explode(F.array(
            F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)))
        .select("entity", "bucket",
                F.col("fid").alias("a_id"), F.col("rid").alias("a_rule"),
                F.col("fts").alias("a_ts"), F.col("sec").alias("a_sec"))
    )
    side_b = base.filter(F.col("rid").isin(list(rules_b))).select(
        "entity", "bucket",
        F.col("fid").alias("b_id"), F.col("rid").alias("b_rule"),
        F.col("fts").alias("b_ts"), F.col("sec").alias("b_sec"))
    return (
        side_a.join(side_b, ["entity", "bucket"])
        .filter((F.abs(F.col("a_sec") - F.col("b_sec")) <= window_s)
                & (F.col("a_id") != F.col("b_id")))
        .select("entity", "a_id", "a_rule", "a_ts",
                "b_id", "b_rule", "b_ts",
                F.abs(F.col("a_sec") - F.col("b_sec")).alias("delta_s"))
    )


def correlate_sql(findings_sql: str, rules_a: list[str],
                  rules_b: list[str], window_s: int) -> str:
    """DuckDB twin: the naive inequality self-join over the same
    findings relation (columns entity, finding_id, rule_id, ts) —
    the declarative semantics the banded plan must equal."""
    def inlist(rules: list[str]) -> str:
        return ", ".join("'" + r.replace("'", "''") + "'" for r in rules)

    return f"""
    WITH f AS ({findings_sql})
    SELECT a.entity AS entity,
           a.finding_id AS a_id, a.rule_id AS a_rule, a.ts AS a_ts,
           b.finding_id AS b_id, b.rule_id AS b_rule, b.ts AS b_ts,
           abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT) AS delta_s
    FROM f a JOIN f b
      ON a.entity = b.entity
     AND a.finding_id <> b.finding_id
     AND abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT) <= {window_s}
    WHERE a.rule_id IN ({inlist(rules_a)})
      AND b.rule_id IN ({inlist(rules_b)})
    """
