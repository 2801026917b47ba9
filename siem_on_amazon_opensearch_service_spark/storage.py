"""Storage-adapter seam: the engine's index state (postings, docs,
tombstones, deltas, manifests) reads and writes through a small
table-store interface so the 100 TB deployment can swap the sandbox
parquet layout for Iceberg tables WITHOUT touching the operators.

Reference mapping (SURVEY.md section 1.4): the reference rotates
OpenSearch indices and updates/deletes by ``_id``; at lake scale those
are Iceberg partitioned tables, ``MERGE INTO`` and snapshot rollback.
BASELINE.json's north rule names Iceberg as the corpus/table format;
this module is the contract in code:

=================  ==========================  =========================
engine operation   ParquetStore (sandbox)      IcebergStore (cluster)
=================  ==========================  =========================
save(df, t)        overwrite parquet dir       CREATE OR REPLACE TABLE
                                               ... USING iceberg
append(df, t)      append parquet files        INSERT INTO t
load(t)            spark.read.parquet          spark.table(t)
merge_delete       anti-join + atomic          MERGE INTO t USING k ON
(t, keys)          temp-dir swap rewrite       t.id = k.id WHEN MATCHED
                                               THEN DELETE
compact            decode -> mask -> re-encode CALL system.
                   (index/tombstones.py)       rewrite_data_files(t)
time travel        delta dirs + JSON manifest  VERSION AS OF snapshot
=================  ==========================  =========================

The parquet implementation is the one every test exercises; the
Iceberg implementation builds the EXACT SQL above and executes it
through ``spark.sql`` when an Iceberg catalog is configured (not
bundled in this sandbox -- construction and SQL planning are tested,
execution is gated on the catalog being present).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetStore:
    """Directory-per-table parquet store -- the sandbox/default
    implementation backing index/tombstones.py and plans/checkpoint.py.
    """

    def __init__(self, root: str):
        self.root = root

    def _p(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self._p(table))

    def save(self, df: DataFrame, table: str,
             partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._p(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self._p(table))

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._p(table))

    def load_or_empty(self, spark: SparkSession, table: str,
                      schema: str) -> DataFrame:
        if self.exists(table):
            return self.load(spark, table)
        return spark.createDataFrame([], schema)

    def merge_delete(self, spark: SparkSession, table: str,
                     keys: DataFrame, key_col: str) -> None:
        """MERGE INTO ... WHEN MATCHED THEN DELETE, parquet-style:
        anti-join the keys out and rewrite via a temp sibling +
        atomic swap (a parquet dir cannot be overwritten while its
        own lineage reads it -- the same discipline as in-place index
        compaction)."""
        path = self._p(table)
        remaining = self.load(spark, table).join(
            keys.select(key_col), key_col, "left_anti"
        )
        tmp = path.rstrip("/") + ".merging"
        remaining.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        shutil.move(tmp, path)


class IcebergStore:
    """The cluster implementation: every operation is one Iceberg SQL
    statement against a configured catalog. ``*_sql`` methods build
    the statement (pure, always testable); the verb methods execute it
    through spark.sql and therefore need the Iceberg runtime +
    catalog, which this sandbox does not bundle."""

    def __init__(self, catalog: str, namespace: str):
        self.prefix = f"{catalog}.{namespace}"

    def _t(self, table: str) -> str:
        return f"{self.prefix}.{table}"

    # -- SQL planning (pure) --

    def save_sql(self, table: str, source_view: str,
                 partition_by: list[str] | None = None) -> str:
        part = (
            f" PARTITIONED BY ({', '.join(partition_by)})"
            if partition_by else ""
        )
        return (
            f"CREATE OR REPLACE TABLE {self._t(table)} USING iceberg"
            f"{part} AS SELECT * FROM {source_view}"
        )

    def append_sql(self, table: str, source_view: str) -> str:
        return f"INSERT INTO {self._t(table)} SELECT * FROM {source_view}"

    def merge_delete_sql(self, table: str, keys_view: str,
                         key_col: str) -> str:
        t = self._t(table)
        return (
            f"MERGE INTO {t} t USING {keys_view} k "
            f"ON t.{key_col} = k.{key_col} "
            f"WHEN MATCHED THEN DELETE"
        )

    def compact_sql(self, table: str) -> str:
        cat = self.prefix.split(".", 1)[0]
        return (
            f"CALL {cat}.system.rewrite_data_files"
            f"(table => '{self._t(table)}')"
        )

    def time_travel_sql(self, table: str, snapshot_id: int) -> str:
        return (
            f"SELECT * FROM {self._t(table)} VERSION AS OF {snapshot_id}"
        )

    # -- execution (needs an Iceberg catalog on the session) --

    def save(self, df: DataFrame, table: str,
             partition_by: list[str] | None = None) -> None:
        view = f"_src_{table.replace('.', '_')}"
        df.createOrReplaceTempView(view)
        df.sparkSession.sql(self.save_sql(table, view, partition_by))

    def append(self, df: DataFrame, table: str) -> None:
        view = f"_src_{table.replace('.', '_')}"
        df.createOrReplaceTempView(view)
        df.sparkSession.sql(self.append_sql(table, view))

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._t(table))

    def load_or_empty(self, spark: SparkSession, table: str,
                      schema: str) -> DataFrame:
        if spark.catalog.tableExists(self._t(table)):
            return self.load(spark, table)
        return spark.createDataFrame([], schema)

    def exists(self, table: str) -> bool:  # pragma: no cover - catalog
        raise RuntimeError("needs a live SparkSession catalog; "
                           "use load_or_empty")

    def merge_delete(self, spark: SparkSession, table: str,
                     keys: DataFrame, key_col: str) -> None:
        view = f"_keys_{table.replace('.', '_')}"
        keys.createOrReplaceTempView(view)
        spark.sql(self.merge_delete_sql(table, view, key_col))
