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

    def snapshot_sql(self, table: str, tag: str) -> str:
        """Iceberg snapshot = a named tag on the current snapshot --
        zero data movement (the parquet analog below hardlinks)."""
        return (f"ALTER TABLE {self._t(table)} "
                f"CREATE TAG `{tag}` RETAIN 365 DAYS")

    def restore_sql(self, table: str, tag: str) -> str:
        cat = self.prefix.split(".", 1)[0]
        return (f"CALL {cat}.system.rollback_to_snapshot"
                f"(table => '{self._t(table)}', "
                f"snapshot_id => (SELECT snapshot_id FROM "
                f"{self._t(table)}.refs WHERE name = '{tag}'))")


# ---------------------------------------------------------------------------
# index-level snapshot / restore (the _snapshot repository API)
# ---------------------------------------------------------------------------
#
# Reference semantics target: OpenSearch snapshot repositories -- the
# ISM ladder snapshots an index before retiring it (the reference's
# rollover policy keeps generations until storage pressure;
# deploy_es/data.ini:66-80), and operators restore into a renamed
# index.  Parquet restatement: every data file in this engine is
# IMMUTABLE once written (rewrites replace whole directories, never
# file contents), so a snapshot is a HARDLINK farm + manifest --
# O(files) metadata work, zero data copy, exactly an Iceberg snapshot
# manifest referencing existing data files.  Cross-device repos fall
# back to a real copy.

import json

_SNAP_MANIFEST = "manifest.json"


def _link_tree(src: str, dst: str) -> tuple[int, int]:
    n_files = n_bytes = 0
    for base, _, files in os.walk(src):
        rel = os.path.relpath(base, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(base, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:           # cross-device repo
                shutil.copy2(s, d)
            n_files += 1
            n_bytes += os.path.getsize(s)
    return n_files, n_bytes


def snapshot_index(path: str, repo: str, snap_id: str) -> dict:
    """Snapshot every table dir under the index root into
    ``repo/snap_id``.  Live mutations after the snapshot (tombstone
    appends, compaction swaps, doc updates) never touch snapshotted
    bytes: they write NEW files / replace directories, and hardlinked
    inodes survive source deletion."""
    dst = os.path.join(repo, snap_id)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {snap_id!r} already exists")
    tables = sorted(
        d for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and not d.endswith((
            ".compacting", ".merging", ".updating"))
    )
    manifest = {"snapshot": snap_id, "source": os.path.realpath(path),
                "tables": tables, "files": 0, "bytes": 0}
    for t in tables:
        nf, nb = _link_tree(os.path.join(path, t), os.path.join(dst, t))
        manifest["files"] += nf
        manifest["bytes"] += nb
    with open(os.path.join(dst, _SNAP_MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def restore_index(repo: str, snap_id: str, dest: str,
                  overwrite: bool = False) -> dict:
    """Restore a snapshot into ``dest`` (the rename-on-restore shape:
    dest is a fresh index root).  Refuses to clobber an existing
    index unless ``overwrite`` -- a restore is destructive only when
    asked to be."""
    src = os.path.join(repo, snap_id)
    mpath = os.path.join(src, _SNAP_MANIFEST)
    if not os.path.isfile(mpath):
        raise ValueError(f"no snapshot {snap_id!r} in {repo!r}")
    with open(mpath) as fh:
        manifest = json.load(fh)
    if os.path.exists(dest):
        if not overwrite:
            raise ValueError(f"dest {dest!r} exists (pass overwrite=True)")
        shutil.rmtree(dest)
    for t in manifest["tables"]:
        _link_tree(os.path.join(src, t), os.path.join(dest, t))
    return manifest


def list_snapshots(repo: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo):
        return out
    for d in sorted(os.listdir(repo)):
        mpath = os.path.join(repo, d, _SNAP_MANIFEST)
        if os.path.isfile(mpath):
            with open(mpath) as fh:
                out.append(json.load(fh))
    return out


def delete_snapshot(repo: str, snap_id: str) -> None:
    dst = os.path.join(repo, snap_id)
    if not os.path.isfile(os.path.join(dst, _SNAP_MANIFEST)):
        raise ValueError(f"no snapshot {snap_id!r} in {repo!r}")
    shutil.rmtree(dst)
