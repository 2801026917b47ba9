r"""Index State Management (ISM) -- rollover + retention lifecycle.

Reference parity: the deploy side ships an ISM policy
(`deploy_es/data.ini:66-80`, ``rollover100gb``: a ``rollover`` state
whose action fires at ``min_size: 100gb``) and wires every
``index_rotation=auto`` index to a write alias over numbered
generations ``log-*-000001, -000002, ...``
(`deploy_es/index.py:470-510`, ``configure_index_rollover``).
OpenSearch's ISM runner then walks each index through the policy's
states: evaluate the current state's ACTIONS (rollover when its
conditions are met), then its TRANSITIONS (state change when
``min_index_age`` etc. are met); a ``delete`` action retires the
index.

Spark restatement: ONE append-only postings store (the
IncrementalIndexer layout, globally numbered ``delta/batch=N``
dirs -- so doc ids stay unique across generations) plus a JSON
generations manifest.  A GENERATION is the rollover unit: the set of
batches appended while it was the write generation.  The policy
evaluator is pure driver-side metadata work (generation count ==
number of rollovers, never corpus-sized); data-touching actions map
to Spark jobs or directory retirement:

- ``rollover`` seals the write generation when min_size /
  min_doc_count / min_index_age trip (bytes and docs are tracked in
  the manifest at append time -- the Iceberg analog reads the same
  numbers from snapshot summary metadata).
- state ``transitions`` on ``min_index_age`` re-label generations
  (hot -> warm -> delete ladder).
- ``force_merge`` compacts a sealed generation's deltas into one
  (the OpenSearch segment-merge analog, same machinery as
  ``IncrementalIndexer.compact``).
- ``delete`` retires the generation: its batch dirs leave the
  manifest (and are removed from disk), exactly like ISM deleting a
  rolled-over index.

Query side: :func:`ManagedIndex.load` opens the union of live
generations (optionally state-filtered, e.g. hot+warm only) --
directory-level pruning identical to the rotation loader; BM25 over
the union is rank-identical to a from-scratch build over the same
docs (pinned by tests/test_lifecycle.py).

The clock is always an explicit ``now`` (epoch seconds): determinism
for tests, and at production scale the ISM runner is a scheduled job
that passes its own wall clock.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex

#: data.ini's rollover100gb policy, restated (100gb -> the literal
#: reference value; tests use tiny thresholds).
DEFAULT_POLICY = {
    "default_state": "rollover",
    "states": [
        {"name": "rollover",
         "actions": [{"rollover": {"min_size": "100gb"}}]},
    ],
}

_SIZE_RE = re.compile(r"^(\d+(?:\.\d+)?)\s*(b|kb|mb|gb|tb)?$", re.I)
_AGE_RE = re.compile(r"^(\d+(?:\.\d+)?)\s*(s|m|h|d)$", re.I)
_SIZE_MULT = {None: 1, "b": 1, "kb": 1024, "mb": 1024**2,
              "gb": 1024**3, "tb": 1024**4}
_AGE_MULT = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_size(s: str | int) -> int:
    if isinstance(s, (int, float)):
        return int(s)
    m = _SIZE_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad size {s!r}")
    return int(float(m.group(1)) * _SIZE_MULT[
        m.group(2).lower() if m.group(2) else None])


def parse_age(s: str | int) -> float:
    """ISM age string -> seconds."""
    if isinstance(s, (int, float)):
        return float(s)
    m = _AGE_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad age {s!r}")
    return float(m.group(1)) * _AGE_MULT[m.group(2).lower()]


def _conditions_met(cond: dict, gen: dict, now: float) -> bool:
    if "min_doc_count" in cond and gen["docs"] < int(cond["min_doc_count"]):
        return False
    if "min_size" in cond and gen["bytes"] < parse_size(cond["min_size"]):
        return False
    if "min_index_age" in cond and \
            (now - gen["created"]) < parse_age(cond["min_index_age"]):
        return False
    return True


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


class ManagedIndex:
    """An ISM-managed inverted index: append batches, step the policy.

    Layout: ``{path}/delta/batch=N`` (shared IncrementalIndexer
    store, global batch numbering) + ``{path}/ism.json`` manifest::

        {"next_batch": 3,
         "generations": [
            {"name": "000001", "state": "hot", "created": 100.0,
             "sealed": 250.0, "batches": [0, 1], "docs": 812,
             "bytes": 73014}, ...]}
    """

    def __init__(self, path: str, policy: dict | None = None,
                 salt_threshold: int = 100_000):
        self.path = path
        self.policy = policy or DEFAULT_POLICY
        self.salt_threshold = salt_threshold
        self._states = {s["name"]: s for s in self.policy["states"]}

    # -- manifest ------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "ism.json")

    def _read(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"next_batch": 0, "generations": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write(self, man: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def _write_gen(self, man: dict, now: float) -> dict:
        gens = man["generations"]
        if gens and gens[-1].get("sealed") is None:
            return gens[-1]
        # monotonic generation numbering survives deletes: a counter
        # in the manifest, seeded from the highest surviving name for
        # pre-counter manifests (len(gens)+1 re-issued names once a
        # delete action had retired earlier generations)
        nxt = man.get("next_gen")
        if nxt is None:
            nxt = max((int(g["name"]) for g in gens), default=0) + 1
        man["next_gen"] = nxt + 1
        gen = {
            "name": f"{nxt:06d}",
            "state": self.policy["default_state"],
            "created": now, "sealed": None,
            "batches": [], "docs": 0, "bytes": 0,
        }
        gens.append(gen)
        return gen

    # -- ingest --------------------------------------------------------

    def append(self, pages: DataFrame, now: float) -> list[dict]:
        """Index one batch into the write generation, then step the
        policy.  Returns the actions the step executed."""
        from ..streaming.incremental import IncrementalIndexer

        man = self._read()
        gen = self._write_gen(man, now)
        bid = man["next_batch"]
        indexer = IncrementalIndexer(self.path, self.salt_threshold)
        indexer.process_batch(pages, bid)
        man["next_batch"] = bid + 1
        gen["batches"].append(bid)
        spark = pages.sparkSession
        srow = spark.read.parquet(
            f"{self.path}/delta/batch={bid}/stats").collect()[0]
        gen["docs"] += int(srow["n_docs"])
        gen["bytes"] += _dir_bytes(f"{self.path}/delta/batch={bid}")
        self._write(man)
        return self.step(spark, now)

    # -- the ISM runner ------------------------------------------------

    def step(self, spark: SparkSession, now: float) -> list[dict]:
        """One policy evaluation pass over every live generation:
        actions of the current state first, then transitions --
        OpenSearch ISM's execution order.  Pure metadata except
        force_merge (a Spark merge job) and delete (dir removal)."""
        man = self._read()
        executed: list[dict] = []
        keep = []
        for gen in man["generations"]:
            state = self._states.get(gen["state"])
            deleted = False
            if state is not None:
                # ISM execution order: a state's actions must ALL
                # complete before its transitions are considered --
                # in particular the write generation never leaves a
                # rollover state until it actually rolls over.
                actions_done = True
                for action in state.get("actions", []):
                    kind, params = next(iter(action.items()))
                    if kind == "rollover":
                        if gen.get("sealed") is None and \
                                _conditions_met(params, gen, now):
                            gen["sealed"] = now
                            executed.append(
                                {"rollover": gen["name"]})
                        if gen.get("sealed") is None:
                            actions_done = False
                    elif kind == "delete":
                        self._delete_gen(gen)
                        executed.append({"delete": gen["name"]})
                        deleted = True
                    elif kind == "force_merge":
                        if gen.get("sealed") is not None and \
                                not gen.get("merged"):
                            self._force_merge(spark, gen)
                            executed.append(
                                {"force_merge": gen["name"]})
                        if not gen.get("merged"):
                            actions_done = False
                    elif kind == "read_only":
                        gen["read_only"] = True
                    else:
                        raise ValueError(f"unsupported ISM action {kind!r}")
                if not deleted and actions_done:
                    for tr in state.get("transitions", []):
                        if _conditions_met(tr.get("conditions", {}),
                                           gen, now):
                            executed.append({
                                "transition": gen["name"],
                                "from": gen["state"],
                                "to": tr["state_name"],
                            })
                            gen["state"] = tr["state_name"]
                            break
            if not deleted:
                keep.append(gen)
        man["generations"] = keep
        self._write(man)
        return executed

    def _delete_gen(self, gen: dict) -> None:
        for bid in gen["batches"]:
            d = f"{self.path}/delta/batch={bid}"
            if os.path.exists(d):
                shutil.rmtree(d)

    def _force_merge(self, spark: SparkSession, gen: dict) -> None:
        """Compact the generation's deltas into ONE delta dir (its
        first batch id) -- the segment-merge analog.  Reads the
        decoded union, re-encodes through the standard build path,
        writes to a temp sibling then swaps (never overwrites a path
        being read).

        Crash safety (same completeness-marker convention as the
        delta store): the merged layout -- INCLUDING its stats row --
        is fully written under ``.merge_tmp_<gen>`` BEFORE any source
        batch dir is removed; ``tmp/stats`` existing is the
        "merge complete" marker.  A retry after any crash either
        discards an incomplete tmp and redoes the merge from intact
        sources, or finishes the deletions+swap from a complete tmp.
        The old order (delete every source, then swap) stranded the
        only copy under tmp and made retries crash on missing paths."""
        from ..plans.checkpoint import merge_decoded_deltas

        bids = gen["batches"]
        if len(bids) <= 1:
            gen["merged"] = True
            return
        keep = bids[0]
        dst = f"{self.path}/delta/batch={keep}"
        tmp = f"{self.path}/delta/.merge_tmp_{gen['name']}"
        gone = [b for b in bids[1:]
                if not os.path.exists(f"{self.path}/delta/batch={b}")]
        if not os.path.exists(tmp) and gone and \
                os.path.exists(f"{dst}/stats"):
            # a prior run completed the swap but crashed before the
            # manifest update (source dirs cannot vanish otherwise):
            # just finalize the bookkeeping
            for b in bids[1:]:
                d = f"{self.path}/delta/batch={b}"
                if os.path.exists(d):
                    shutil.rmtree(d)
            gen["batches"] = [keep]
            gen["merged"] = True
            gen["bytes"] = _dir_bytes(dst)
            return
        if os.path.exists(f"{tmp}/stats"):
            # complete tmp from a crashed run: skip straight to the
            # finish phase below
            pass
        else:
            if os.path.exists(tmp):
                shutil.rmtree(tmp)  # torn write; sources are intact
            post_dirs = [f"{self.path}/delta/batch={b}/postings"
                         for b in bids]
            doc_dirs = [f"{self.path}/delta/batch={b}/docs" for b in bids]
            stats = spark.read.parquet(
                *[f"{self.path}/delta/batch={b}/stats" for b in bids]
            ).agg(F.sum("n_docs").alias("n"),
                  F.sum("total_dl").alias("dl")).collect()[0]
            merge_decoded_deltas(
                spark,
                spark.read.parquet(*post_dirs),
                spark.read.parquet(*doc_dirs),
                int(stats["n"] or 0), int(stats["dl"] or 0),
                tmp, self.salt_threshold,
            )
            # completeness marker LAST: the merged layout's own stats
            spark.createDataFrame(
                [(int(stats["n"] or 0), int(stats["dl"] or 0))],
                "n_docs long, total_dl long",
            ).write.mode("overwrite").parquet(f"{tmp}/stats")
        # finish phase: sources are redundant now -- remove non-keep
        # dirs, then swap the keep dir for the merged layout
        for b in bids[1:]:
            d = f"{self.path}/delta/batch={b}"
            if os.path.exists(d):
                shutil.rmtree(d)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.replace(tmp, dst)
        gen["batches"] = [keep]
        gen["merged"] = True
        gen["bytes"] = _dir_bytes(dst)

    # -- query side ----------------------------------------------------

    def generations(self) -> list[dict]:
        return self._read()["generations"]

    def load(self, spark: SparkSession,
             states: list[str] | None = None) -> PostingsIndex:
        """Open the union of live generations (optionally only the
        given states -- 'query the hot+warm alias').  Only selected
        generations' directories are listed/read."""
        man = self._read()
        gens = [g for g in man["generations"]
                if states is None or g["state"] in states]
        bids = [b for g in gens for b in g["batches"]]
        if not bids:
            raise ValueError(
                f"no live generations in states {states!r}")
        post = [f"{self.path}/delta/batch={b}/postings" for b in bids]
        docs = [f"{self.path}/delta/batch={b}/docs" for b in bids]
        stat = [f"{self.path}/delta/batch={b}/stats" for b in bids]
        postings = spark.read.parquet(*post)
        docs_df = spark.read.parquet(*docs)
        srow = spark.read.parquet(*stat).agg(
            F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl")
        ).collect()[0]
        n_docs, total_dl = int(srow["n"] or 0), int(srow["dl"] or 0)
        term_stats = postings.groupBy("term").agg(
            F.sum("doc_count").alias("df"),
            F.max("max_tf").alias("max_tf"),
            F.max("max_impact").alias("max_impact"),
        )
        return PostingsIndex(
            docs=docs_df, postings=postings, term_stats=term_stats,
            n_docs=n_docs,
            avgdl=(total_dl / n_docs if n_docs else 0.0),
        )
