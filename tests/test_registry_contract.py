"""Driver-contract guards: every registry query resolves, oracles
cover everything except the intentionally rows-only entries, and the
contract module exposes the three required callables."""

import importlib
import sys

#: iterative / engine-internal entries that legitimately have no SQL
#: oracle (the driver records a weaker rows-only check for these).
#: Round 3: EMPTY -- the last holdout (sim_kmeans_ivf_topk) gained a
#: full-value oracle by fixing the Lloyd budget and unrolling the
#: iterations in SQL.
ROWS_ONLY: set[str] = set()

#: the round driver records at most 50 queries() entries in
#: CORRECTNESS_r{N}.json -- every entry must land inside that window.
DRIVER_WINDOW = 50


def test_registry_and_oracles_consistent():
    from siem_on_amazon_opensearch_service_spark import entry_queries

    qs = entry_queries.registry()
    oracles = entry_queries.oracles()
    assert set(oracles).issubset(set(qs))
    assert set(qs) - set(oracles) == ROWS_ONLY
    assert 40 <= len(qs) <= DRIVER_WINDOW
    for name, fn in qs.items():
        assert callable(fn), name


def test_spark_entry_module_contract():
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    assert callable(mod.entry)
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert isinstance(qs, dict) and isinstance(oracles, dict)
    assert set(oracles).issubset(set(qs))
