"""Exact-substring dedup via window hashing (Lee et al. ACL 2022
approximation): duplicated token spans across documents."""

import pytest

from siem_on_amazon_opensearch_service_spark.operators.dedup import (
    substring_dup_stats, substring_windows)


@pytest.fixture(scope="module")
def docs(spark):
    shared = " ".join(f"tok{i}" for i in range(6))  # 6-token shared span
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, "delta " + shared + " epsilon zeta"),
        (3, "nothing in common here at all whatsoever today"),
        (4, "tiny doc"),  # shorter than the window -> zero windows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_windows_shape_and_short_doc_exclusion(docs):
    win = substring_windows(docs, window=6).collect()
    by_doc = {}
    for r in win:
        by_doc.setdefault(r.id, []).append(r)
    # doc1 has 9 tokens -> 4 windows of 6; doc4 has none
    assert len(by_doc[1]) == 4 and len(by_doc[3]) == 3
    assert 4 not in by_doc
    # positions are 1-based consecutive at stride 1
    assert sorted(r.p for r in by_doc[1]) == [1, 2, 3, 4]


def test_shared_span_found_across_docs(docs):
    win = substring_windows(docs, window=6)
    dup = (win.groupBy("wh").count().filter("count > 1").join(win, "wh")
           .select("id").distinct().collect())
    assert sorted(r.id for r in dup) == [1, 2]


def test_stride_contract_asymmetric_join(docs):
    # stride>1 is only sound on ONE side of an asymmetric join: the
    # strided corpus windows joined against an exhaustive (stride=1)
    # reference side always hit a shared span of >= window+stride-1
    # tokens, whatever the phase offset.
    full = substring_windows(docs, window=3, stride=1)
    strided = substring_windows(docs, window=3, stride=2)
    assert strided.count() < full.count()
    corpus_side = strided.filter("id = 1")
    ref_side = full.filter("id = 2").select("wh").distinct()
    hit = corpus_side.join(ref_side, "wh", "left_semi")
    assert hit.count() >= 1  # the 6-token shared span is found
    # contrast: stride 2 on BOTH sides can miss (incompatible phases)
    both = substring_windows(docs, window=3, stride=2)
    self_dup = (both.filter("id in (1, 2)").groupBy("wh").count()
                .filter("count > 1").count())
    assert self_dup == 0  # documents why self-dedup demands stride=1


def test_stats_rollup(docs):
    row = substring_dup_stats(docs, window=6).collect()[0]
    assert row.n_windows == 4 + 4 + 3  # docs 1,2,3
    assert row.n_dup_span_groups == 1  # exactly the shared 6-token span
    assert row.n_docs_with_dup_span == 2
    assert row.n_span_hashes == row.n_windows - 1  # one collision pair
