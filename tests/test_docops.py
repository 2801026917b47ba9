"""Query-driven document tasks (_delete_by_query / _update_by_query /
_reindex / sliced scroll): task results == oracle over the matched
set; slices partition the matched set exactly."""

import os

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.docops import (
    delete_by_query,
    matched_ids,
    reindex,
    script_exprs,
    slice_hits,
    sliced_export,
    update_by_query,
)
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.index.tombstones import (
    live_topk,
    load_tombstones,
)

BODY = {"query": {"match": {"text": "w00005"}}}


def _match_set_py(pdf, term):
    """Docs whose analyzed text contains term (python twin)."""
    from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py

    return {
        int(r.doc_id) for r in pdf.itertuples() if term in tokenize_py(r.text)
    }


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(300, seed=41)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("ix_docops"))
    build_index(spark, sdf, id_col="doc_id", salt_threshold=50).save(
        spark, path, buckets=4
    )
    return pdf, sdf, path


def test_matched_ids_match_python_twin(spark, setup):
    pdf, _, path = setup
    ix = PostingsIndex.load(spark, path)
    got = {int(r["doc_id"]) for r in matched_ids(ix, BODY).collect()}
    assert got == _match_set_py(pdf, "w00005")
    # match_all: every doc
    assert matched_ids(ix, None).count() == len(pdf)


def test_delete_by_query_masks_and_is_idempotent(spark, setup):
    pdf, _, path = setup
    expect = _match_set_py(pdf, "w00005")
    n = delete_by_query(spark, path, BODY)
    assert n == len(expect)
    tombs = {int(r["doc_id"])
             for r in load_tombstones(spark, path).collect()}
    assert tombs == expect
    # second run: every match already tombstoned -> 0 new deletions
    assert delete_by_query(spark, path, BODY) == 0
    # masked docs can never appear in live results
    ix = PostingsIndex.load(spark, path)
    live = {int(r["doc_id"])
            for r in live_topk(ix, spark, path, "w00005 w00011", k=50)
            .collect()}
    assert not (live & expect)


def test_update_by_query_rewrites_matched_metadata_only(spark, setup):
    pdf, _, path = setup
    body = {"query": {"match": {"text": "w00007"}}}
    expect = _match_set_py(pdf, "w00007")
    n = update_by_query(spark, path, body,
                        [{"set": {"lang": "xx"}},
                         {"copy": {"lang_bak": "lang"}}])
    assert n == len(expect)
    docs = spark.read.parquet(os.path.join(path, "docs")).collect()
    for r in docs:
        if int(r["doc_id"]) in expect:
            assert r["lang"] == "xx" and r["lang_bak"] == "xx"
        else:
            assert r["lang"] != "xx" and r["lang_bak"] is None


def test_update_by_query_rejects_indexed_columns(spark, setup):
    _, _, path = setup
    with pytest.raises(ValueError, match="indexed"):
        update_by_query(spark, path, None, {"set": {"text": "boom"}})
    with pytest.raises(ValueError, match="indexed"):
        update_by_query(spark, path, None, {"inc": {"doclen": 1}})


def test_count_and_validate(spark, setup):
    pdf, _, path = setup
    from siem_on_amazon_opensearch_service_spark.index.docops import (
        count_matched,
        validate_query,
    )

    ix = PostingsIndex.load(spark, path)
    assert count_matched(ix, BODY) == len(_match_set_py(pdf, "w00005"))
    assert count_matched(ix, None) == len(pdf)
    ok = validate_query({"query": {"bool": {"must": [
        {"match": {"text": "a b"}}], "must_not": [
        {"term": {"lang": "fr"}}]}}})
    assert ok["valid"] and "Group" in ok["explanation"]
    bad = validate_query({"query": {"frobnicate": {"x": 1}}})
    assert not bad["valid"] and bad["error"]


def test_script_exprs_validation():
    with pytest.raises(ValueError, match="unknown script op"):
        script_exprs({"explode": {"f": 1}})
    with pytest.raises(ValueError, match="exactly one"):
        script_exprs({"set": {"a": 1}, "copy": {"b": "a"}})


def test_reindex_filtered_equals_direct_build(spark, setup, tmp_path):
    pdf, sdf, path = setup
    ix = PostingsIndex.load(spark, path)
    body = {"query": {"match": {"text": "w00003"}}}
    dest = str(tmp_path / "dest")
    out = reindex(spark, sdf, dest, src_ix=ix, body=body,
                  salt_threshold=50)

    expect = _match_set_py(pdf, "w00003")
    assert out.n_docs == len(expect)
    # dest == building directly over the pre-filtered pages: same
    # corpus stats and rank-identical top-k.
    direct = build_index(
        spark,
        sdf.filter(sdf.doc_id.isin([int(x) for x in expect])).drop("doc_id"),
        salt_threshold=50,
    )
    assert abs(out.avgdl - direct.avgdl) < 1e-9
    got = [(r["url"], round(r["score"], 6)) for r in
           bm25_topk(out, "w00003 w00011", k=10)
           .join(out.docs, "doc_id").select("url", "score").collect()]
    want = [(r["url"], round(r["score"], 6)) for r in
            bm25_topk(direct, "w00003 w00011", k=10)
            .join(direct.docs, "doc_id").select("url", "score").collect()]
    assert sorted(got) == sorted(want)


def test_reindex_script_transforms_text(spark, setup, tmp_path):
    _, sdf, path = setup
    ix = PostingsIndex.load(spark, path)
    dest = str(tmp_path / "dest_script")
    out = reindex(
        spark, sdf, dest, src_ix=ix,
        # (?i): the corpus upper-cases occasional tokens (analyzer
        # exercise) and the analyzer lowercases them back at index time
        script={"regex_replace": {"field": "text", "pattern": "(?i)w00004",
                                  "replacement": "zzrewritten"}},
        salt_threshold=50,
    )
    terms = {r["term"] for r in out.term_stats.collect()}
    assert "w00004" not in terms and "zzrewritten" in terms


def test_reindex_body_requires_src(spark, setup, tmp_path):
    _, sdf, _ = setup
    with pytest.raises(ValueError, match="needs src_ix"):
        reindex(spark, sdf, str(tmp_path / "x"), body=BODY)


def test_slices_partition_matched_set(spark, setup):
    pdf, _, path = setup
    ix = PostingsIndex.load(spark, path)
    body = {"query": {"match": {"text": "w00002"}}}
    expect = _match_set_py(pdf, "w00002")
    for hashed in (False, True):
        parts = [
            {int(r["doc_id"])
             for r in slice_hits(ix, body, i, 3, hashed=hashed).collect()}
            for i in range(3)
        ]
        assert set().union(*parts) == expect          # complete
        assert sum(len(p) for p in parts) == len(expect)  # disjoint
    with pytest.raises(ValueError, match="out of range"):
        slice_hits(ix, body, 3, 3)


def test_sliced_export_layout(spark, setup, tmp_path):
    pdf, _, path = setup
    ix = PostingsIndex.load(spark, path)
    body = {"query": {"match": {"text": "w00002"}}}
    out = str(tmp_path / "export")
    sliced_export(ix, body, out, max_slices=4)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("slice="))
    assert dirs == [f"slice={i}" for i in range(4)]
    got = spark.read.parquet(out)
    assert {int(r["doc_id"]) for r in got.select("doc_id").collect()} == \
        _match_set_py(pdf, "w00002")
