"""Span queries: engine (doc_id, score) results must match a
pure-python span matcher implementing the module's documented
semantics exactly (same spans, same 1/(1+gap) weights, same BM25)."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.bm25 import B, K1, idf
from siem_on_amazon_opensearch_service_spark.index.positional import (
    build_positional_index,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)
from siem_on_amazon_opensearch_service_spark.index.spans import (
    span_leaf_terms,
    span_scores,
    span_topk,
)

N = 250


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=37)


@pytest.fixture(scope="module")
def pos_ix(spark, pages_pdf):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    pix = build_positional_index(spark, spark.createDataFrame(pdf),
                                 id_col="doc_id", salt_threshold=60)
    pix.postings = pix.postings.persist()
    pix.term_stats = pix.term_stats.persist()
    return pix


@pytest.fixture(scope="module")
def toks(pages_pdf):
    return {i: tokenize_py(t) for i, t in enumerate(pages_pdf["text"])}


# --- pure-python twin ------------------------------------------------------

def py_spans(doc, node):
    """(start, end, w) spans for one token list.  A MULTISET (list):
    span_near counts every valid child combination as its own match
    (two combinations yielding the same enclosing interval both
    count), exactly like the engine's join rows; only span_or dedups
    (documented "distinct union")."""
    (kind, body), = node.items()

    def term_of(b):
        (_, v), = b.items()
        return (v["value"] if isinstance(v, dict) else v).lower()

    if kind == "span_term":
        t = term_of(body)
        return [(i, i + 1, 1) for i, tok in enumerate(doc) if tok == t]
    if kind == "span_first":
        return [s for s in py_spans(doc, body["match"])
                if s[1] <= int(body["end"])]
    if kind == "span_or":
        out = set()
        for c in body["clauses"]:
            out |= set(py_spans(doc, c))
        return sorted(out)
    if kind == "span_not":
        inc = py_spans(doc, body["include"])
        exc = py_spans(doc, body["exclude"])
        return [s for s in inc
                if not any(s[0] < e[1] and e[0] < s[1] for e in exc)]
    if kind in ("span_within", "span_containing"):
        little = py_spans(doc, body["little"])
        big = py_spans(doc, body["big"])
        if kind == "span_within":
            return [s for s in little
                    if any(s[0] >= b[0] and s[1] <= b[1] for b in big)]
        return [b for b in big
                if any(s[0] >= b[0] and s[1] <= b[1] for s in little)]
    if kind == "span_near":
        import itertools
        slop = int(body.get("slop", 0))
        in_order = bool(body.get("in_order", True))
        childs = [py_spans(doc, c) for c in body["clauses"]]
        out = []
        for combo in itertools.product(*childs):
            ok = True
            for i in range(len(combo)):
                for j in range(i + 1, len(combo)):
                    if in_order and j == i + 1:
                        ok &= combo[j][0] >= combo[i][1]
                    elif not in_order:
                        ok &= (combo[j][0] >= combo[i][1]
                               or combo[i][0] >= combo[j][1])
            if not ok:
                continue
            start = min(s[0] for s in combo)
            end = max(s[1] for s in combo)
            w = sum(s[2] for s in combo)
            if (end - start) - w <= slop:
                out.append((start, end, w))
        return out
    raise ValueError(kind)


def py_span_scores(toks, node, n_docs, avgdl):
    dfs = {}
    for t in set(span_leaf_terms(node)):
        dfs[t] = sum(1 for d in toks.values() if t in d)
    if any(v == 0 for v in dfs.values()):
        return {}
    idf_sum = sum(idf(n_docs, dfs[t]) for t in span_leaf_terms(node))
    out = {}
    for i, d in toks.items():
        spans = py_spans(d, node)
        if not spans:
            continue
        ptf = sum(1.0 / (1.0 + (e - s) - w) for s, e, w in spans)
        dl = len(d)
        out[i] = idf_sum * ptf / (ptf + K1 * (1 - B + B * dl / avgdl))
    return out


def _got(df):
    return {int(r["doc_id"]): float(r["score"]) for r in df.collect()}


def _check(spark, pos_ix, toks, node, require_hits=True):
    got = _got(span_scores(pos_ix, node))
    want = py_span_scores(toks, node, pos_ix.n_docs, pos_ix.avgdl)
    assert set(got) == set(want)
    for d in got:
        assert math.isclose(got[d], want[d], rel_tol=1e-9), (d, node)
    if require_hits:
        assert got, f"vacuous span test: {node}"
    return got


T = lambda t: {"span_term": {"text": t}}  # noqa: E731


def test_span_term_and_first(spark, pos_ix, toks):
    _check(spark, pos_ix, toks, T("w00004"))
    got_all = _got(span_scores(pos_ix, T("w00004")))
    got_first = _check(spark, pos_ix, toks,
                       {"span_first": {"match": T("w00004"), "end": 30}})
    assert set(got_first) < set(got_all)


def test_span_near_ordered_and_unordered(spark, pos_ix, toks):
    node_o = {"span_near": {"clauses": [T("w00004"), T("w00011")],
                            "slop": 6, "in_order": True}}
    node_u = {"span_near": {"clauses": [T("w00004"), T("w00011")],
                            "slop": 6, "in_order": False}}
    go = _check(spark, pos_ix, toks, node_o)
    gu = _check(spark, pos_ix, toks, node_u)
    assert set(go) <= set(gu)

    # three clauses, tight slop
    node3 = {"span_near": {
        "clauses": [T("w00004"), T("w00011"), T("w00001")],
        "slop": 12, "in_order": False}}
    _check(spark, pos_ix, toks, node3, require_hits=False)


def test_span_or_not_and_nesting(spark, pos_ix, toks):
    node = {"span_near": {
        "clauses": [
            {"span_or": {"clauses": [T("w00004"), T("w00007")]}},
            T("w00001"),
        ], "slop": 10, "in_order": False}}
    _check(spark, pos_ix, toks, node)

    notq = {"span_not": {
        "include": T("w00004"),
        "exclude": {"span_near": {
            "clauses": [T("w00004"), T("w00001")], "slop": 2,
            "in_order": False}},
    }}
    _check(spark, pos_ix, toks, notq)


def test_span_body_and_topk(spark, pos_ix, toks):
    node = {"span_near": {"clauses": [T("w00004"), T("w00011")],
                          "slop": 6, "in_order": False}}
    want = py_span_scores(toks, node, pos_ix.n_docs, pos_ix.avgdl)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in span_topk(pos_ix, node, k=5).collect()]
    assert [d for d, _ in got] == [d for d, _ in ranked]

    hits = search_hits(pos_ix, {"query": node, "size": 5},
                       positional_ix=pos_ix)
    assert [int(r["doc_id"]) for r in hits.collect()] \
        == [d for d, _ in ranked]

    # absent term -> empty, not an error
    assert _got(span_scores(
        pos_ix, {"span_near": {"clauses": [T("w00004"), T("zzzz")],
                               "slop": 3}})) == {}
    with pytest.raises(ValueError, match="positional"):
        search_hits(pos_ix, {"query": node, "size": 5})


def test_span_within_and_containing(spark, pos_ix, toks):
    # little = a frequent term; big = an unordered near window around it
    big = {"span_near": {"clauses": [T("w00001"), T("w00057")],
                         "slop": 6, "in_order": False}}
    _check(spark, pos_ix, toks,
           {"span_within": {"little": T("w00001"), "big": big}})
    _check(spark, pos_ix, toks,
           {"span_containing": {"little": T("w00001"), "big": big}})
    # scoring side differs between the two: within scores the little
    # term's idf, containing the big tree's
    w = py_span_scores(toks, {"span_within": {"little": T("w00001"),
                                              "big": big}},
                       pos_ix.n_docs, pos_ix.avgdl)
    c = py_span_scores(toks, {"span_containing": {"little": T("w00001"),
                                                  "big": big}},
                       pos_ix.n_docs, pos_ix.avgdl)
    assert set(w) == set(c)          # same matching docs...
    assert any(abs(w[d] - c[d]) > 1e-12 for d in w)  # ...different scores


# ---------------------------------------------------------------------------
# span_multi: multi-term wrapper rewrite
# ---------------------------------------------------------------------------


def _vocab(toks):
    return sorted({t for ts in toks.values() for t in ts})


def test_span_multi_prefix_equals_manual_or(pos_ix, toks):
    # a prefix whose expansion fits under the rewrite cap, so the
    # manual OR and the capped top-df rewrite see the same term set
    pre = "w0000"
    terms = sorted(t for t in _vocab(toks) if t.startswith(pre))
    assert 0 < len(terms) <= 128, "prefix must fit the rewrite cap"
    manual = {"span_or": {"clauses": [
        {"span_term": {"text": t}} for t in terms]}}
    multi = {"span_multi": {"match": {"prefix": {"text": {"value": pre}}}}}
    a = sorted((r["doc_id"], round(r["score"], 9))
               for r in span_scores(pos_ix, manual).collect())
    b = sorted((r["doc_id"], round(r["score"], 9))
               for r in span_scores(pos_ix, multi).collect())
    assert a == b and a


def test_span_multi_inside_near_and_wildcard(pos_ix, toks):
    # a near clause whose second leg is a wildcard expansion
    some_doc = next(ts for ts in toks.values() if len(ts) >= 2)
    t1, t2 = some_doc[0], some_doc[1]
    pat = t2[:-1] + "?" if len(t2) > 1 else t2
    node = {"span_near": {"clauses": [
        {"span_term": {"text": t1}},
        {"span_multi": {"match": {"wildcard": {"text": pat}}}},
    ], "slop": 0, "in_order": True}}
    got = {r["doc_id"] for r in span_scores(pos_ix, node).collect()}
    # every doc with t1 immediately followed by a token matching pat
    import re
    rx = re.compile("^" + pat.replace("?", ".") + "$")
    want = {i for i, ts in toks.items()
            if any(a == t1 and rx.match(b)
                   for a, b in zip(ts, ts[1:]))}
    assert got == want and want


def test_span_multi_no_expansion_poisons_near(pos_ix):
    node = {"span_near": {"clauses": [
        {"span_term": {"text": "w00001"}},
        {"span_multi": {"match": {"prefix": {"text": "zzzznope"}}}},
    ], "slop": 2, "in_order": False}}
    assert span_scores(pos_ix, node).count() == 0
    # but span_or just drops the empty arm
    node2 = {"span_or": {"clauses": [
        {"span_term": {"text": "w00001"}},
        {"span_multi": {"match": {"prefix": {"text": "zzzznope"}}}}]}}
    assert span_scores(pos_ix, node2).count() > 0


def test_span_multi_fuzzy_auto(pos_ix, toks):
    base = next(t for t in _vocab(toks) if len(t) >= 6)
    node = {"span_multi": {"match": {"fuzzy": {
        "text": {"value": base, "fuzziness": 1}}}}}
    got = {r["doc_id"] for r in span_scores(pos_ix, node).collect()}
    assert got >= {i for i, ts in toks.items() if base in ts}


# --- span_field_masking ----------------------------------------------------

MASK_DOCS = [
    (0, "alpha beta gamma", "zeta beta"),
    (1, "alpha gamma beta", "alpha zeta"),
    (2, "beta alpha", "zeta alpha"),
    (3, "gamma gamma", "beta zeta"),
]


@pytest.fixture(scope="module")
def mask_ixs(spark):
    df = spark.createDataFrame(MASK_DOCS,
                               "doc_id long, text string, title string")
    tix = build_positional_index(spark, df, text_col="text",
                                 id_col="doc_id", salt_threshold=60)
    pix = build_positional_index(spark, df, text_col="title",
                                 id_col="doc_id", salt_threshold=60)
    return tix, {"title": pix}


_MASKED = {"span_near": {"clauses": [
    {"span_term": {"text": "alpha"}},
    {"span_field_masking": {"query": {"span_term": {"title": "zeta"}},
                            "field": "text"}},
], "slop": 1, "in_order": True}}


def test_field_masking_cross_field_near(mask_ixs):
    tix, fixs = mask_ixs
    rows = span_scores(tix, _MASKED, field_ixs=fixs).collect()
    assert [r.doc_id for r in rows] == [1]
    # score twin: idf per slot from its OWN field's stats; norms from
    # the reported root field (text); one exact span, gap 0
    idf_sum = idf(4, 3) + idf(4, 4)
    dl, avgdl = 3.0, 2.5
    want = idf_sum * 1.0 / (1.0 + K1 * (1.0 - B + B * dl / avgdl))
    assert math.isclose(rows[0].score, want, rel_tol=1e-9)


def test_cross_field_without_masking_rejected(mask_ixs):
    tix, fixs = mask_ixs
    bad = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"span_term": {"title": "zeta"}},
    ], "slop": 1}}
    with pytest.raises(ValueError, match="span_field_masking"):
        span_scores(tix, bad, field_ixs=fixs).collect()


def test_masked_span_multi_expands_in_leaf_field(mask_ixs):
    tix, fixs = mask_ixs
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"span_field_masking": {
            "query": {"span_multi": {"match": {
                "prefix": {"title": "ze"}}}},
            "field": "text"}},
    ], "slop": 1, "in_order": True}}
    got = {r.doc_id: r.score
           for r in span_scores(tix, q, field_ixs=fixs).collect()}
    want = {r.doc_id: r.score
            for r in span_scores(tix, _MASKED, field_ixs=fixs)
            .collect()}
    assert got == want


def test_unknown_leaf_field_needs_index(mask_ixs):
    tix, _ = mask_ixs
    with pytest.raises(ValueError, match="positional index"):
        span_scores(tix, {"span_term": {"nope": "alpha"}})


def test_intervals_desugar_keys_leaves_by_field(mask_ixs):
    from siem_on_amazon_opensearch_service_spark.index.spans import (
        intervals_to_span,
    )

    tix, fixs = mask_ixs
    node = intervals_to_span({"title": {"match": {"query": "zeta"}}},
                             tix)
    assert node == {"span_term": {"title": "zeta"}}
    # executes against the title positional index via field_ixs
    rows = span_scores(tix, node, field_ixs=fixs).collect()
    assert sorted(r.doc_id for r in rows) == [0, 1, 2, 3]


def test_norms_come_from_reported_field(mask_ixs):
    # title-only tree: dl AND avgdl must both come from the title
    # index (all title docs have dl=2, avgdl_title=2.0 -> ratio 1;
    # mixing text avgdl 2.5 would skew every score)
    tix, fixs = mask_ixs
    rows = span_scores(tix, {"span_term": {"title": "zeta"}},
                       field_ixs=fixs).collect()
    want = idf(4, 4) * 1.0 / (1.0 + K1 * (1.0 - B + B * 2.0 / 2.0))
    for r in rows:
        assert math.isclose(r.score, want, rel_tol=1e-9), r
