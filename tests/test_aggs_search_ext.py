"""Round-3 breadth operators vs pure-Python brute force:

- operators/aggs.py: significant_terms (JLH), rare_terms, composite
  after-key pagination, geotile_grid keys, pipeline aggs over a
  bucket list.
- index/boolquery.py: regexp_topk (dictionary regex expansion),
  term_suggest (did-you-mean).
- index/query.py: search_after deep pagination.
"""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    regexp_topk, term_suggest,
)
from siem_on_amazon_opensearch_service_spark.index.query import (
    bm25_scores, search_after,
)
from siem_on_amazon_opensearch_service_spark.operators.aggs import (
    composite_page, geotile, rare_terms, significant_terms,
    terms_with_other, top_hits, with_pipeline_aggs,
)

N = 300


@pytest.fixture(scope="module")
def data(spark):
    pdf = corpus.make_pages_pdf(N, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    return pdf, sdf


@pytest.fixture(scope="module")
def fix(spark, data):
    _, sdf = data
    ix = build_index(spark, sdf, id_col="doc_id", salt_threshold=40)
    ix.postings = ix.postings.persist()
    ix.term_stats = ix.term_stats.persist()
    ix.postings.count()
    return ix


# ---------------------------------------------------------------------------
# aggs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (i, f"type{i % 7}", f"user{i % 11}", float((i * 37) % 200))
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "id long, event_type string, user_id string, value double"
    ), rows


def test_significant_terms_jlh(events):
    sdf, rows = events
    fg = [r for r in rows if r[3] > 120.0]
    fg_total, bg_total = float(len(fg)), float(len(rows))
    fg_c = Counter(r[1] for r in fg)
    bg_c = Counter(r[1] for r in rows)
    expected = {}
    for key, bgn in bg_c.items():
        fgn = fg_c.get(key, 0)
        fgp, bgp = fgn / fg_total, bgn / bg_total
        if fgn >= 1 and fgp > bgp:
            expected[key] = (fgp - bgp) * (fgp / bgp)
    got = significant_terms(
        sdf, "event_type", F.col("value") > 120.0, size=10
    ).collect()
    assert {r["key"] for r in got} == set(expected)
    for r in got:
        assert r["score"] == pytest.approx(expected[r["key"]], rel=1e-12)
        assert r["fg_count"] == fg_c[r["key"]]
        assert r["bg_count"] == bg_c[r["key"]]
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def _sig_twin(rows, heuristic):
    import math

    fg = [r for r in rows if r[3] > 120.0]
    fg_total, bg_total = float(len(fg)), float(len(rows))
    fg_c = Counter(r[1] for r in fg)
    bg_c = Counter(r[1] for r in rows)
    expected = {}
    for key, bgn in bg_c.items():
        fgn = fg_c.get(key, 0)
        fgp, bgp = fgn / fg_total, bgn / bg_total
        if not (fgn >= 1 and fgp > bgp):
            continue
        a, b = float(fgn), fg_total - fgn
        c, d = bgn - fgn, bg_total - fg_total - (bgn - fgn)
        n = bg_total
        if heuristic == "percentage":
            s = a / bgn
        elif heuristic == "chi_square":
            s = (n * (a * d - b * c) ** 2
                 / ((a + b) * (c + d) * (a + c) * (b + d)))
        elif heuristic == "mutual_information":
            s = 0.0
            for x, px, py in ((a, (a + b) / n, (a + c) / n),
                              (b, (a + b) / n, (b + d) / n),
                              (c, (c + d) / n, (a + c) / n),
                              (d, (c + d) / n, (b + d) / n)):
                if x > 0:
                    s += (x / n) * math.log2((x / n) / (px * py))
        else:  # gnd
            lf1, lf2, lf12 = math.log(bgn), math.log(fg_total), math.log(a)
            g = ((max(lf1, lf2) - lf12)
                 / (math.log(n) - min(lf1, lf2)))
            s = math.exp(-2.0 * g)
        if s > 0:
            expected[key] = s
    return expected


@pytest.mark.parametrize(
    "heuristic", ["percentage", "chi_square", "mutual_information", "gnd"])
def test_significant_terms_heuristics(events, heuristic):
    sdf, rows = events
    expected = _sig_twin(rows, heuristic)
    got = significant_terms(
        sdf, "event_type", F.col("value") > 120.0, size=10,
        heuristic=heuristic,
    ).collect()
    assert {r["key"] for r in got} == set(expected)
    for r in got:
        assert r["score"] == pytest.approx(expected[r["key"]], rel=1e-9)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="unknown significance"):
        significant_terms(sdf, "event_type", F.col("value") > 120.0,
                          heuristic="tfidfish").collect()


def test_rare_terms(events):
    sdf, rows = events
    key = F.concat_ws(":", "event_type", "user_id")
    c = Counter(f"{r[1]}:{r[2]}" for r in rows)
    expected = sorted(
        [(k, n) for k, n in c.items() if n <= 7], key=lambda t: (t[1], t[0])
    )[:10]
    got = [(r["key"], r["n"])
           for r in rare_terms(sdf, key, max_doc_count=7, size=10).collect()]
    assert got == expected


def test_composite_pagination_covers_all_buckets(events):
    sdf, rows = events
    all_buckets = sorted(Counter((r[1], r[2]) for r in rows).items())
    seen, after = [], None
    for _ in range(100):
        page = composite_page(
            sdf, ["event_type", "user_id"], page_size=7, after=after
        ).collect()
        if not page:
            break
        seen.extend(((r["event_type"], r["user_id"]), r["n"]) for r in page)
        after = (page[-1]["event_type"], page[-1]["user_id"])
    assert seen == all_buckets  # in order, no overlap, nothing dropped


def _py_geotile(lat, lon, zoom):
    n = 2 ** zoom
    lat = max(min(lat, 85.0511), -85.0511)
    lat_r = math.radians(lat)
    x = min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1)
    y = int(math.floor(
        (1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r)) / math.pi)
        / 2.0 * n))
    y = max(min(y, n - 1), 0)
    return f"{zoom}/{x}/{y}"


def test_geotile_matches_slippy_map(spark):
    pts = [
        (0.0, 0.0), (51.5074, -0.1278), (-33.8688, 151.2093),
        (85.0511, 179.999), (-85.0511, -180.0), (89.9, 180.0),
        (-89.9, -179.999), (37.7749, -122.4194), (0.0001, -0.0001),
    ]
    sdf = spark.createDataFrame(pts, "lat double, lon double")
    for zoom in (0, 3, 7):
        got = sdf.select(
            "lat", "lon", geotile(F.col("lat"), F.col("lon"), zoom).alias("t")
        ).collect()
        for r in got:
            assert r["t"] == _py_geotile(r["lat"], r["lon"], zoom), (
                r["lat"], r["lon"], zoom)


def test_pipeline_aggs(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    sdf = spark.createDataFrame(
        [(f"b{i:02d}", v) for i, v in enumerate(vals)],
        "bucket string, n double",
    )
    got = with_pipeline_aggs(sdf, "bucket", "n", window_size=3) \
        .orderBy("bucket").collect()
    cum = 0.0
    for i, r in enumerate(got):
        cum += vals[i]
        assert r["cum_sum"] == pytest.approx(cum)
        if i == 0:
            assert r["deriv"] is None
        else:
            assert r["deriv"] == pytest.approx(vals[i] - vals[i - 1])
        lo = max(0, i - 2)
        assert r["moving_avg"] == pytest.approx(
            sum(vals[lo:i + 1]) / (i + 1 - lo))


# ---------------------------------------------------------------------------
# dictionary-expansion queries
# ---------------------------------------------------------------------------


def test_regexp_topk_matches_python(data, fix):
    pdf, _ = data
    pattern = "w0[0-9]*1[0-9]"
    rx = re.compile(f"^(?:{pattern})$")
    expected = sorted(
        r.doc_id for r in pdf.itertuples()
        if any(rx.match(t) for t in tokenize_py(r.text))
    )[:30]
    assert expected  # non-vacuous over the synthetic w-vocab
    got = regexp_topk(fix, pattern, k=30).collect()
    assert [r["doc_id"] for r in got] == expected
    assert all(r["score"] == 1.0 for r in got)


def test_regexp_topk_no_match(fix):
    assert regexp_topk(fix, "zzzzqqq[0-9]+", k=5).count() == 0


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_term_suggest_matches_python(data, fix):
    pdf, _ = data
    df_c = Counter()
    for r in pdf.itertuples():
        df_c.update(set(tokenize_py(r.text)))
    text = "w0001 wx0012"
    got = term_suggest(fix, text, max_edits=2, size=5).collect()
    assert got  # non-vacuous over the synthetic w-vocab
    by_tok = {}
    for r in got:
        by_tok.setdefault(r["token"], []).append(r)
    for token in text.split():
        cand = sorted(
            ((d, -df_c[t], t) for t in df_c
             if (d := _lev(t, token)) <= 2 and t != token),
        )[:5]
        rows = by_tok.get(token, [])
        assert [(r["distance"], -r["df"], r["suggestion"]) for r in rows] \
            == cand
        assert [r["rank"] for r in rows] == list(range(1, len(cand) + 1))


# ---------------------------------------------------------------------------
# search_after
# ---------------------------------------------------------------------------


def test_search_after_continues_ranking(fix):
    scored = bm25_scores(fix, "w00010 w00025")
    full = scored.orderBy(F.desc("score"), F.asc("doc_id")) \
        .limit(30).collect()
    assert len(full) == 30
    cur = full[19]
    page2 = search_after(scored, cur["score"], cur["doc_id"], size=10) \
        .collect()
    assert [(r["doc_id"], r["score"]) for r in page2] \
        == [(r["doc_id"], r["score"]) for r in full[20:30]]
    # no overlap with page 1
    assert not ({r["doc_id"] for r in page2}
                & {r["doc_id"] for r in full[:20]})


# ---------------------------------------------------------------------------
# more_like_this
# ---------------------------------------------------------------------------


def test_more_like_this_matches_python(data, fix):
    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        more_like_this,
    )
    from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

    pdf, _ = data
    oix = OracleIndex.build(
        {int(r.doc_id): r.text for r in pdf.itertuples()})
    seed = 0
    seed_text = pdf.loc[pdf.doc_id == seed, "text"].iloc[0]

    # term selection: tf>=2, df>=2, top 25 by tf*idf then term
    tf_c = Counter(tokenize_py(seed_text))
    cand = [
        (t, n) for t, n in tf_c.items() if n >= 2 and oix.df(t) >= 2
    ]
    n = float(oix.n_docs)
    ranked = sorted(
        cand,
        key=lambda tn: (
            -tn[1] * math.log(
                1 + (n - oix.df(tn[0]) + 0.5) / (oix.df(tn[0]) + 0.5)),
            tn[0],
        ),
    )
    sel = [t for t, _ in ranked[:25]]
    assert len(sel) >= 5  # non-vacuous selection
    msm = int(len(sel) * 0.3)

    from siem_on_amazon_opensearch_service_spark.bm25 import score_py
    scores, nmatch = {}, Counter()
    for t in sel:
        plist = oix.postings.get(t, {})
        for d, tf in plist.items():
            if d == seed:
                continue
            scores[d] = scores.get(d, 0.0) + score_py(
                tf, oix.doclen[d], oix.avgdl, oix.n_docs, len(plist))
            nmatch[d] += 1
    want = sorted(
        ((d, s) for d, s in scores.items() if nmatch[d] >= msm),
        key=lambda kv: (-kv[1], kv[0]),
    )[:12]

    got = more_like_this(
        fix, seed_text, exclude_doc_ids=[seed], k=12).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_more_like_this_empty_input(fix):
    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        more_like_this,
    )

    assert more_like_this(fix, "???", k=5).count() == 0


# ---------------------------------------------------------------------------
# search response features: collapse / function_score / rescore
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oix(data):
    from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

    pdf, _ = data
    return OracleIndex.build({int(r.doc_id): r.text for r in pdf.itertuples()})


def test_collapse_topk(data, fix, oix):
    from siem_on_amazon_opensearch_service_spark.index.query import (
        collapse_topk,
    )

    pdf, _ = data
    q = "w00010 w00025"
    lang = dict(zip(pdf.doc_id.astype(int), pdf.lang))
    full = oix.search(q, k=10**9)
    best = {}
    for d, s in full:  # already (score desc, doc_id asc)
        best.setdefault(lang[d], (d, s))
    want = sorted(best.values(), key=lambda t: (-t[1], t[0]))[:10]
    got = collapse_topk(bm25_scores(fix, q), fix.docs, "lang", k=10).collect()
    assert [(r["doc_id"], r["lang"]) for r in got] \
        == [(d, lang[d]) for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_function_score_modes(data, fix, oix):
    from siem_on_amazon_opensearch_service_spark.index.query import (
        function_score,
    )

    q = "w00010 w00025"
    full = dict(oix.search(q, k=10**9))
    for modifier, fx in [("log1p", lambda v: math.log10(1 + v)),
                         ("sqrt", math.sqrt),
                         ("square", lambda v: v * v),
                         ("none", lambda v: v)]:
        got = function_score(
            bm25_scores(fix, q), fix.docs, "doclen", modifier=modifier,
        ).collect()
        assert len(got) == len(full)
        for r in got:
            want = full[r["doc_id"]] * fx(oix.doclen[r["doc_id"]])
            assert r["score"] == pytest.approx(want, rel=1e-9), modifier
    # sum and replace boost modes
    got = function_score(bm25_scores(fix, q), fix.docs, "doclen",
                         modifier="none", boost_mode="sum").collect()
    for r in got:
        assert r["score"] == pytest.approx(
            full[r["doc_id"]] + oix.doclen[r["doc_id"]], rel=1e-9)
    got = function_score(bm25_scores(fix, q), fix.docs, "doclen",
                         modifier="none", boost_mode="replace").collect()
    for r in got:
        assert r["score"] == pytest.approx(oix.doclen[r["doc_id"]])
    with pytest.raises(ValueError):
        function_score(bm25_scores(fix, q), fix.docs, "doclen",
                       modifier="exp")
    with pytest.raises(ValueError):
        function_score(bm25_scores(fix, q), fix.docs, "doclen",
                       boost_mode="max")


def test_rescore_topk(fix, oix):
    from siem_on_amazon_opensearch_service_spark.index.query import (
        rescore_topk,
    )

    q1, q2, wsz = "w00010 w00025", "w00003 w00040", 25
    prim = oix.search(q1, k=wsz)
    sec = dict(oix.search(q2, k=10**9))
    comb = sorted(
        ((d, 1.5 * s + 0.5 * sec.get(d, 0.0)) for d, s in prim),
        key=lambda kv: (-kv[1], kv[0]),
    )[:8]
    got = rescore_topk(
        bm25_scores(fix, q1), bm25_scores(fix, q2), window_size=wsz,
        query_weight=1.5, rescore_query_weight=0.5, k=8,
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in comb]
    for r, (_, s) in zip(got, comb):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_terms_with_other(events):
    sdf, rows = events
    c = Counter(r[1] for r in rows)
    top = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:3]
    got = terms_with_other(sdf, "event_type", size=3).collect()
    got_top = [(r["event_type"], r["doc_count"])
               for r in got if r["event_type"] != "__other__"]
    assert sorted(got_top) == sorted(top)
    other = [r["doc_count"] for r in got if r["event_type"] == "__other__"]
    assert other == [len(rows) - sum(n for _, n in top)]


def test_top_hits_per_bucket(events):
    sdf, rows = events
    expected = {}
    for r in sorted(rows, key=lambda r: (r[1], -r[3], r[0])):
        expected.setdefault(r[1], []).append(r[0])
    got = top_hits(
        sdf, "event_type", [F.desc("value"), F.asc("id")], size=2,
    ).collect()
    by_key = {}
    for r in sorted(got, key=lambda r: (r["event_type"], r["_rn"])):
        by_key.setdefault(r["event_type"], []).append(r["id"])
    assert by_key == {k: v[:2] for k, v in expected.items()}


def test_top_hits_plan_has_window_group_limit(events):
    sdf, _ = events
    plan = top_hits(
        sdf, "event_type", [F.desc("value"), F.asc("id")], size=2,
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
