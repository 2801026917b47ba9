"""query_string parser + executor: each syntax feature must reproduce
the corresponding engine primitive exactly (same docs, scores 1e-9).

Round 3 extends the grammar to the dashboards' real shapes (reference
saved_objects/each-dashboard/cloudtrail.ndjson query fields):
field:(A OR B) grouped value lists, field:* existence, leading
wildcards, parenthesized boolean grouping, [a TO b] ranges."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    bm25_topk,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    bool_topk,
    fuzzy_topk,
    multiterm_topk,
)
from siem_on_amazon_opensearch_service_spark.index.querystring import (
    FieldLeaf,
    Group,
    TermLeaf,
    parse_query_string,
    query_string_topk,
)

K = 15


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(400, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("qs_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def pos_ix(spark, tmp_path_factory):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        build_positional_index,
    )

    pdf = corpus.make_pages_pdf(400, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    pix = build_positional_index(spark, spark.createDataFrame(pdf),
                                 id_col="doc_id", salt_threshold=60)
    pix.postings = pix.postings.persist()
    pix.term_stats = pix.term_stats.persist()
    return pix


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def assert_same(a, b):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


def flat(g: Group):
    """(occur, kind-or-field, text/value) triples of a one-level tree."""
    out = []
    for occ, c in g.clauses:
        if isinstance(c, TermLeaf):
            out.append((occ, c.kind, c.text, c.boost))
        elif isinstance(c, FieldLeaf):
            out.append((occ, "field:" + c.op, f"{c.field}={c.value}", 1.0))
        else:
            out.append((occ, "group", c, 1.0))
    return out


# -- parser unit tests ------------------------------------------------


def test_parse_shapes():
    g = parse_query_string('+alpha beta^2 -gamma NOT delta lang:en '
                           '-source:src1 pre* fuzz~2 "exact phrase"')
    got = flat(g)
    assert ("must", "term", "alpha", 1.0) in got
    assert ("should", "term", "beta", 2.0) in got
    assert ("must_not", "term", "gamma", 1.0) in got
    assert ("must_not", "term", "delta", 1.0) in got
    assert ("should", "field:exact", "lang=en", 1.0) in got
    assert ("must_not", "field:exact", "source=src1", 1.0) in got
    assert ("should", "prefix", "pre", 1.0) in got
    assert ("should", "fuzzy", "fuzz", 1.0) in got
    assert ("should", "phrase", "exact phrase", 1.0) in got
    fz = [c for _, c in g.clauses
          if isinstance(c, TermLeaf) and c.kind == "fuzzy"][0]
    assert fz.max_edits == 2


def test_parse_and_upgrades_to_must():
    g = parse_query_string("alpha AND beta gamma")
    occ = {c.text: o for o, c in g.clauses}
    assert occ == {"alpha": "must", "beta": "must", "gamma": "should"}


def test_parse_field_value_group():
    g = parse_query_string("eventName:(CreateRoute OR DeleteRoute)")
    assert len(g.clauses) == 1
    occ, sub = g.clauses[0]
    assert occ == "should" and isinstance(sub, Group)
    vals = flat(sub)
    assert ("should", "field:exact", "eventName=CreateRoute", 1.0) in vals
    assert ("should", "field:exact", "eventName=DeleteRoute", 1.0) in vals


def test_parse_existence_and_wildcards():
    g = parse_query_string(
        "userIdentity.type:Root AND NOT userIdentity.invokedBy:* "
        "AND NOT eventType:AwsServiceEvent"
    )
    got = flat(g)
    assert ("must", "field:exact", "userIdentity.type=Root", 1.0) in got
    assert ("must_not", "field:exists", "userIdentity.invokedBy=", 1.0) in got
    assert ("must_not", "field:exact", "eventType=AwsServiceEvent", 1.0) in got

    g2 = parse_query_string(
        "errorCode:*UnauthorizedOperation OR errorCode:AccessDenied*"
    )
    got2 = flat(g2)
    assert ("should", "field:wildcard",
            "errorCode=*UnauthorizedOperation", 1.0) in got2
    assert ("should", "field:wildcard",
            "errorCode=AccessDenied*", 1.0) in got2


def test_parse_parenthesized_grouping():
    g = parse_query_string(
        "eventSource:s3.amazonaws.com AND (eventName:(PutBucketAcl OR "
        "PutBucketPolicy))"
    )
    assert [o for o, _ in g.clauses] == ["must", "must"]
    outer = g.clauses[1][1]
    assert isinstance(outer, Group)
    inner = outer.clauses[0][1]
    assert isinstance(inner, Group)
    assert {c.value for _, c in inner.clauses} == {
        "PutBucketAcl", "PutBucketPolicy"
    }


def test_parse_range():
    g = parse_query_string("doclen:[100 TO 200] ts:{a TO *}")
    r1 = g.clauses[0][1]
    assert (r1.op, r1.lo, r1.hi, r1.lo_incl, r1.hi_incl) == (
        "range", "100", "200", True, True)
    r2 = g.clauses[1][1]
    assert (r2.op, r2.lo, r2.hi, r2.lo_incl) == ("range", "a", None, False)


def test_parse_negated_phrase_carries_occur():
    """ADVICE round-2: '-"exact phrase"' must stay an exclusion, not
    flip into a positive should clause."""
    g = parse_query_string('alpha -"exact phrase"')
    got = flat(g)
    assert ("should", "term", "alpha", 1.0) in got
    assert ("must_not", "phrase", "exact phrase", 1.0) in got


def test_parse_leading_wildcard_term():
    g = parse_query_string("*operation te?m")
    got = flat(g)
    assert ("should", "wildcard", "*operation", 1.0) in got
    assert ("should", "wildcard", "te?m", 1.0) in got


def test_parse_exists_reserved_field():
    """Lucene reserved field: _exists_:name == name:* (both polarity)."""
    g = parse_query_string("_exists_:errorCode AND NOT _exists_:userAgent")
    got = flat(g)
    assert ("must", "field:exists", "errorCode=", 1.0) in got
    assert ("must_not", "field:exists", "userAgent=", 1.0) in got


def test_parse_comparison_shorthand():
    g = parse_query_string("doclen:>=100 AND doclen:<200 ts:>a")
    r1, r2, r3 = (c for _, c in g.clauses)
    assert (r1.op, r1.lo, r1.hi, r1.lo_incl) == ("range", "100", None, True)
    assert (r2.op, r2.lo, r2.hi, r2.hi_incl) == ("range", None, "200", False)
    assert (r3.op, r3.lo, r3.lo_incl) == ("range", "a", False)


def test_parse_backslash_escapes():
    r"""Lucene escaping: \X is the literal character X everywhere --
    in field names, values, and bare terms."""
    g = parse_query_string(r"url\:port:val\*ue \+alpha path:a\:b")
    got = flat(g)
    # escaped colon in the FIELD name; escaped * in the value -> exact
    assert ("should", "field:exact", "url:port=val*ue", 1.0) in got
    # escaped + is part of the term text, not a must modifier
    # (tokenize_py strips punctuation, so the term survives as alpha
    # but with occur=should, not must)
    assert ("should", "term", "alpha", 1.0) in got
    assert ("should", "field:exact", "path=a:b", 1.0) in got

    # unescaped wildcard beside an escaped one stays a wildcard leaf
    g2 = parse_query_string(r"name:ab\*c*")
    leaf = g2.clauses[0][1]
    assert leaf.op == "wildcard" and leaf.value == r"ab\*c*"
    from siem_on_amazon_opensearch_service_spark.index.querystring import (
        _wild_to_like,
    )
    # escaped \* -> literal * (no LIKE escaping needed for *),
    # trailing unescaped * -> %
    assert _wild_to_like(leaf.value) == "ab*c%"


def test_parse_default_operator_and():
    """OpenSearch default_operator=AND: bare adjacency is must; an
    explicit OR demotes the adjacent required items (Lucene classic
    addClause behavior -- prohibited clauses are untouched)."""
    g = parse_query_string("alpha beta", default_operator="AND")
    occ = {c.text: o for o, c in g.clauses}
    assert occ == {"alpha": "must", "beta": "must"}

    g2 = parse_query_string("alpha OR beta gamma -delta",
                            default_operator="AND")
    occ2 = {c.text: o for o, c in g2.clauses}
    assert occ2 == {"alpha": "should", "beta": "should",
                    "gamma": "must", "delta": "must_not"}

    # explicit OR is a no-op under default OR (Lucene parity)
    g3 = parse_query_string("alpha AND beta OR gamma")
    occ3 = {c.text: o for o, c in g3.clauses}
    assert occ3 == {"alpha": "must", "beta": "must", "gamma": "should"}


def test_registry_query_parses_to_expected_shape():
    """The gated ft_query_string entry's actual query: the comparison
    shorthands and _exists_: must land as the same leaf shapes the
    oracle SQL encodes."""
    from siem_on_amazon_opensearch_service_spark.entry_search import (
        _QS_QUERY,
    )

    g = parse_query_string(_QS_QUERY)
    leaves = []

    def walk(n):
        for occ, c in n.clauses:
            if isinstance(c, Group):
                walk(c)
            else:
                leaves.append((occ, c))

    walk(g)
    ranges = [c for _, c in leaves
              if isinstance(c, FieldLeaf) and c.op == "range"]
    # one-sided >=150, <=450 plus the two-sided [150 TO 450]
    assert sorted((r.lo or "", r.hi or "") for r in ranges) == [
        ("", "450"), ("150", ""), ("150", "450")]
    exists = [(occ, c.field) for occ, c in leaves
              if isinstance(c, FieldLeaf) and c.op == "exists"]
    assert ("must", "lang") in exists


# -- executor equivalences -------------------------------------------


def test_duplicate_term_in_should_and_must(ix):
    """'foo +foo': the must gate must not be starved by the should
    duplicate -- docs containing the term qualify, weights add."""
    got = rows(query_string_topk(ix, "w00001 +w00001", k=K))
    assert got, "duplicate should+must term must still match"
    want_members = {d for d, _ in rows(
        query_string_topk(ix, "+w00001", k=K)
    )}
    assert {d for d, _ in got} == want_members


def test_negated_prefix_excludes(ix):
    base = {d for d, _ in rows(query_string_topk(ix, "w00001", k=400))}
    got = {d for d, _ in rows(
        query_string_topk(ix, "w00001 -w0005*", k=400)
    )}
    prefixed = {d for d, _ in rows(
        query_string_topk(ix, "w0005*", k=400)
    )}
    assert got == base - prefixed
    assert got != base  # the exclusion actually fired


def test_filter_only_query_returns_filtered_docs(ix):
    out = query_string_topk(ix, "lang:en", k=10_000)
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    n_en = ix.docs.filter(F.col("lang") == "en").count()
    assert len(res) == n_en > 0
    assert all(r["lang"] == "en" and r["score"] == 1.0 for r in res)


def test_wildcard_filter_value(ix):
    """'w00001 AND lang:e*' matches lang values by prefix (the
    dashboards' eventSource:signin* shape)."""
    out = query_string_topk(ix, "w00001 AND lang:e*", k=400)
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert res and all(r["lang"].startswith("e") for r in res)


def test_bare_terms_equal_bm25(ix):
    got = rows(query_string_topk(ix, "w00001 w00057", k=K))
    want = rows(bm25_topk(ix, "w00001 w00057", k=K))
    assert_same(got, want)


def test_must_and_not(ix):
    got = rows(query_string_topk(ix, "+w00001 w00057 -w00003", k=K))
    want = rows(bool_topk(ix, must=["w00001"], should=["w00057"],
                          must_not=["w00003"], k=K))
    assert_same(got, want)


def test_and_operator(ix):
    got = rows(query_string_topk(ix, "w00001 AND w00057", k=K))
    want = rows(bool_topk(ix, must=["w00001", "w00057"], k=K))
    assert_same(got, want)


def test_boost(ix):
    got = rows(query_string_topk(ix, "w00001^3 w00057", k=K))
    want = rows(bool_topk(ix, should=["w00001", "w00057"], k=K,
                          boosts={"w00001": 3.0}))
    assert_same(got, want)


def test_prefix_only_matches_constant_score(ix):
    got = rows(query_string_topk(ix, "w0000*", k=400))
    want = rows(multiterm_topk(ix, "w0000%", k=400))
    assert {d for d, _ in got} == {d for d, _ in want}
    assert all(s == 1.0 for _, s in got)


def test_leading_wildcard_equals_prefix_family(ix):
    """'*0003' matches exactly the dictionary terms ending 0003 --
    cross-checked against an explicit LIKE over the postings."""
    got = {d for d, _ in rows(query_string_topk(ix, "*0003", k=400))}
    from siem_on_amazon_opensearch_service_spark.index.query import (
        decode_blocks,
    )

    want = {
        r["doc_id"]
        for r in decode_blocks(
            ix.postings.filter(F.col("term").like("%0003"))
        ).select("doc_id").distinct().collect()
    }
    assert got == want and got


def test_fuzzy_equals_fuzzy_topk(ix):
    got = rows(query_string_topk(ix, "w0001~1", k=K))
    want = rows(fuzzy_topk(ix, "w0001", k=K, max_edits=1))
    assert_same(got, want)


def test_phrase_clause(pos_ix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_topk,
    )

    got = rows(query_string_topk(pos_ix, '"w00001 w00057"', k=K,
                                 positional_ix=pos_ix))
    want = rows(phrase_topk(pos_ix, "w00001 w00057", k=K))
    assert_same(got, want)


def test_negated_phrase_excludes(pos_ix):
    base = {d for d, _ in rows(
        query_string_topk(pos_ix, "w00001", k=400, positional_ix=pos_ix)
    )}
    got = {d for d, _ in rows(query_string_topk(
        pos_ix, 'w00001 -"w00001 w00057"', k=400, positional_ix=pos_ix
    ))}
    phrased = {d for d, _ in rows(query_string_topk(
        pos_ix, '"w00001 w00057"', k=400, positional_ix=pos_ix
    ))}
    assert got == base - phrased


def test_field_filter(ix):
    got = query_string_topk(ix, "w00001 AND lang:en", k=400)
    joined = got.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert joined and all(r["lang"] == "en" for r in joined)
    # and equals the unfiltered result restricted to lang=en
    unf = (
        bm25_topk(ix, "w00001", k=400)
        .join(ix.docs.filter(F.col("lang") == "en").select("doc_id"),
              "doc_id", "left_semi")
    )
    assert_same(rows(got), rows(
        unf.orderBy(F.desc("score"), F.asc("doc_id"))
    ))


def test_field_term_is_optional_under_or(ix):
    """Faithful Lucene membership: 'w00001 lang:en' with default OR
    matches w00001 docs PLUS all lang=en docs (filter-context score 0
    for field-only matches)."""
    out = query_string_topk(ix, "w00001 lang:en", k=10_000)
    got = {d for d, _ in rows(out)}
    terms = {d for d, _ in rows(query_string_topk(ix, "w00001", k=10_000))}
    en = {
        int(r["doc_id"])
        for r in ix.docs.filter(F.col("lang") == "en")
        .select("doc_id").collect()
    }
    assert got == terms | en


def test_field_value_group_or(ix):
    """lang:(en OR de) == lang:en OR lang:de, as a must filter."""
    got = rows(query_string_topk(ix, "w00001 AND lang:(en OR de)", k=400))
    en = rows(query_string_topk(ix, "w00001 AND lang:en", k=400))
    de = rows(query_string_topk(ix, "w00001 AND lang:de", k=400))
    merged = sorted(set(en) | set(de), key=lambda t: (-t[1], t[0]))
    assert_same(got, merged)


def test_field_exists_and_negated_exists(ix, spark):
    """field:* existence over a column with NULLs; NOT field:* keeps
    exactly the null rows (the Root-without-invokedBy dashboard
    shape)."""
    docs2 = ix.docs.withColumn(
        "invoked_by",
        F.when(F.col("doc_id") % 3 == 0, F.lit("svc")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    ix2 = PostingsIndex(
        docs=docs2, postings=ix.postings, term_stats=ix.term_stats,
        n_docs=ix.n_docs, avgdl=ix.avgdl,
    )
    have = {d for d, _ in rows(
        query_string_topk(ix2, "+w00001 AND invoked_by:*", k=400)
    )}
    missing = {d for d, _ in rows(
        query_string_topk(ix2, "+w00001 AND NOT invoked_by:*", k=400)
    )}
    base = {d for d, _ in rows(query_string_topk(ix2, "+w00001", k=400))}
    assert have == {d for d in base if d % 3 == 0}
    assert missing == base - have


def test_field_leading_wildcard(ix):
    """url:*host1* -- the errorCode:*UnauthorizedOperation shape."""
    got = query_string_topk(ix, "w00001 AND url:*host1*", k=400)
    res = got.join(ix.docs.select("doc_id", "url"), "doc_id").collect()
    assert res and all("host1" in r["url"] for r in res)
    base = query_string_topk(ix, "w00001", k=400)
    bres = base.join(ix.docs.select("doc_id", "url"), "doc_id").collect()
    assert {r["doc_id"] for r in res} == {
        r["doc_id"] for r in bres if "host1" in r["url"]
    }


def test_field_range(ix):
    got = {d for d, _ in rows(
        query_string_topk(ix, "w00001 AND doclen:[100 TO 200]", k=400)
    )}
    want = {
        int(r["doc_id"])
        for r in query_string_topk(ix, "w00001", k=400)
        .join(ix.docs.filter(
            (F.col("doclen") >= 100) & (F.col("doclen") <= 200)
        ).select("doc_id"), "doc_id", "left_semi").collect()
    }
    assert got == want and got


def test_grouped_boolean_scoring(ix):
    """(a AND b) as a should group: scores a+b only when BOTH match --
    the sub-BooleanQuery scorer semantics."""
    got = dict(rows(query_string_topk(
        ix, "+w00001 (w00057 AND w00003)", k=400
    )))
    base = dict(rows(query_string_topk(ix, "+w00001", k=400)))
    both = dict(rows(query_string_topk(ix, "+w00057 +w00003", k=400)))
    pair = dict(rows(query_string_topk(ix, "w00057 w00003", k=400)))
    assert set(got) == set(base)  # membership: must only
    for d, s in got.items():
        if d in both:  # both present: group contributes its sum
            assert math.isclose(s, base[d] + pair[d], rel_tol=1e-9)
        else:          # group not matched: no partial credit
            assert math.isclose(s, base[d], rel_tol=1e-9)


def test_pure_negative_matches_all_but_excluded(ix):
    """OpenSearch behavior: 'NOT term' alone = match_all minus the
    exclusions, constant-scored."""
    out = rows(query_string_topk(ix, "NOT w00001", k=10_000))
    excl = {d for d, _ in rows(query_string_topk(ix, "w00001", k=10_000))}
    assert {d for d, _ in out} == set(
        int(r["doc_id"]) for r in ix.docs.select("doc_id").collect()
    ) - excl


def test_combined_query(ix):
    """The kitchen sink: must + boosted should + exclusion + prefix +
    grouped filter composes without error and respects every gate."""
    out = query_string_topk(
        ix, "+w00001 w00057^2 -w00003 w0009* +lang:(en OR de)", k=K
    )
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert res and all(r["lang"] in ("en", "de") for r in res)
    excluded = {
        r["doc_id"]
        for r in bm25_topk(ix, "w00003", k=400).collect()
    }
    assert not ({r["doc_id"] for r in res} & excluded)


class TestRound4ReviewFixes:
    """Classic-parser conformance pins from the round-4 review."""

    def test_lowercase_operators_are_terms(self, spark, ix):
        # Lucene classic parser: only UPPERCASE AND/OR/NOT operate
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            parse_query_string)

        g = parse_query_string("not guilty")
        kinds = [(occ, leaf.text) for occ, leaf in g.clauses]
        assert kinds == [("should", "not"), ("should", "guilty")]
        g2 = parse_query_string("NOT guilty")
        assert g2.clauses[0][0] == "must_not"

    def test_star_colon_star_is_match_all(self, spark, ix):
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            query_string_topk)

        n = ix.docs.count()
        got = query_string_topk(ix, "*:*", k=n + 5)
        assert got.count() == n

    def test_bare_star_is_match_all(self, spark, ix):
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            query_string_topk)

        n = ix.docs.count()
        assert query_string_topk(ix, "*", k=n + 5).count() == n

    def test_mixed_bound_range_parses(self, spark):
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            parse_query_string)

        (occ, leaf), = parse_query_string("price:[10 TO 20}").clauses
        assert (leaf.op, leaf.lo, leaf.hi, leaf.lo_incl, leaf.hi_incl) == \
            ("range", "10", "20", True, False)

    def test_group_boost_applies_not_tokenizes(self, spark):
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            parse_query_string)

        g = parse_query_string("(error warning)^2")
        (_occ, grp), = g.clauses
        assert grp.boost == 2.0
        # no spurious '2' term anywhere
        texts = [getattr(c, "text", None) for _o, c in grp.clauses]
        assert "2" not in texts

    def test_percolator_phrase_short_doc_and_slop(self, spark):
        from siem_on_amazon_opensearch_service_spark.index.querystring import (
            parse_query_string, tokens_tree_predicate)

        docs = spark.createDataFrame(
            [(0, ["failed"]),                       # shorter than phrase
             (1, ["failed", "login"]),              # exact
             (2, ["failed", "user", "login"]),      # slop 1
             (3, ["login", "failed"])],             # out of order
            "doc_id long, toks array<string>")
        exact = tokens_tree_predicate(
            parse_query_string('"failed login"'), F.col("toks"))
        slop2 = tokens_tree_predicate(
            parse_query_string('"failed login"~2'), F.col("toks"))
        rows = docs.select("doc_id", exact.alias("e"),
                           slop2.alias("s")).collect()
        got = {r["doc_id"]: (r["e"], r["s"]) for r in rows}
        assert got[0] == (False, False)   # no crash on the short doc
        assert got[1] == (True, True)
        assert got[2] == (False, True)    # one-gap match under slop
        assert got[3] == (False, False)   # order still required

    def test_pure_negative_bool_is_match_all_minus(self, spark, ix):
        from siem_on_amazon_opensearch_service_spark.index.boolquery import (
            bool_topk)

        n = ix.docs.count()
        out = bool_topk(ix, must_not=["w00001"], k=n + 5)
        rows = out.collect()
        assert 0 < len(rows) < n          # something excluded
        assert all(r["score"] == 0.0 for r in rows)
