"""OpenSearch SQL plugin: relational statements vs the DuckDB oracle
(one parser, two backends), relevance statements vs the pure-Python
BM25 oracle through the shared boolean-tree executor."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex
from siem_on_amazon_opensearch_service_spark.sqlplugin import (
    SQLError,
    parse_sql,
    sql_query,
    sql_to_duckdb,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
N = 400
QUERY = "w00034 w00077"

RELATIONAL = [
    "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sv "
    "FROM events WHERE value > 100 GROUP BY event_type "
    "ORDER BY n DESC, event_type LIMIT 5",

    "SELECT user_id, count(*) AS n FROM events "
    "WHERE event_type IN ('click', 'purchase') AND value BETWEEN 10 AND 500 "
    "GROUP BY user_id HAVING count(*) >= 3 ORDER BY user_id",

    "SELECT DISTINCT event_type FROM events "
    "WHERE event_type LIKE 'err%' OR event_type = 'click' "
    "ORDER BY event_type",

    "SELECT upper(event_type) AS k, round(avg(value), 4) AS av, "
    "count(DISTINCT user_id) AS users FROM events "
    "WHERE NOT (value < 50) GROUP BY upper(event_type) ORDER BY k",

    "SELECT event_id, value * 2 + 1 AS v2 FROM events "
    "WHERE user_id <= 3 AND props IS NOT NULL "
    "ORDER BY v2 DESC, event_id LIMIT 10",

    "SELECT event_type, count(*) AS n FROM events "
    "WHERE event_type <> 'click' AND event_type NOT LIKE 'purch%' "
    "GROUP BY event_type ORDER BY event_type",

    # expression over aggregates + HAVING over an aggregate
    "SELECT user_id, round(sum(value) / count(*), 4) AS mean_v "
    "FROM events GROUP BY user_id HAVING sum(value) > 2000 "
    "ORDER BY user_id LIMIT 20",
]


@pytest.fixture(scope="module")
def tables(spark):
    return {"events": spark.read.parquet(EVENTS)}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{EVENTS}'")
    return con


def canon(rows):
    # floats are rounded to 3 decimals for the sort key only; exact
    # comparison happens pairwise with a tolerance (summation order
    # differs between engines, so a round(x, 4) can land on a
    # half-way boundary and flip the last digit)
    return sorted(
        tuple(round(v, 3) if isinstance(v, float) else v for v in r)
        for r in rows
    )


def assert_rows_close(grows, orows, msg=""):
    a, b = canon(grows), canon(orows)
    assert len(a) == len(b), msg
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                assert abs(va - vb) < 2e-3, (msg, ra, rb)
            else:
                assert va == vb, (msg, ra, rb)


@pytest.mark.parametrize("stmt", RELATIONAL)
def test_sql_matches_duckdb(spark, tables, duck, stmt):
    got = sql_query(spark, stmt, tables)
    grows = [tuple(r) for r in got.collect()]
    orows = duck.execute(sql_to_duckdb(stmt)).fetchall()
    assert_rows_close(grows, orows, stmt)


def test_order_limit_is_topk(spark, tables):
    got = sql_query(
        spark,
        "SELECT user_id, count(*) AS n FROM events GROUP BY user_id "
        "ORDER BY n DESC, user_id LIMIT 5",
        tables,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# relevance surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=17)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf, tmp_path_factory):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("sql_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    return OracleIndex.build(
        {i: t for i, t in enumerate(pages_pdf["text"])})


def test_match_topk(spark, ix, oracle):
    got = sql_query(
        spark,
        f"SELECT doc_id, _score FROM pages WHERE match(text, '{QUERY}') "
        "ORDER BY _score DESC, doc_id LIMIT 10",
        {"pages": ix.docs}, ix=ix,
    ).collect()
    want = oracle.search(QUERY, k=10)
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r._score - s) < 1e-9


def test_match_with_relational_filter(spark, ix, oracle, pages_pdf):
    got = sql_query(
        spark,
        f"SELECT doc_id, _score FROM pages WHERE match(text, '{QUERY}') "
        "AND lang = 'en' AND doclen > 20 "
        "ORDER BY _score DESC, doc_id LIMIT 10",
        {"pages": ix.docs}, ix=ix,
    ).collect()
    ranked = oracle.search(QUERY, k=N)
    keep = [
        (d, s) for d, s in ranked
        if pages_pdf["lang"].iloc[d] == "en" and oracle.doclen[d] > 20
    ][:10]
    assert [r.doc_id for r in got] == [d for d, _ in keep]
    for r, (_, s) in zip(got, keep):
        assert abs(r._score - s) < 1e-9


def test_match_group_by(spark, ix, oracle, pages_pdf):
    got = sql_query(
        spark,
        f"SELECT lang, count(*) AS n FROM pages "
        f"WHERE match(text, '{QUERY}') GROUP BY lang ORDER BY lang",
        {"pages": ix.docs}, ix=ix,
    ).collect()
    matched = [d for d, _ in oracle.search(QUERY, k=N)]
    from collections import Counter

    want = Counter(pages_pdf["lang"].iloc[d] for d in matched)
    assert {r.lang: r.n for r in got} == dict(want)


def test_query_string_function(spark, ix, oracle):
    # +w00034 ANDs the term in; the executor is querystring.py itself
    got = sql_query(
        spark,
        "SELECT doc_id, _score FROM pages "
        "WHERE query_string('w00034 w00077') "
        "ORDER BY _score DESC, doc_id LIMIT 10",
        {"pages": ix.docs}, ix=ix,
    ).collect()
    want = oracle.search(QUERY, k=10)
    assert [r.doc_id for r in got] == [d for d, _ in want]


def test_mixed_conjunct_rejected(spark, ix):
    with pytest.raises(SQLError):
        sql_query(
            spark,
            "SELECT doc_id FROM pages "
            "WHERE match(text, 'w00034') OR lang = 'en'",
            {"pages": ix.docs}, ix=ix,
        )


def test_relevance_without_index_rejected(spark, tables):
    with pytest.raises(SQLError):
        sql_query(
            spark,
            "SELECT event_id FROM events WHERE match(props, 'x')",
            tables,
        )


def test_parse_shapes():
    st = parse_sql(
        "SELECT a, count(*) n FROM t WHERE x = 1 AND match(f, 'q') "
        "GROUP BY a HAVING count(*) > 2 ORDER BY n DESC LIMIT 3")
    assert st.table == "t"
    assert st.limit == 3
    assert st.items[1][1] == "n"          # bare alias
    assert st.group_by == [("col", "a")]
    # oracle backend refuses relevance nodes
    with pytest.raises(SQLError):
        sql_to_duckdb(
            "SELECT a FROM t WHERE match(f, 'q')")


def test_sql_round5_parser_fixes():
    """Round-5 pins shared with PPL: one-arg round, literal-only IN."""
    from siem_on_amazon_opensearch_service_spark.sqlplugin import (
        SQLError, sql_to_duckdb)
    assert "round(x)" in sql_to_duckdb("SELECT round(x) FROM t")
    with pytest.raises(SQLError, match="literal"):
        sql_to_duckdb("SELECT a FROM t WHERE a IN (b, 'c')")
