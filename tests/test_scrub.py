"""Cross-engine tests for corpus scrubbing operators (operators/scrub.py):
PII redaction, URL canonicalization, boilerplate line removal —
Spark result vs the DuckDB twin vs hand-computed expectations."""

import duckdb
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import scrub


def test_redact_pii_cross_engine(spark):
    rows = [
        (0, "mail me at Bob.Smith+x@Example.COM today"),
        (1, "server 10.1.2.3 and 192.168.0.255 up; call 555-123-9999"),
        (2, "no pii here at all"),
        (3, "a@b.io b@c.org 1.2.3.4 555-000-1111 555-000-2222"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in scrub.redact_pii(df).orderBy("doc_id").collect()
    }
    assert got[0]["text_redacted"] == "mail me at <EMAIL> today"
    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (1, 0, 0)
    assert got[1]["text_redacted"] == "server <IP> and <IP> up; call <PHONE>"
    assert got[2]["text_redacted"] == "no pii here at all"
    assert (got[3]["n_email"], got[3]["n_ip"], got[3]["n_phone"]) == (2, 1, 2)

    con = duckdb.connect()
    red, counts = scrub.duckdb_redact_sql("text")
    docs = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
    )
    oracle = con.execute(
        f"SELECT doc_id, {red} AS r, {counts[0]} AS e, {counts[1]} AS i,"
        f" {counts[2]} AS p FROM ({docs}) ORDER BY doc_id"
    ).fetchall()
    for (doc_id, r, e, i, p) in oracle:
        g = got[doc_id]
        assert r == g["text_redacted"]
        assert (e, i, p) == (g["n_email"], g["n_ip"], g["n_phone"])


def test_canonical_url_cross_engine(spark):
    urls = [
        "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "http://site.org:80/path/",
        "https://host.net/?fbclid=abc&ref=tw",
        "https://host.net/x?z=9&utm_campaign=c&gclid=1&y=8",
        "http://plain.example.com/keep:80",
    ]
    expect = [
        "https://news.example.com/a/b?a=1&b=2",
        "http://site.org/path",
        "https://host.net",
        "https://host.net/x?y=8&z=9",
        "http://plain.example.com/keep:80",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["i", "url"])
    got = [
        r["c"]
        for r in df.select(scrub.canonical_url("url").alias("c"), "i")
        .orderBy("i").collect()
    ]
    assert got == expect

    con = duckdb.connect()
    docs = " UNION ALL ".join(
        f"SELECT {i} AS i, '{u}' AS url" for i, u in enumerate(urls)
    )
    oracle = [
        r[0]
        for r in con.execute(
            f"SELECT {scrub.duckdb_canonical_url_sql('url')} FROM ({docs})"
            " ORDER BY i"
        ).fetchall()
    ]
    assert oracle == expect


def test_strip_boilerplate_cross_engine(spark):
    boiler = "subscribe to our newsletter"
    rows = []
    for i in range(10):
        lines = [f"unique body {i}"]
        if i % 2 == 0:
            lines.append(boiler)          # in 50% of docs -> dropped
        if i % 5 == 0:
            lines.append("rare footer")   # in 20% of docs -> kept
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in scrub.strip_boilerplate(df, max_df_ratio=0.3).collect()
    }
    assert len(out) == 10
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["text_clean"] == "unique body 0\nrare footer"
    assert out[1]["text_clean"] == "unique body 1"
    assert out[2]["text_clean"] == "unique body 2"  # boiler stripped

    con = duckdb.connect()
    docs = " UNION ALL ".join(
        "SELECT {} AS doc_id, '{}' AS text".format(i, t.replace("\n", "' || chr(10) || '"))
        for i, t in rows
    )
    sql = scrub.duckdb_strip_boilerplate_sql(docs, max_df_ratio=0.3)
    for doc_id, n_lines, n_kept, text_clean in con.execute(sql).fetchall():
        g = out[doc_id]
        assert (n_lines, n_kept, text_clean) == (
            g["n_lines"], g["n_kept"], g["text_clean"]
        )


def test_strip_boilerplate_all_boiler_doc(spark):
    # a doc made ENTIRELY of boilerplate survives with empty text
    rows = [(i, "every doc has this line") for i in range(4)]
    rows.append((4, "every doc has this line\nbut i also say more"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in scrub.strip_boilerplate(df, max_df_ratio=0.5).collect()
    }
    assert len(out) == 5
    assert out[0]["n_kept"] == 0 and out[0]["text_clean"] == ""
    assert out[4]["n_kept"] == 1 and out[4]["text_clean"] == "but i also say more"
