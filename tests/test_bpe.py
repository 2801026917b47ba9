"""BPE tokenizer apply: trainer determinism, encode correctness vs the
pure-Python twin, round-trip property, and packing composition."""

import pytest

from siem_on_amazon_opensearch_service_spark.operators.bpe import (
    EOW, bpe_encode, bpe_train, py_bpe_encode,
)

TRAIN = [
    "low lower lowest low low",
    "new newer newest new new",
    "the lower the newer the better",
]


@pytest.fixture(scope="module")
def merges():
    return bpe_train(TRAIN, n_merges=30)


def test_trainer_is_deterministic():
    assert bpe_train(TRAIN, 30) == bpe_train(TRAIN, 30)


def test_encode_learns_frequent_subwords(merges):
    toks = py_bpe_encode("low lower", merges)
    # 'low' appears often -> becomes one (or two) units, never 3 chars
    assert f"low{EOW}" in toks
    assert all(t for t in toks)


def test_roundtrip_property(merges):
    # concatenated tokens minus EOW reproduce the pretoken stream
    for text in TRAIN + ["unseen wordz 42 lowestest"]:
        toks = py_bpe_encode(text, merges)
        joined = "".join(toks).replace(EOW, " ").split()
        import re

        from siem_on_amazon_opensearch_service_spark.operators.textstats \
            import BPE_ISH_PATTERN
        want = re.findall(BPE_ISH_PATTERN, text.lower())
        assert joined == want, (text, toks)


def test_distributed_encode_matches_twin(spark, merges):
    rows = [(i, t) for i, t in enumerate(
        TRAIN + ["", None, "lowest newest 123 !?"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_encode(df, merges).collect()}
    for i, t in rows:
        want = py_bpe_encode(t or "", merges)
        assert got[i] == (want, len(want)), (i, t)


def test_composes_with_packing(spark, merges):
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(TRAIN * 4)],
        "doc_id long, text string, lang string")
    enc = bpe_encode(df, merges).withColumnRenamed("id", "doc_id") \
        .join(df.select("doc_id", "lang"), "doc_id")
    packed = pack_sequences(enc, "n_tokens", budget=16, shard_col="lang")
    rows = packed.collect()
    assert rows and all(r["pack_id"] >= 0 for r in rows)


def test_duckdb_replace_chain_twin_handles_adjacent_repeat_pairs():
    """The oracle's rank-order replace chain must match the GPT-2
    encoder on words where the SAME merge pair occurs back-to-back
    ('tata' under (t,a)): with a single shared separator the first
    replace() match consumes the separator the second occurrence
    needs, silently skipping it — hence the per-symbol double-wrap
    encoding. Adversarial words pinned here."""
    import duckdb

    from siem_on_amazon_opensearch_service_spark.entry_curation import (
        _BPE_MERGES, _bpe_toks_duck)
    from siem_on_amazon_opensearch_service_spark.operators.bpe import (
        py_bpe_encode)

    words = ["tatami", "tata", "aaa", "table tables tata",
             "spark sparkspark", "the theta fast fasta value tavalue",
             "ta ta ta", "t a b", "tath", "sptata"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
        + ") t(doc_id, text)")
    rows = con.execute(
        f"SELECT doc_id, {_bpe_toks_duck('text')} FROM documents "
        "ORDER BY doc_id").fetchall()
    for i, toks in rows:
        assert toks == py_bpe_encode(words[i], _BPE_MERGES), words[i]
