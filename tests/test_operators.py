"""Semantic tests for the curation operators: planted duplicates,
LSH recall, SimHash locality, ANN recall, text analysis, multimodal
plumbing."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import (
    dedup, multimodal, similarity, textstats,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat near the river bank"),  # near dup of 0
    (3, "completely different content about spark dataframes and shuffles"),
    (4, "THE  Quick   Brown FOX jumps over the lazy dog near the river bank"),  # normalized dup of 0
    (5, "short doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_stats_and_survivors(docs):
    row = dedup.exact_dup_stats(docs).collect()[0]
    assert row["n_docs"] == 6
    assert row["n_distinct"] == 4       # {0,1,4}, {2}, {3}, {5}
    assert row["n_dup_groups"] == 1
    assert row["n_removable"] == 2
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 5]         # lowest id survives per group


def test_minhash_lsh_candidates(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    # exact dups share every band and every signature
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 4)] == 1.0 and pairs[(1, 4)] == 1.0
    # near dup (one token changed) must be a candidate with high estimate
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    # unrelated docs are not candidates
    assert not any(3 in p or 5 in p for p in pairs)


def test_jaccard_matches_python(docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs).collect()
    }

    def sh(text):
        toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    texts = dict(DOCS)
    for (a, b), j in got.items():
        sa, sb = sh(texts[a]), sh(texts[b])
        exp = len(sa & sb) / len(sa | sb)
        assert math.isclose(j, round(exp, 4), abs_tol=1e-9), (a, b)
    assert got[(0, 1)] == 1.0
    # doc 5 has < 3 tokens -> no shingles -> excluded entirely
    assert not any(5 in p for p in got)


def _py_simhash(text):
    toks = {t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t}
    val = 0
    for p in range(16):
        s = sum(
            1 if hashlib.md5(t.encode()).hexdigest()[p] in "89abcdef" else -1
            for t in toks
        )
        if s > 0:
            val |= 1 << p
    return val


def test_simhash_matches_python_and_locality(docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(docs).collect()}
    for i, text in DOCS:
        assert got[i] == _py_simhash(text), i
    assert got[0] == got[1] == got[4]           # identical token sets
    ham = bin(got[0] ^ got[2]).count("1")
    assert ham <= 4                              # near dup: few bits flip


def test_embedding_cosine_pairs(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.001, 0.0]),   # ~identical
            (2, [0.0, 1.0, 0.0]),     # orthogonal
            (3, [-1.0, 0.0, 0.0]),    # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_dup_pairs(vecs, threshold=0.9).collect()
    }
    assert list(pairs) == [(0, 1)] and pairs[(0, 1)] > 0.999


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16))
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + rng.normal(scale=0.15, size=16)
        rows.append((i, [float(x) for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_matches_numpy(clustered_vecs):
    rows, vdf = clustered_vecs
    q = rows[7][1]
    got = [r["vec_id"] for r in similarity.cosine_topk(vdf, q, k=10).collect()]
    m = np.array([v for _, v in rows])
    qv = np.array(q)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    exp = [int(i) for i in sorted(range(len(rows)), key=lambda i: (-cos[i], i))[:10]]
    assert got == exp


def test_ivf_topk_recall(clustered_vecs):
    rows, vdf = clustered_vecs
    q = rows[7][1]
    cents = similarity.make_centroids(vdf, 16)
    approx = [r["vec_id"] for r in similarity.ivf_topk(vdf, cents, q, k=10, nprobe=4).collect()]
    exact = [r["vec_id"] for r in similarity.cosine_topk(vdf, q, k=10).collect()]
    recall = len(set(approx) & set(exact)) / 10
    assert recall >= 0.6, (recall, approx, exact)
    # every probed result is in a probed cell by construction: sanity
    assert len(approx) == 10


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 10)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10, 12: 10}


def test_kmeans_improves_ivf_recall(clustered_vecs):
    rows, vdf = clustered_vecs
    q = rows[7][1]
    exact = [r["vec_id"] for r in similarity.cosine_topk(vdf, q, k=10).collect()]
    cents = similarity.kmeans_fit(vdf, 8, n_iter=3)
    assert cents.count() == 8
    approx = [
        r["vec_id"]
        for r in similarity.ivf_topk(vdf, cents, q, k=10, nprobe=2).collect()
    ]
    recall = len(set(approx) & set(exact)) / 10
    # 8 trained centroids on 8 true clusters, probing 2: the query's
    # cluster must be found -> high recall even at nprobe=2
    assert recall >= 0.8, (recall, approx, exact)


def test_lang_id(spark):
    samples = spark.createDataFrame(
        [
            (0, "the cat is in the hat and it is big"),
            (1, "der hund ist nicht auf der wiese und das ist gut"),
            (2, "le chat est dans la maison et il est pour les enfants"),
            (3, "el perro es una mascota y los gatos no son para todos"),
            (4, "xyzzy plugh qwq zot"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(samples).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat with a big red hat today ok")],
        "doc_id long, text string",
    )
    r = textstats.quality_features(df).collect()[0]
    assert r["n_tokens"] == 13
    assert r["stopword_ratio"] == round(3 / 13, 4)  # the, the, a
    assert r["quality_score"] > 0.5


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "Hello, world! x2 done...")], "doc_id long, text string"
    )
    r = textstats.token_counts(df).collect()[0]
    assert r["ws_tokens"] == 4
    # Hello , world ! x 2 done . . .
    assert r["bpe_tokens"] == 10
    assert r["analyzer_tokens"] == 4  # hello world x2 done


def test_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma  BETA alpha"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.fingerprint(df).collect()}
    assert rows[0]["fp_exact"] != rows[1]["fp_exact"]   # order-sensitive
    assert rows[0]["fp_bag"] == rows[1]["fp_bag"]       # bag-identical
    assert rows[0]["fp_bag"] != rows[2]["fp_bag"]


def test_multimodal_sniff_and_features(spark):
    payloads = [
        (0, bytes.fromhex("89504E47") + b"xxdata"),
        (1, bytes.fromhex("FFD8FF") + b"jpegdata"),
        (2, b"plain bytes here"),
        (3, b""),
    ]
    df = spark.createDataFrame(payloads, "media_id long, media binary")
    meta = {r["media_id"]: r for r in multimodal.media_metadata(df).collect()}
    assert meta[0]["fmt"] == "png" and meta[1]["fmt"] == "jpeg"
    assert meta[2]["fmt"] == "unknown"
    assert meta[0]["n_bytes"] == 10

    feats = {r["media_id"]: r for r in multimodal.extract_features(df).collect()}
    assert feats[3]["fmt"] == "error"               # empty payload path
    assert len(feats[0]["feature"]) == 8
    w, h, pix = multimodal.decode_image_stub(payloads[0][1])
    assert feats[0]["width"] == w and feats[0]["height"] == h
    exp0 = [
        float(np.float32(b.mean())) for b in
        np.array_split(pix.ravel().astype(np.float64), 8)
    ]
    assert [round(x, 4) for x in feats[0]["feature"]] == [round(x, 4) for x in exp0]


def test_verify_candidates_jaccard(spark, docs):
    cand = spark.createDataFrame([(0, 2), (0, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.verify_candidates_jaccard(docs, cand).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs).collect()
    }
    assert got[(0, 2)] == full[(0, 2)]
    assert got[(0, 3)] == full[(0, 3)]


def test_ivf_materialized_prunes_partitions(clustered_vecs, tmp_path, spark):
    """The materialized IVF layout: ivf_save writes partitionBy(cell);
    a query must (a) return exactly the recompute-path result and
    (b) physically read ONLY the nprobe probed cells' files."""
    import re

    rows, vdf = clustered_vecs
    q = rows[7][1]
    cents = similarity.make_centroids(vdf, 16)
    path = str(tmp_path / "ivf")
    similarity.ivf_save(vdf, cents, path)

    got = similarity.ivf_topk_materialized(
        spark, path, cents, q, k=10, nprobe=4
    )
    want = similarity.ivf_topk(vdf, cents, q, k=10, nprobe=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]

    # partition pruning is physical: the literal cell IN (...) must
    # reach the scan as a PartitionFilter (directory-level pruning),
    # and the layout really is one directory per cell.
    probed = set(similarity.probe_cells(cents, q, nprobe=4))
    cand = spark.read.parquet(path).filter(F.col("cell").isin(list(probed)))
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted"
    )
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1) and "IN" in pf.group(1), plan
    on_disk = {
        int(m.group(1))
        for f in spark.read.parquet(path).inputFiles()
        for m in [re.search(r"cell=(\d+)", f)]
        if m
    }
    assert probed < on_disk and len(on_disk) == 16


def test_ivf_topk_accepts_precomputed_assignment(clustered_vecs, spark):
    """ivf_topk(assign=...) must skip the per-query recompute and
    return identical results."""
    rows, vdf = clustered_vecs
    q = rows[3][1]
    cents = similarity.make_centroids(vdf, 16)
    assign = similarity.ivf_assign(vdf, cents)
    got = similarity.ivf_topk(vdf, cents, q, k=10, nprobe=4,
                              assign=assign).collect()
    want = similarity.ivf_topk(vdf, cents, q, k=10, nprobe=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]


def test_multimodal_resize_nearest_neighbor(spark):
    payloads = [(0, bytes(range(256)) * 3), (1, b"short"), (2, b"")]
    df = spark.createDataFrame(payloads, "media_id long, media binary")
    got = {r["media_id"]: r
           for r in multimodal.resize_images(df, 8, 6).collect()}
    assert 2 not in got                       # empty payload dropped
    for mid in (0, 1):
        w, h, pix = multimodal.decode_image_stub(payloads[mid][1])
        ys = np.minimum((np.arange(6) * h / 6).astype(int), h - 1)
        xs = np.minimum((np.arange(8) * w / 8).astype(int), w - 1)
        want = pix[np.ix_(ys, xs)].astype(np.float32).ravel()
        r = got[mid]
        assert (r["width"], r["height"]) == (8, 6)
        assert list(map(float, r["pixels"])) == [float(v) for v in want]


def test_multimodal_frame_sampling(spark):
    # 10 "frames" of 256 bytes; sample 4 evenly spaced, decode ONLY those
    payload = bytes(range(256)) * 10
    df = spark.createDataFrame([(0, payload), (1, b"tiny")],
                               "media_id long, media binary")
    rows = multimodal.sample_frames(df, n_sample=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    f0 = sorted(r["frame_idx"] for r in by_media[0])
    want = sorted({int((i + 0.5) * 10 / 4) for i in range(4)})
    assert f0 == want
    assert all(r["n_frames"] == 10 for r in by_media[0])
    # a sub-frame payload still yields its single frame 0
    assert [r["frame_idx"] for r in by_media[1]] == [0]
    # features recompute from the sliced frame bytes
    r1 = next(r for r in by_media[0] if r["frame_idx"] == want[0])
    chunk = payload[want[0] * 256:(want[0] + 1) * 256]
    _w, _h, pix = multimodal.decode_image_stub(chunk)
    exp = [float(np.float32(b.mean() if b.size else 0.0)) for b in
           np.array_split(pix.ravel().astype(np.float64), 8)]
    assert [round(float(x), 4) for x in r1["feature"]] == \
        [round(x, 4) for x in exp]


def test_connected_components_string_ids(spark):
    """Round-4 fix: the convergence signal must be type-generic — a
    chain of string ids (URL hashes, UUIDs) crashed the decimal-sum
    signal under ANSI and mis-converged with ANSI off."""
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        connected_components)

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string")
    comp = {r["id"]: r["comp"]
            for r in connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x"}


def test_connected_components_raises_past_max_iter(spark):
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        connected_components)

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with __import__("pytest").raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)
    # and enough rounds converges the same chain
    comp = {r["id"]: r["comp"]
            for r in connected_components(chain, max_iter=10).collect()}
    assert set(comp.values()) == {0}


def test_verify_jaccard_zero_union_pair(spark):
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        verify_candidates_jaccard)

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "x y")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = verify_candidates_jaccard(docs, pairs).collect()
    assert rows[0]["jaccard"] == 0.0  # no ANSI DIVIDE_BY_ZERO


def test_stratified_sample_null_stratum_uses_default(spark):
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        stratified_sample)

    df = spark.createDataFrame(
        [("en", "k1"), (None, "k2"), ("fr", "k3")],
        "lang string, key string")
    kept = {r["key"] for r in stratified_sample(
        df, "lang", {"en": 1.0}, "key", default=1.0).collect()}
    assert kept == {"k1", "k2", "k3"}  # NULL stratum kept via default
    # and a None key in fractions targets the NULL stratum directly
    kept2 = {r["key"] for r in stratified_sample(
        df, "lang", {None: 1.0}, "key", default=0.0).collect()}
    assert kept2 == {"k2"}


def test_mixture_sample_null_source(spark):
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        mixture_sample)

    df = spark.createDataFrame(
        [(None if i % 3 == 0 else f"s{i % 2}", f"k{i}")
         for i in range(60)], "src string, key string")
    out = mixture_sample(df, "src", "key", budget=60)  # keep-all rates
    assert out.count() == 60  # no TypeError on the None stratum


def test_shard_id_balance_non_power_of_16(spark):
    """96 shards on 256 hash buckets skewed 3/256 vs 2/256 (~50%);
    with 65536 buckets the spread must be tight."""
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        shard_id)

    df = spark.range(0, 20000).selectExpr("CAST(id AS STRING) AS k")
    sizes = [r["n"] for r in df.select(shard_id("k", 96).alias("s"))
             .groupBy("s").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 96
    avg = sum(sizes) / len(sizes)
    assert max(sizes) < 1.5 * avg and min(sizes) > 0.6 * avg
