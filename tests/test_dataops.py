"""Training-data operators over the driver's documents/embeddings
tables: dedup family, text analysis, similarity search, multimodal
plumbing."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_sim_processing_a_spark.operators import dedup as D
from geo_sim_processing_a_spark.operators import similarity as S
from geo_sim_processing_a_spark.operators import text as TX
from geo_sim_processing_a_spark.operators.multimodal import (
    extract_media_features, pages_to_media)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    yield df
    df.unpersist()  # don't leak cache-manager state into other modules


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs)
    n_docs = docs.count()
    assert out.count() == docs.select("text").distinct().count()
    assert out.agg(F.sum("n_dups")).collect()[0][0] == n_docs


def test_minhash_detects_planted_dups(spark, docs):
    # plant near-duplicates: copy of doc text with one word changed
    base = docs.limit(20).select("doc_id", "text").collect()
    planted = [(int(r["doc_id"]) + 1_000_000, r["text"] + " extra") for r in base]
    aug = docs.select("doc_id", "text").union(
        spark.createDataFrame(planted, "doc_id long, text string"))
    pairs = D.minhash_lsh_pairs(aug, threshold=0.6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hits = sum(1 for r in base
               if (int(r["doc_id"]), int(r["doc_id"]) + 1_000_000) in found)
    assert hits >= 16  # high recall on trivially-near dups


def test_simhash_pairs_on_dups(spark, docs):
    base = docs.limit(10).select("doc_id", "text").collect()
    planted = [(int(r["doc_id"]) + 1_000_000, r["text"]) for r in base]
    aug = docs.select("doc_id", "text").union(
        spark.createDataFrame(planted, "doc_id long, text string"))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_pairs(aug).collect()}
    for r in base:
        key = (int(r["doc_id"]), int(r["doc_id"]) + 1_000_000)
        assert pairs.get(key) == 0  # identical text -> hamming 0


def test_text_features(spark, docs):
    out = TX.with_text_features(docs)
    rows = out.select("doc_id", "text", "lang_pred", "n_tokens", "quality", "fp").collect()
    for r in rows[:50]:
        assert r["n_tokens"] == len(r["text"].split())
        assert 0.0 <= r["quality"] <= 1.0
        assert len(r["fp"]) == 32


def test_brute_topk_matches_numpy(spark, emb):
    vecs = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in vecs])
    mat = np.array([r["embedding"] for r in vecs], dtype=np.float64)
    queries = spark.createDataFrame(
        [(int(ids[i]), [float(x) for x in mat[i]]) for i in range(3)],
        "qid long, qvec array<double>")
    out = S.brute_topk(emb, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    norms = np.linalg.norm(mat, axis=1)
    for qi in range(3):
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = np.lexsort((ids, -np.round(cos, 12)))[:5]
        exp = [(r + 1, int(ids[order[r]])) for r in range(5)]
        assert sorted(got[int(ids[qi])]) == exp


def test_lsh_near_dup_finds_self_dups(spark, emb):
    dim = len(emb.select("embedding").first()[0])
    # plant exact duplicate vectors
    dup = emb.limit(5).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    aug = emb.select("vec_id", "embedding").union(dup)
    pairs = {(r["id_a"], r["id_b"]) for r in
             S.lsh_self_near_dup(aug, dim, threshold=0.999).collect()}
    base_ids = [r["vec_id"] for r in emb.limit(5).collect()]
    for b in base_ids:
        assert (b, b + 100000) in pairs


def test_ivf_topk_recall(spark):
    """IVF ANN recall@5 vs exact brute force on clustered vectors:
    probing half the lists must recover >= 90% of true neighbors."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.similarity import brute_topk, ivf_topk

    rng = []
    dim = 8
    # 8 well-separated cluster centers, 40 points each (splitmix-ish
    # deterministic offsets)
    x = 0x12345
    for i in range(320):
        c = i % 8
        base = [(1.0 if j == c else 0.1) for j in range(dim)]
        vec = []
        for j in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
            vec.append(base[j] + ((x >> 33) / 2**31 - 0.5) * 0.05)
        rng.append((i, [float(v) for v in vec]))
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rng],
                        "embedding": [r[1] for r in rng]})
    vecs = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    queries = (vecs.where("vec_id % 40 = 0")
               .selectExpr("vec_id as qid", "embedding as qvec"))
    exact = {(r["qid"], r["vec_id"])
             for r in brute_topk(vecs, queries, k=5).collect()}
    approx = {(r["qid"], r["vec_id"])
              for r in ivf_topk(vecs, queries, k=5, dim=dim,
                                n_lists=8, nprobe=4).collect()}
    assert len(approx) == len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_multimodal_real_decode(spark):
    """Media blobs are REAL encoded BMP/WAV bytes; the feature kernel
    decodes them with the pure-NumPy codecs — no error rows, correct
    dimensions, deterministic values."""
    from geo_sim_processing_a_spark.sources.spark_pages import build_pages
    pages = build_pages(spark, 50, partitions=2)
    media = pages_to_media(pages)
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    kinds = {r["media_type"] for r in feats}
    assert kinds == {"image", "audio"}
    for r in feats:
        assert r["error"] is None, r["error"]
        assert len(r["feature"]) == 16
        if r["media_type"] == "image":
            assert (r["width"], r["height"]) == (8, 8)
    # corrupt/unsupported rows are quarantined, not task failures
    import pandas as pd
    bad = spark.createDataFrame(
        pd.DataFrame({"url": ["b1", "b2"],
                      "blob": [b"\x89PNG\r\n", b"BM\x00\x01"]}),
        "url string, blob binary")
    rows = {r["url"]: r for r in extract_media_features(bad).collect()}
    assert rows["b1"]["error"] is not None and "unsupported" in rows["b1"]["error"]
    assert rows["b2"]["error"] is not None


def test_codecs_roundtrip_and_resize():
    from geo_sim_processing_a_spark.functions.codecs import (
        decode_bmp, decode_wav, encode_bmp, encode_wav, resize_nearest)
    rng = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_bmp(encode_bmp(rng)), rng)
    big = resize_nearest(rng, 10, 14)
    assert big.shape == (10, 14, 3)
    assert np.array_equal(big[::2][:, ::2], rng)  # nearest keeps originals
    samples = (np.sin(np.arange(300) / 7.0) * 12345).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_frame_sample_plan_flat_schema(spark):
    """frame_sample_plan works against the module's OWN MEDIA_SCHEMA
    (it once read a meta struct nothing produces): zero-duration rows
    (images) emit nothing; duration-bearing rows emit one frame per
    interval including ts 0."""
    from geo_sim_processing_a_spark.operators.multimodal import frame_sample_plan
    import pandas as pd
    media = spark.createDataFrame(
        pd.DataFrame({"url": ["img", "vid"],
                      "media_type": ["image", "video"],
                      "duration_ms": [0, 3500]}),
        "url string, media_type string, duration_ms int")
    rows = sorted((r["url"], r["frame_ts_ms"])
                  for r in frame_sample_plan(media, every_ms=1000).collect())
    assert rows == [("vid", 0), ("vid", 1000), ("vid", 2000), ("vid", 3000)]
