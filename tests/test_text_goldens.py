"""Determinism lock (FIXTURES.md G5.6): extracted text for the first
100 doc ids is byte-identical to checked-in goldens — catches any
accidental drift of the generator or the extractor."""

import hashlib
import json
import os

import numpy as np

from geo_sim_processing_a_spark.sources.pages import (
    extract_text_bytes, generate_pages_pdf)

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "text_goldens.json")


def current_digests():
    pdf = generate_pages_pdf(np.arange(100))
    out = {}
    for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
        extracted = extract_text_bytes(html)
        assert extracted == text  # byte-identity per url (input_hint)
        out[url] = hashlib.md5(extracted.encode("utf-8")).hexdigest()
    return out


def test_text_goldens():
    got = current_digests()
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=0, sort_keys=True)
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert got == golden


def test_winnow_guarantee_and_disjoint():
    """Winnowing guarantee: any shared substring of length >= w+k-1
    yields a shared fingerprint; fully-disjoint alphabets share none."""
    from geo_sim_processing_a_spark.operators.text import winnow_fingerprints_py

    k, w = 8, 16
    common = "the quick brown fox jumps over the lazy dog tail"  # 49 >= w+k-1
    a = "prefix one " + common + " suffix alpha"
    b = "other start " + common + " different end"
    fa = set(winnow_fingerprints_py(a, k, w))
    fb = set(winnow_fingerprints_py(b, k, w))
    assert fa & fb, "shared long substring must share a fingerprint"
    c = "zzzzyyyyxxxxwwwwvvvvuuuuttttssss"
    d = "0000111122223333444455556666"
    assert not (set(winnow_fingerprints_py(c, k, w))
                & set(winnow_fingerprints_py(d, k, w)))
    # deterministic + short-input safe
    assert winnow_fingerprints_py(a, k, w) == winnow_fingerprints_py(a, k, w)
    assert len(winnow_fingerprints_py("ab", k, w)) == 1
    assert winnow_fingerprints_py("", k, w)


def test_winnow_near_dup_spark(spark):
    """Planted near-dups (long shared substring) are found; unrelated
    docs are not paired."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.text import winnow_near_dup_pairs

    common = ("the quick brown fox jumps over the lazy dog while the "
              "cat watches from the warm windowsill every single day")
    rows = [(0, "intro " + common + " outro"),
            (1, "different head " + common + " different tail"),
            (2, "completely unrelated text about spark shuffles and "
                "partition pruning strategies with zero overlap here"),
            (3, "another separate document mentioning geometry kernels "
                "and chordal axis skeletons only")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]),
                                 "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             winnow_near_dup_pairs(docs, min_shared=3).collect()}
    assert (0, 1) in pairs
    assert (2, 3) not in pairs


def test_bpe_token_count_matches_reference(spark):
    """BPE-ish regex count equals a hand count on known strings."""
    import pandas as pd
    import re
    from geo_sim_processing_a_spark.operators.text import (
        BPE_TOKEN_PATTERN_SQL, bpe_token_count)

    texts = ["Hello, world! 42 times.", "a+b=c", "  spaced   out  ",
             "unicode naïve café 3.14", ""]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf, "i long, text string")
    got = {r["i"]: r["n"] for r in
           df.select("i", bpe_token_count(__import__("pyspark.sql.functions",
                     fromlist=["col"]).col("text")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPE_TOKEN_PATTERN_SQL, t)), (i, t)


def test_tfidf_keywords_semantics(spark):
    """Hand-checkable corpus: a term in every doc scores 0; the most
    distinctive term ranks first; rounded-score ties break by term."""
    import math
    from geo_sim_processing_a_spark.operators.text import tfidf_keywords
    docs = spark.createDataFrame(
        [(0, "common apple apple"),
         (1, "common banana"),
         (2, "common cherry cherry cherry")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rnk"]): r for r in
           tfidf_keywords(docs, k=2).collect()}
    # doc 0: apple tf=2 df=1 -> 2*ln(3); common tf=1 df=3 -> ln(1)=0
    assert out[(0, 1)]["term"] == "apple"
    assert out[(0, 1)]["score"] == round(2 * math.log(3.0), 6)
    assert out[(0, 2)]["term"] == "common" and out[(0, 2)]["score"] == 0.0
    assert out[(2, 1)]["term"] == "cherry"
    assert out[(2, 1)]["score"] == round(3 * math.log(3.0), 6)
    # every-doc term never outranks a distinctive one
    assert all(v["term"] != "common" for (d, r), v in out.items() if r == 1)
