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
