"""Differential parity tests against the reference's own pure-Python
helpers (/root/reference/dags/utils/utils.py and the hash/count
helpers) — the strongest possible F1/F2/F4/F6 oracle: run the actual
reference code on a seeded corpus of adversarial texts and require the
Spark expressions to agree row-for-row.

The reference tree is read-only and imported in-place (its utils module
has no Airflow dependencies); skipped if unavailable.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import random

import pytest
from pyspark.sql import functions as F

REF_UTILS = "/root/reference/dags/utils/utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_UTILS), reason="reference tree not available"
)


def _load_ref_utils():
    spec = importlib.util.spec_from_file_location("ref_utils", REF_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _corpus(n=300, seed=1234):
    """Seeded adversarial text generator: links with trailing junk,
    braces, brackets, Cyrillic/ASCII hashtags, duplicates, empties."""
    rng = random.Random(seed)
    slugs = ["Foo-01", "Bar-02-03", "Страшилка-04", "A_b*c", "X"]
    tags = ["#Tag", "#тег", "#Tag_1", "#2nd", "#ПрИвЕт", "#dup", "#DUP"]
    fillers = ["see", "wow", "спасибо", "...", "(", ")", "[", "]", "{", "}", ">", "\n"]
    texts = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, 12)):
            r = rng.random()
            if r < 0.25:
                link = f"https://telegra.ph/{rng.choice(slugs)}"
                suffix = rng.choice(["", ".", ",", '."', "*", "_", "''", "]"])
                wrap = rng.choice(["%s", "(%s)", "[%s]", "{%s}", "<%s>"])
                parts.append(wrap % (link + suffix))
            elif r < 0.5:
                parts.append(rng.choice(tags))
            else:
                parts.append(rng.choice(fillers))
        texts.append(" ".join(parts) if parts else rng.choice(["", "   ", "plain"]))
    texts.extend(["", None, "no entities at all", "#", "https://telegra.ph/"])
    return texts


def test_link_and_hashtag_extraction_matches_reference(spark):
    ref = _load_ref_utils()
    texts = _corpus()
    expected = [
        (i, ref.extract_telegraph_links(t), ref.extract_hashtags(t))
        for i, t in enumerate(texts)
    ]

    from pasta_pipeline_spark.functions.text import extract_hashtags, extract_telegraph_links

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: (r["links"], r["tags"])
        for r in df.select(
            "i",
            extract_telegraph_links("text").alias("links"),
            extract_hashtags("text").alias("tags"),
        ).collect()
    }
    for i, exp_links, exp_tags in expected:
        assert got[i][0] == exp_links, f"links diverge on row {i}: {texts[i]!r}"
        assert got[i][1] == exp_tags, f"tags diverge on row {i}: {texts[i]!r}"


def test_word_count_and_hash_match_reference_semantics(spark):
    """count_words / extract_content_hash (telegraph_processor.py:128-146)
    re-implemented inline (that module imports Airflow; its helpers are
    three lines each and quoted in SURVEY.md §2.8)."""
    texts = _corpus(100, seed=99)

    def ref_count_words(t):
        if not t:
            return 0
        return len(t.split())

    def ref_content_hash(t):
        if not t:
            return ""
        return hashlib.md5(t.encode("utf-8")).hexdigest()

    from pasta_pipeline_spark.functions.hashing import md5_or_empty
    from pasta_pipeline_spark.functions.text import word_count

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: (r["wc"], r["h"])
        for r in df.select(
            "i", word_count("text").alias("wc"), md5_or_empty("text").alias("h")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i][0] == ref_count_words(t), f"word_count diverges on {t!r}"
        assert got[i][1] == ref_content_hash(t), f"hash diverges on {t!r}"
