"""Bloom sketch (operators/bloom.py) — the contracts the rows-only driver
row can't check: zero false negatives, bounded false positives, exact
bitwise mergeability, and prefilter-composition equivalence (the Bloom
prefilter must not change one row of the exact operator's output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_ingestion_spark.operators.bloom import (
    bloom_build,
    bloom_fp_rate,
    bloom_merge,
    bloom_might_contain,
    bloom_words,
    _BLOOM_MAX_LITERAL_WORDS,
)

BITS = 1 << 14  # 16384 bits / 256 words
K = 4


def _keys_df(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k")
    )


def test_bloom_zero_false_negatives(spark):
    members = _keys_df(spark, "member-", 500)
    words = bloom_words(bloom_build(members, "k", BITS, K), BITS)
    hits = members.filter(bloom_might_contain("k", words, BITS, K)).count()
    assert hits == 500  # a single FN would silently drop a contamination hit


def test_bloom_false_positive_rate_bounded(spark):
    n = 500
    members = _keys_df(spark, "member-", n)
    words = bloom_words(bloom_build(members, "k", BITS, K), BITS)
    probes = _keys_df(spark, "absent-", 5000)  # disjoint by prefix
    fp = probes.filter(bloom_might_contain("k", words, BITS, K)).count()
    expected = bloom_fp_rate(BITS, K, n)  # ~2.9e-4 at this sizing
    # generous 5x + additive slack: bound flakiness, still catches a
    # broken hash contract (which reads ~100% FP or ~0% membership)
    assert fp / 5000 <= 5 * expected + 0.002


def test_bloom_merge_equals_build_of_union(spark):
    a = _keys_df(spark, "a-", 300)
    b = _keys_df(spark, "b-", 300)
    merged = bloom_words(
        bloom_merge(bloom_build(a, "k", BITS, K), bloom_build(b, "k", BITS, K)), BITS
    )
    union = bloom_words(bloom_build(a.unionByName(b), "k", BITS, K), BITS)
    assert merged == union  # bit-for-bit: sketches re-aggregate losslessly


def test_bloom_prefilter_does_not_change_containment_output(spark, sf_dir):
    from pyspark_ingestion_spark.operators.dedup import containment_pairs
    from pyspark_ingestion_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    kw = dict(n=3, threshold_num=1, threshold_den=2)
    exact = sorted(
        tuple(r) for r in containment_pairs(corpus, bench, "doc_id", "text", **kw).collect()
    )
    bloomed = sorted(
        tuple(r)
        for r in containment_pairs(
            corpus, bench, "doc_id", "text", bloom_bits=1 << 16, **kw
        ).collect()
    )
    assert bloomed == exact
    assert len(exact) > 0  # non-vacuous: the testdata has real contamination


def test_bloom_prefilter_prunes_corpus_shingles(spark, sf_dir):
    from pyspark_ingestion_spark.operators.dedup import _cross_shingle_tables
    from pyspark_ingestion_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    sb, sc = _cross_shingle_tables(corpus, bench, "doc_id", "text", 3, None)
    words = bloom_words(bloom_build(sb, "shingle", 1 << 16, K), 1 << 16)
    total = sc.count()
    kept = sc.filter(bloom_might_contain("shingle", words, 1 << 16, K)).count()
    # the scale claim itself: most corpus shingles never reach the join
    # exchange (sf0.001 measures ~6%; assert a loose half)
    assert kept < total / 2


def test_bloom_shape_guards(spark):
    df = _keys_df(spark, "x-", 1)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", 100, 4)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_build(df, "k", 64, 0)
    with pytest.raises(ValueError, match="densify"):
        bloom_might_contain("k", [0] * 3, 256, 4)
    too_many = _BLOOM_MAX_LITERAL_WORDS + 1
    with pytest.raises(ValueError, match="plan budget"):
        bloom_might_contain("k", [0] * too_many, too_many * 64, 4)


def test_bloom_words_rejects_mismatched_sketch(spark):
    sk = bloom_build(_keys_df(spark, "y-", 50), "k", 1 << 12, 4)
    with pytest.raises(ValueError, match="out of range"):
        bloom_words(sk, 64)  # densify at a smaller shape than the build
