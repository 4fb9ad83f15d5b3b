"""Bloom sketch (operators/bloom.py) — the contracts the rows-only driver
row can't check: zero false negatives, bounded false positives, exact
bitwise mergeability, and prefilter-composition equivalence (the Bloom
prefilter must not change one row of the exact operator's output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_ingestion_spark.operators.bloom import (
    BloomState,
    bloom_arming_estimate,
    bloom_build,
    bloom_fp_rate,
    bloom_merge,
    bloom_might_contain,
    bloom_state,
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


def test_bloom_state_shape_mismatch_is_loud(spark):
    """ADVICE r13: a state densified from a sketch built with FEWER
    hashes than the probe silently produced false negatives (dropped
    contamination hits). With BloomState the shape travels with the
    words and any mismatch raises."""
    members = _keys_df(spark, "m-", 100)
    st = bloom_state(bloom_build(members, "k", BITS, 2), BITS, num_hashes=2)
    # matching shape probes fine, zero FN
    assert members.filter(bloom_might_contain("k", st, BITS, 2)).count() == 100
    with pytest.raises(ValueError, match="does not match the probe shape"):
        bloom_might_contain("k", st, BITS, 4)  # probe hashes > build hashes
    with pytest.raises(ValueError, match="does not match the probe shape"):
        bloom_might_contain("k", st, BITS // 2, 2)  # bits mismatch
    with pytest.raises(ValueError, match="does not match the probe shape"):
        bloom_might_contain("k", st, BITS, 2, hash_mode="md5")  # mode mismatch
    # containment_pairs threads the validation through (the streaming
    # sink's per-batch probe path)
    from pyspark_ingestion_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="does not match the probe shape"):
        containment_pairs(
            docs, docs, "doc_id", "text", bloom_bits=BITS, bloom_hashes=4,
            bloom_state=st,
        ).collect()


def test_bloom_probe_accepts_column_and_hostile_names(spark):
    """VERDICT r13 nit: the probe key is a Column (or a NAME resolved
    via F.col), never SQL text — so quoted/hostile identifiers and
    expression-shaped names cannot break or inject into the plan."""
    hostile = 'sh"in\'gle; DROP TABLE x--'
    df = _keys_df(spark, "m-", 50).withColumnRenamed("k", hostile)
    st = bloom_state(bloom_build(df, hostile, BITS, K), BITS, K)
    # string form: the hostile NAME resolves as a column, not SQL text
    assert df.filter(bloom_might_contain(hostile, st, BITS, K)).count() == 50
    # Column form: arbitrary expressions compose without re-parsing
    expr = F.concat(F.lit(""), F.col(hostile))
    assert df.filter(bloom_might_contain(expr, st, BITS, K)).count() == 50


def test_bloom_md5_mode_matches_contract(spark):
    """The r14 fixture twin's hash mode obeys the same contracts as
    production xxhash64: zero FN, exact mergeability, and mode-distinct
    positions (an md5 state never validates against an xxhash probe)."""
    a = _keys_df(spark, "a-", 200)
    b = _keys_df(spark, "b-", 200)
    st = bloom_state(
        bloom_merge(
            bloom_build(a, "k", BITS, K, "md5"), bloom_build(b, "k", BITS, K, "md5")
        ),
        BITS, K, "md5",
    )
    union_words = bloom_words(
        bloom_build(a.unionByName(b), "k", BITS, K, "md5"), BITS
    )
    assert list(st.words) == union_words  # merge == build-of-union, md5 mode
    both = a.unionByName(b)
    hits = both.filter(bloom_might_contain("k", st, BITS, K, "md5")).count()
    assert hits == 400  # zero FN through the md5 position contract
    with pytest.raises(ValueError, match="hash_mode"):
        bloom_build(a, "k", BITS, K, "crc32")


def test_bloom_arming_rule_pins_both_regimes(spark):
    """VERDICT r13 item 3: the arming decision, pinned on both measured
    regimes. Low overlap (disjoint vocabularies — decontamination's
    normal case) ⇒ hit rate ~FP-rate ⇒ ARM; high true overlap (the
    shared-vocabulary case where no prefilter can prune below the true
    match rate) ⇒ hit rate far above threshold ⇒ DON'T arm."""
    small = _keys_df(spark, "bench-", 300)
    st = bloom_state(bloom_build(small, "k", BITS, K), BITS, K)

    disjoint = _keys_df(spark, "corpus-", 4000)
    low = bloom_arming_estimate(disjoint, "k", st, sample_fraction=1.0)
    assert low.arm and low.hit_rate < 0.05 and low.n_sampled == 4000

    overlapping = small.unionByName(_keys_df(spark, "corpus-", 300))
    high = bloom_arming_estimate(overlapping, "k", st, sample_fraction=1.0)
    assert not high.arm and high.hit_rate > 0.4

    # empty sample ⇒ no evidence ⇒ never arm (don't add probe cost blind)
    empty = bloom_arming_estimate(
        disjoint.filter(F.lit(False)), "k", st, sample_fraction=1.0
    )
    assert not empty.arm and empty.n_sampled == 0
