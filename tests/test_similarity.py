"""Trained-IVF ANN guarantees the SQL oracle can't express.

``ann_ivf_kmeans_topk`` is rows-only at the driver (KMeans has no SQL
oracle), so its real contract is pinned here: seeded determinism,
recall@5 against exact brute-force ground truth, and exactness when
nprobe covers every cell.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.01"


def _queries(e):
    return e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_kmeans_centroids_deterministic(spark, sf_dir):
    from pyspark_ingestion_spark.operators.similarity import kmeans_centroids
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_centroids(e, n_centroids=8, seed=7).collect()))
    b = sorted(map(tuple, kmeans_centroids(e, n_centroids=8, seed=7).collect()))
    assert a == b
    # sampled training path is deterministic too (hash sample, not df.sample)
    c = sorted(
        map(tuple, kmeans_centroids(e, n_centroids=4, seed=7, sample_fraction=0.5).collect())
    )
    d = sorted(
        map(tuple, kmeans_centroids(e, n_centroids=4, seed=7, sample_fraction=0.5).collect())
    )
    assert c == d


@pytest.mark.skipif(not os.path.isdir(SF001), reason="sf0.01 testdata absent")
def test_ivf_kmeans_recall_at_5(spark):
    """Trained centroids + nprobe=8/16 reach recall@5 ≥ 0.8 vs brute force."""
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, SF001, "embeddings")
    q = _queries(e)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=5).collect()}
    cents = kmeans_centroids(e, n_centroids=16, seed=42)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, centroids=cents, nprobe=8).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"recall@5 = {recall:.3f}"


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe = n_centroids probes every cell ⇒ exactly the brute-force
    result (same rounding and tie-break) — the recall dial tops out at
    exact search, which pins both the probe join and the ranking."""
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q = _queries(e)
    cents = kmeans_centroids(e, n_centroids=4, seed=42)
    exact = sorted(map(tuple, brute_force_topk(e, q, k=5).collect()))
    full = sorted(map(tuple, ivf_topk(e, q, k=5, centroids=cents, nprobe=4).collect()))
    assert full == exact


def test_embedding_dedup_bucket_cap_guards_biased_embeddings(spark):
    """All-positive (ReLU-style) embeddings collapse into one sign bucket
    — quadratic pairs. The bucket-size cap drops the degenerate bucket;
    unbiased buckets under the cap are untouched."""
    from pyspark_ingestion_spark.operators.similarity import embedding_near_dup_pairs

    rows = [(i, [1.0 + i / 1000.0, 2.0, 3.0, 4.0]) for i in range(200)]
    biased = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = embedding_near_dup_pairs(biased, threshold=-1.0, n_dims=4)
    assert uncapped.count() == 200 * 199 // 2  # one bucket, all pairs
    capped = embedding_near_dup_pairs(
        biased, threshold=-1.0, n_dims=4, max_bucket_size=50
    )
    assert capped.count() == 0

    mixed = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 2.0]), (2, [-1.0, 1.0]), (3, [-2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = embedding_near_dup_pairs(mixed, threshold=-1.0, n_dims=2, max_bucket_size=2)
    assert {(r["id_a"], r["id_b"]) for r in got.collect()} == {(0, 1), (2, 3)}


def test_lsh_bucket_cap_guards_giant_duplicate_class(spark):
    """A giant exact-duplicate class makes every band bucket quadratic in
    LSH; with max_bucket_size the class is skipped (exact dedup upstream
    owns it) while normal near-dup pairs still surface."""
    from pyspark_ingestion_spark.operators.dedup import minhash_lsh_dedup_pairs

    rows = [(i, "the same exact boilerplate text repeated verbatim") for i in range(150)]
    rows += [(1000, "a unique document about distributed query engines and planners"),
             (1001, "a unique document about distributed query engines and optimizers")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_dedup_pairs(df, "doc_id", "text", max_bucket_size=50)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1000, 1001) in pairs          # real near-dup survives
    assert all(a >= 1000 for a, _ in pairs)  # giant class skipped, not exploded


def test_multiprobe_recall_is_monotone(spark):
    """Multiprobe candidates are a superset of single-probe candidates,
    so recall@k vs brute-force truth can only improve (provably: any
    new entrant to the approx top-k outranks a displaced member in the
    GLOBAL order too, so it is itself in the true top-k whenever the
    displaced one was)."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        sign_bucket_multiprobe_topk,
        sign_bucket_topk,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def hits(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = hits(brute_force_topk(e, queries, k=5))
    single = hits(sign_bucket_topk(e, queries, k=5, n_dims=8))
    multi = hits(sign_bucket_multiprobe_topk(e, queries, k=5, n_dims=8))
    for qid, t in truth.items():
        r1 = len(single.get(qid, set()) & t)
        r9 = len(multi.get(qid, set()) & t)
        assert r9 >= r1, (qid, r1, r9)


def test_ivf_preassigned_cells_identical(spark, sf_dir):
    """ivf_topk over a corpus that already carries its cell column (the
    production ingest-time layout) returns exactly the per-call
    assignment's results — the fast path changes the plan, never the
    answer."""
    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_topk,
        kmeans_centroids,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(e, n_centroids=4)
    fresh = ivf_topk(e, queries, k=3, centroids=cents, nprobe=2)
    pre = ivf_topk(
        assign_ivf_cells(e, cents, "vec_id", "embedding"),
        queries, k=3, centroids=cents, nprobe=2, preassigned=True,
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(fresh) == rows(pre)


def test_sign_bits_for_tracks_corpus_growth(spark):
    """The dial adds ~log2(growth) bits: mean bucket population stays at
    or under target across corpus sizes, and the clamps hold."""
    from pyspark_ingestion_spark.operators.similarity import sign_bits_for

    for n in (1, 10_000, 100_000, 10_000_000, 10**12):
        bits = sign_bits_for(n)
        assert 4 <= bits <= 24
        if 4 < bits < 24:
            assert n / 2**bits <= 500          # target met
            assert n / 2 ** (bits - 1) > 500   # and not overshot
    assert sign_bits_for(100_000) - sign_bits_for(20_000) in (2, 3)
    with pytest.raises(ValueError):
        sign_bits_for(0)


def test_embedding_batch_rejects_planted_dup(spark):
    """A batch vector identical to a corpus vector is rejected with
    best_sim 1.0 and the right best-match id; a batch vector in an
    empty bucket (opposite signs) is admitted (absent from output)."""
    from pyspark_ingestion_spark.operators.similarity import embedding_batch_rejects

    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.1]),
         (3, [5.0, 6.0, 7.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0, 4.0]),      # exact dup of corpus 1 (and near 2)
         (101, [-1.0, -2.0, -3.0, -4.0])], # opposite sign bucket → admitted
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in
           embedding_batch_rejects(corpus, batch, threshold=0.9, n_dims=4).collect()}
    assert set(got) == {100}
    assert got[100]["best_sim"] == 1.0
    assert got[100]["best_match_id"] == 1      # sim tie impossible; exact dup wins
    assert got[100]["n_matches"] >= 2          # corpus 1, 2 and (cos>0.9) 3 share the bucket


def test_ivf_preassigned_is_explicit(spark, sf_dir):
    """A corpus carrying a 'cell' column is never silently trusted: the
    fast path requires preassigned=True, and preassigned=True requires
    the column (ADVICE r4 — stale assignments must not pass silently)."""
    import pytest

    from pyspark_ingestion_spark.operators.similarity import ivf_topk
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    stale = e.withColumn("cell", F.lit(0))
    with pytest.raises(ValueError, match="preassigned=True"):
        ivf_topk(stale, queries, k=3, n_centroids=4)
    with pytest.raises(ValueError, match="'cell' column"):
        ivf_topk(e, queries, k=3, n_centroids=4, preassigned=True)


def test_ivf_pq_recall_beats_sign_bucket_tier(spark, sf_dir):
    """The PQ tier's recall@5 vs brute-force ground truth must be at
    least the sign-bucket tier's (VERDICT r4 item 4): product
    quantization trades memory for approximation error, and if its
    recall dropped below the cheapest LSH tier the memory ladder would
    be pointless. Also pins self-retrieval: each query's own id must be
    its rank-1 neighbor (ADC scores the reconstruction, but a vector's
    reconstruction is its best match by construction)."""
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
        sign_bucket_topk,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth_rows = brute_force_topk(e, q, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_rows}
    sb = {
        (r["query_id"], r["neighbor_id"])
        for r in sign_bucket_topk(e, q, k=5, n_dims=8).collect()
    }
    cents = kmeans_centroids(e, n_centroids=8, seed=42)
    cb = pq_codebooks(e, n_sub=16, k_codes=32, seed=42)
    pq_rows = ivf_pq_topk(
        e, q, cents, cb, k=5, nprobe=8, n_sub=16, k_codes=32
    ).collect()
    pq = {(r["query_id"], r["neighbor_id"]) for r in pq_rows}

    recall_pq = len(truth & pq) / len(truth)
    recall_sb = len(truth & sb) / len(truth)
    assert recall_pq >= recall_sb, (recall_pq, recall_sb)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in pq_rows if r["rank"] == 1}
    assert all(rank1[qid] == qid for qid in rank1), rank1

    # exact re-rank over the PQ pool can only improve recall, and its sims
    # are exact cosines (self-match = 1.0)
    rr_rows = ivf_pq_topk(
        e, q, cents, cb, k=5, nprobe=8, n_sub=16, k_codes=32, rerank=20
    ).collect()
    rr = {(r["query_id"], r["neighbor_id"]) for r in rr_rows}
    recall_rr = len(truth & rr) / len(truth)
    assert recall_rr >= recall_pq, (recall_rr, recall_pq)
    self_sims = [r["sim"] for r in rr_rows if r["query_id"] == r["neighbor_id"]]
    assert self_sims and all(s == 1.0 for s in self_sims), self_sims[:5]


def test_pq_encode_deterministic_and_shaped(spark, sf_dir):
    """pq_encode: one code row per vector, codes in [0, k_codes), array
    length n_sub, and bit-identical across two invocations (broadcast
    argmin with lowest-code tie-break is deterministic)."""
    from pyspark_ingestion_spark.operators.similarity import pq_codebooks, pq_encode
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(e, n_sub=8, k_codes=16, seed=7)
    enc = lambda: sorted(  # noqa: E731
        (r["vec_id"], tuple(r["codes"])) for r in pq_encode(e, cb, n_sub=8).collect()
    )
    a, b = enc(), enc()
    assert a == b
    assert len(a) == e.count()
    assert all(len(codes) == 8 and all(0 <= c < 16 for c in codes) for _, codes in a)


def test_pq_codebooks_concurrent_fits_deterministic(spark, sf_dir):
    """pq_codebooks fits its subquantizers as CONCURRENT Spark jobs
    (r11) — two invocations must still produce bit-identical codebooks
    (per-m seeds, order-independent assembly), or the concurrency would
    silently break the train-once/broadcast-everywhere contract."""
    from pyspark_ingestion_spark.operators.similarity import pq_codebooks
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")

    def fit():
        return sorted(
            (r["m"], r["code_id"], tuple(r["subvec"]))
            for r in pq_codebooks(e, n_sub=8, k_codes=8, seed=11).collect()
        )

    a, b = fit(), fit()
    assert a == b
    assert len(a) == 8 * 8


def test_pq_codes_expr_matches_pq_encode(spark, sf_dir):
    """The scan-side code expression (r11, the shuffle-free encode shape
    ivf_pq_topk's query path uses) is BIT-IDENTICAL to pq_encode's
    broadcast-join/aggregate form on real embeddings — same slices,
    same dot-product fold, same lowest-code tie-break — and rejects a
    codebook set whose m-domain disagrees with n_sub."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.operators.similarity import (
        codebook_rows_of,
        pq_codebooks,
        pq_codes_expr,
        pq_encode,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(e, n_sub=8, k_codes=16, seed=7)
    rows = codebook_rows_of(cb)
    via_expr = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in e.select(
            "vec_id", pq_codes_expr("embedding", rows, 8).alias("codes")
        ).collect()
    )
    via_agg = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(e, cb, n_sub=8).collect()
    )
    assert via_expr == via_agg
    # no shuffle in the expression form's plan
    from pyspark_ingestion_spark.plans.explain import shuffle_count

    assert shuffle_count(
        e.select("vec_id", pq_codes_expr("embedding", rows, 8).alias("codes"))
    ) == 0
    with _pytest.raises(ValueError, match="expected 0..3"):
        pq_codes_expr("embedding", rows, 4)


def test_pq_codes_expr_sql_path_matches_column_path(spark, sf_dir):
    """r14: with ``expected_dim`` set the codes expression is built from
    ONE SQL string with driver-inlined ``c·c`` literals (the fast-build
    half-the-interpreted-work form); it must stay BIT-IDENTICAL to the
    Column-API builder (the ``expected_dim=None`` path) on real
    embeddings — same left-fold arithmetic, same argmax tie-break."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.operators.similarity import (
        codebook_rows_of,
        pq_codebooks,
        pq_codes_expr,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    rows = codebook_rows_of(pq_codebooks(e, n_sub=8, k_codes=16, seed=7))
    dim = e.select(F.size("embedding").alias("d")).first()["d"]
    mismatch = (
        e.select(
            pq_codes_expr("embedding", rows, 8, expected_dim=dim).alias("sql_form"),
            pq_codes_expr("embedding", rows, 8).alias("col_form"),
        )
        .filter(F.expr("sql_form IS DISTINCT FROM col_form"))
        .count()
    )
    assert mismatch == 0


def test_ivf_pq_fit_matches_sequential_fits(spark, sf_dir):
    """r14: the overlapped fit (guide §2.6) returns EXACTLY the tables
    the two sequential calls produce — same seeds, same algorithm,
    thread order cannot reach either fit's arithmetic."""
    from pyspark_ingestion_spark.operators.similarity import (
        ivf_pq_fit,
        kmeans_centroids,
        pq_codebooks,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cents, cb = ivf_pq_fit(e, n_centroids=8, n_sub=8, k_codes=8, seed=11)
    seq_cents = kmeans_centroids(e, n_centroids=8, seed=11)
    seq_cb = pq_codebooks(e, n_sub=8, k_codes=8, seed=11)
    assert sorted(
        (r["centroid_id"], tuple(r["cvec"])) for r in cents.collect()
    ) == sorted((r["centroid_id"], tuple(r["cvec"])) for r in seq_cents.collect())
    assert sorted(
        (r["m"], r["code_id"], tuple(r["subvec"])) for r in cb.collect()
    ) == sorted(
        (r["m"], r["code_id"], tuple(r["subvec"])) for r in seq_cb.collect()
    )


def test_ivf_pq_adc_matches_python_reconstruction(spark):
    """The ADC score IS cosine(query, PQ-reconstruction): for a tiny
    corpus, recompute each candidate's reconstruction from the codebooks
    + codes in plain Python and check the operator's sim to 1e-6 — the
    arithmetic contract, independent of recall behavior."""
    import math
    import random

    from pyspark_ingestion_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = random.Random(5)
    dim, n_sub, k_codes = 16, 4, 4
    vecs = {i: [rng.gauss(0, 1) for _ in range(dim)] for i in range(30)}
    corpus = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = corpus.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec"
    )
    cb = pq_codebooks(corpus, n_sub=n_sub, k_codes=k_codes, seed=1)
    cb_map = {(r["m"], r["code_id"]): r["subvec"] for r in cb.collect()}
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(corpus, cb, n_sub=n_sub).collect()}

    queries = corpus.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_pq_topk(
        corpus, queries, cents, cb, k=5, nprobe=2, n_sub=n_sub, k_codes=k_codes
    ).collect()
    assert got, "no results"
    for r in got:
        q = vecs[r["query_id"]]
        recon = [x for m in range(n_sub) for x in cb_map[(m, codes[r["neighbor_id"]][m])]]
        dot = sum(a * b for a, b in zip(q, recon))
        denom = math.sqrt(sum(a * a for a in q)) * math.sqrt(sum(b * b for b in recon))
        want = round(dot / denom, 6) if denom else None
        assert abs(r["sim"] - want) <= 1e-6, (r, want)


def test_ivf_pq_expr_literal_budget_fallback(spark, monkeypatch):
    """Past ``_PQ_EXPR_MAX_LITERALS`` the corpus-side encode falls back
    to the aggregate+join form (r12, ADVICE): the scan-side expression
    inlines every codebook/centroid double as SQL text — megabytes of
    expression string at realistic PQ configs (k_codes=256, d=768),
    inflating parse/analysis time and driver memory, a plan-size
    dependence the join form does not have. Pinned by dropping the
    budget to 1 and checking the two forms return identical rows."""
    import random

    from pyspark_ingestion_spark.operators import similarity as sim

    rng = random.Random(9)
    dim, n_sub, k_codes = 16, 4, 4
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = corpus.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec"
    )
    cb = sim.pq_codebooks(corpus, n_sub=n_sub, k_codes=k_codes, seed=1)
    queries = corpus.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
            for r in sim.ivf_pq_topk(
                corpus, queries, cents, cb, k=5, nprobe=2,
                n_sub=n_sub, k_codes=k_codes,
            ).collect()
        )

    via_expr = run()
    monkeypatch.setattr(sim, "_PQ_EXPR_MAX_LITERALS", 1)
    via_join = run()
    assert via_expr == via_join
    assert via_expr, "no results"


def test_ivf_pq_assign_layout_and_equivalence(spark, monkeypatch):
    """ivf_pq_assign (r12) is the public ingest-time layout builder the
    preassigned query path documents: keeps every corpus column, adds
    cell+codes identical to the assign_ivf_cells + pq_encode twins on
    BOTH physical forms (scan-side expression and the over-budget
    aggregate+join fallback), round-trips through
    ivf_pq_topk(preassigned=True) with results equal to the ad-hoc
    path, and refuses to overwrite an existing generation."""
    import random

    from pyspark.sql import functions as F2

    from pyspark_ingestion_spark.operators import similarity as sim

    rng = random.Random(3)
    dim, n_sub, k_codes = 16, 4, 4
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dim)], f"s{i % 3}")
         for i in range(40)],
        "vec_id long, embedding array<double>, source string",
    )
    cents = corpus.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec"
    )
    cb = sim.pq_codebooks(corpus, n_sub=n_sub, k_codes=k_codes, seed=1)

    want = sorted(
        (r["vec_id"], r["source"], r["cell"], tuple(r["codes"]))
        for r in sim.assign_ivf_cells(corpus, cents, "vec_id", "embedding")
        .join(sim.pq_encode(corpus, cb, n_sub=n_sub), "vec_id")
        .collect()
    )

    def got():
        out = sim.ivf_pq_assign(corpus, cents, cb, n_sub=n_sub)
        assert set(out.columns) == {"vec_id", "embedding", "source", "cell",
                                    "codes"}
        return sorted(
            (r["vec_id"], r["source"], r["cell"], tuple(r["codes"]))
            for r in out.collect()
        )

    assert got() == want  # scan-side expression form
    monkeypatch.setattr(sim, "_PQ_EXPR_MAX_LITERALS", 1)
    assert got() == want  # aggregate+join fallback form
    monkeypatch.undo()

    # the layout round-trips through the production query path
    queries = corpus.filter("vec_id < 3").select(
        F2.col("vec_id").alias("query_id"), "embedding"
    )
    pre = sim.ivf_pq_topk(
        sim.ivf_pq_assign(corpus, cents, cb, n_sub=n_sub), queries, cents, cb,
        k=5, nprobe=2, n_sub=n_sub, k_codes=k_codes, preassigned=True,
    )
    adhoc = sim.ivf_pq_topk(
        corpus, queries, cents, cb, k=5, nprobe=2, n_sub=n_sub,
        k_codes=k_codes,
    )
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(pre.collect()) == key(adhoc.collect())

    import pytest

    with pytest.raises(ValueError, match="already has"):
        sim.ivf_pq_assign(
            sim.ivf_pq_assign(corpus, cents, cb, n_sub=n_sub), cents, cb,
            n_sub=n_sub,
        )


def test_ivf_pq_mixed_dim_corpus_raises(spark):
    """A corpus with ROW-LEVEL dim drift must raise, not return
    plausible-but-wrong neighbors (r12, ADVICE): pq_codes_expr used to
    compute d_sub per row from size(vec), so an off-dim row sliced
    misaligned subvectors silently. The expected_dim guard asserts
    every row's dim scan-side."""
    import pytest

    from pyspark_ingestion_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks,
    )

    good = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0] * 4)
            for i in range(40)]
    corpus_ok = spark.createDataFrame(
        good, "vec_id long, embedding array<double>"
    )
    cents = corpus_ok.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec"
    )
    cb = pq_codebooks(corpus_ok, n_sub=4, k_codes=8, seed=1)
    q = corpus_ok.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # one 12-dim row among 16-dim rows; 12 % n_sub == 0, so the old
    # per-row d_sub (=3) would happily emit misaligned codes for it
    mixed = spark.createDataFrame(
        good + [(99, [1.0] * 12)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="row vector dim"):
        ivf_pq_topk(
            mixed, q, cents, cb, k=3, nprobe=2, n_sub=4, k_codes=8
        ).collect()


def test_ivf_pq_mixed_dim_raises_in_fallback_branch(spark, monkeypatch):
    """The aggregate+join fallback of ivf_pq_assign — the branch big
    production codebooks take — must ALSO raise on row-level dim drift
    (r13, ADVICE: pq_encode used to compute d_sub per row, so only the
    expression form raised). Forcing _PQ_EXPR_MAX_LITERALS to 1 routes
    the same mixed corpus through the fallback."""
    import pytest

    from pyspark_ingestion_spark.operators import similarity as sim

    good = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0] * 4)
            for i in range(40)]
    corpus_ok = spark.createDataFrame(
        good, "vec_id long, embedding array<double>"
    )
    cents = corpus_ok.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec"
    )
    cb = sim.pq_codebooks(corpus_ok, n_sub=4, k_codes=8, seed=1)
    mixed = spark.createDataFrame(
        good + [(99, [1.0] * 12)], "vec_id long, embedding array<double>"
    )
    monkeypatch.setattr(sim, "_PQ_EXPR_MAX_LITERALS", 1)
    with pytest.raises(Exception, match="row vector dim"):
        sim.ivf_pq_assign(mixed, cents, cb, n_sub=4).collect()
    # and the guarded fallback still matches the expression form on a
    # clean corpus (the existing property pin, re-run under the guard)
    fb = sim.ivf_pq_assign(corpus_ok, cents, cb, n_sub=4)
    monkeypatch.setattr(sim, "_PQ_EXPR_MAX_LITERALS", 65536)
    ex = sim.ivf_pq_assign(corpus_ok, cents, cb, n_sub=4)
    key = lambda df: sorted(  # noqa: E731
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )
    assert key(fb) == key(ex)


def test_pq_config_mismatches_fail_fast(spark):
    """PQ config mismatches produce silently-wrong results if trusted, so
    they must raise: k_codes disagreeing with the codebooks (misaligned
    ADC LUT), n_sub disagreeing with the codebook m-domain, and dim not
    divisible by n_sub."""
    import pytest

    from pyspark_ingestion_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks,
        pq_encode,
    )

    vecs = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0] * 4)
            for i in range(40)]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = corpus.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec")
    q = corpus.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding")
    cb = pq_codebooks(corpus, n_sub=4, k_codes=8, seed=1)  # 16-dim, d_sub=4

    with pytest.raises(ValueError, match="k_codes"):
        ivf_pq_topk(corpus, q, cents, cb, n_sub=4, k_codes=16)
    with pytest.raises(ValueError, match="n_sub mismatch"):
        pq_encode(corpus, cb, n_sub=8)  # codebooks trained with n_sub=4
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(corpus, cb, n_sub=3)  # 16 % 3 != 0


def test_pq_preassigned_stale_codes_fail_fast(spark):
    """A preassigned codes column from a different PQ generation (wrong
    n_sub) is caught by the sampled shape check instead of NULLing the
    ADC scores silently."""
    import pytest

    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_pq_topk,
        pq_codebooks,
        pq_encode,
    )

    vecs = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0] * 4)
            for i in range(40)]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = corpus.filter("vec_id < 2").selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding AS cvec")
    q = corpus.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding")
    cb2 = pq_codebooks(corpus, n_sub=2, k_codes=4, seed=1)
    cb4 = pq_codebooks(corpus, n_sub=4, k_codes=4, seed=1)
    stale = (
        assign_ivf_cells(corpus, cents, "vec_id", "embedding")
        .select("vec_id", "embedding", "cell")
        .join(pq_encode(corpus, cb2, n_sub=2), "vec_id")  # 2-code generation
    )
    with pytest.raises(ValueError, match="another PQ generation"):
        ivf_pq_topk(stale, q, cents, cb4, n_sub=4, k_codes=4, preassigned=True)


def test_text_classifier_separable_and_distill(spark, sf_dir):
    """The model tier learns: (1) a planted separable vocabulary (good
    vs bad word sets) is classified near-perfectly; (2) distilling the
    heuristic quality gate on real fixture docs reaches AUC ≥ 0.9 vs
    its own labels. Also pins the AUC helper on a hand-checkable case."""
    import random

    from pyspark_ingestion_spark.functions.text import quality_score
    from pyspark_ingestion_spark.operators.quality_model import (
        auc_of_scores,
        score_corpus,
        train_text_classifier,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    # hand-checkable AUC: scores 0.1/0.2/0.3/0.4 with labels 0/0/1/1 -> 1.0
    sc = spark.createDataFrame(
        [(1, 0.1), (2, 0.2), (3, 0.3), (4, 0.4)], "doc_id int, model_score double"
    )
    lb = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "doc_id int, y int"
    )
    assert auc_of_scores(sc, lb, "doc_id", "y") == 1.0
    swapped = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 0)], "doc_id int, y int"
    )
    assert auc_of_scores(sc, swapped, "doc_id", "y") == 0.0

    rng = random.Random(9)
    good = [f"good{i}" for i in range(50)]
    bad = [f"bad{i}" for i in range(50)]
    rows = []
    for i in range(200):
        vocab = good if i % 2 == 0 else bad
        rows.append((i, " ".join(rng.choices(vocab, k=30)), i % 2))
    df = spark.createDataFrame(rows, "doc_id int, text string, label int")
    model = train_text_classifier(df, "label", n_features=512, max_iter=20)
    auc = auc_of_scores(score_corpus(model, df), df, "doc_id", "label")
    assert auc >= 0.99, auc

    d = load_table(spark, sf_dir, "documents")
    med = d.select(F.median(quality_score("text")).alias("m")).first()["m"]
    labeled = d.withColumn("hi_q", (quality_score("text") > med).cast("int"))
    m2 = train_text_classifier(labeled, "hi_q", n_features=2048, max_iter=30)
    auc2 = auc_of_scores(score_corpus(m2, d), labeled, "doc_id", "hi_q")
    assert auc2 >= 0.9, auc2


def test_classifier_survives_observation_sessions(spark):
    """Regression for the Spark 4.1.2 interaction this engine MUST
    tolerate: after any Observation use (our ingest pipeline is
    Observation-based), MLlib model.transform dies with 'Task not
    serializable: ObservationManager'. The expression-only scorer is
    immune — train + score end-to-end in a freshly-poisoned session."""
    from pyspark.sql import Observation

    from pyspark_ingestion_spark.operators.quality_model import (
        score_corpus,
        train_text_classifier,
    )

    obs = Observation()
    spark.range(3).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == 3  # the session has live Observation history

    df = spark.createDataFrame(
        [(i, ("good text sample" if i % 2 else "bad junk words"), i % 2)
         for i in range(40)],
        "doc_id int, text string, label int",
    )
    model = train_text_classifier(df, "label", n_features=64, max_iter=10)
    rows = score_corpus(model, df).collect()  # would raise before the fix
    assert len(rows) == 40
    hi = {r["doc_id"]: r["model_score"] for r in rows}
    assert all(hi[i] > 0.5 for i in range(1, 40, 2))
    assert all(hi[i] < 0.5 for i in range(0, 40, 2))


def test_score_corpus_null_text_and_auc_null_guard(spark):
    """NULL text scores as an empty document (sigmoid of the intercept,
    never NULL — a NULL score would silently rank first in the AUC
    window); auc_of_scores fails loudly on NULL scores/labels instead of
    silently shifting (ADVICE r5)."""
    import math

    import pytest

    from pyspark_ingestion_spark.operators.quality_model import (
        TextClassifier,
        auc_of_scores,
        score_corpus,
    )

    model = TextClassifier(weights=[1.0, -1.0], intercept=0.25, n_features=2)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["model_score"] for r in score_corpus(model, df).collect()}
    expected_empty = round(1.0 / (1.0 + math.exp(-0.25)), 4)
    assert got[1] == expected_empty  # NULL ≡ empty doc
    assert got[2] == expected_empty
    assert got[1] is not None and got[3] is not None

    sc = spark.createDataFrame(
        [(1, 0.1), (2, None), (3, 0.9)], "doc_id int, model_score double"
    )
    lb = spark.createDataFrame([(1, 0), (2, 1), (3, 1)], "doc_id int, y int")
    with pytest.raises(ValueError, match="NULL score/label"):
        auc_of_scores(sc, lb, "doc_id", "y")
    sc2 = spark.createDataFrame(
        [(1, 0.1), (2, 0.5), (3, 0.9)], "doc_id int, model_score double"
    )
    lb2 = spark.createDataFrame([(1, 0), (2, None), (3, 1)], "doc_id int, y int")
    with pytest.raises(ValueError, match="NULL score/label"):
        auc_of_scores(sc2, lb2, "doc_id", "y")


def test_ivf_cell_expr_matches_assign_ivf_cells(spark):
    """The scan-side cell expression (used by the streaming semantic
    admission index, where the per-batch plan must stay shuffle-free)
    computes EXACTLY assign_ivf_cells' deterministic argmax — max
    (6-dp cosine, -centroid_id) — and ivf_probe_cells_expr's element 1
    is that cell, with probed cells distinct and ordered by the same
    key. Pinned on vectors engineered with centroid ties (duplicated
    centroid directions) so the tie-break is exercised, not assumed."""
    import random

    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        centroid_rows_of,
        ivf_cell_expr,
        ivf_probe_cells_expr,
    )

    rng = random.Random(7)
    dims = 6
    vecs = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dims)])
        for i in range(80)
    ]
    # centroids 2 and 3 are the SAME direction (scaled) → cosine ties
    cents = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, -1.0, 0.0, 0.5, 0.0]),
        (2, [0.5, -0.5, 0.5, -0.5, 0.5, -0.5]),
        (3, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0]),
        (4, [-0.3, 0.9, 0.1, 0.4, -0.8, 0.2]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "centroid_id int, cvec array<double>")
    rows = centroid_rows_of(cdf)

    want = {
        r["vec_id"]: r["cell"]
        for r in assign_ivf_cells(df, cdf, "vec_id", "embedding").collect()
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in df.select(
            "vec_id", ivf_cell_expr("embedding", rows).alias("cell")
        ).collect()
    }
    assert got == want
    # ties really occurred and resolved toward the LOWER centroid id
    assert 3 not in set(want.values())
    assert 2 in set(want.values())

    probed = df.select(
        "vec_id", ivf_probe_cells_expr("embedding", rows, 3).alias("p")
    ).collect()
    for r in probed:
        assert len(r["p"]) == 3 and len(set(r["p"])) == 3
        assert r["p"][0] == want[r["vec_id"]]
    # nprobe spanning all centroids = every cell probed exactly once
    full = df.select(
        ivf_probe_cells_expr("embedding", rows, len(cents)).alias("p")
    ).head()
    assert sorted(full["p"]) == [c for c, _ in cents]


def test_semantic_ivf_recall_beats_sign_buckets(spark, sf_dir):
    """VERDICT r8 item 1's 'done' recall row: on the real embeddings
    sample, trained IVF cells beat the 4-bit sign bucket — at equal
    nominal bucket count (K=16) recall is at least as high, and at
    K=24 recall stays at least as high on a candidate budget no larger
    than the sign tier's. (Measured: sign 0.14 recall / 7.7k cands;
    ivf_k16 0.31 / 9.7k; ivf_k24 0.29 / 6.3k.)"""
    from pyspark_ingestion_spark.queries.llm_ops import semantic_ivf_recall_eval

    rows = {
        r["method"]: r
        for r in semantic_ivf_recall_eval(spark, sf_dir).collect()
    }
    assert set(rows) == {"sign_b4", "ivf_k16", "ivf_k24", "ivf_k24_p2"}
    sign = rows["sign_b4"]
    assert all(r["n_true"] == sign["n_true"] for r in rows.values())
    assert sign["n_true"] > 0, "fixture must contain true near pairs"
    assert rows["ivf_k16"]["recall"] >= sign["recall"]
    assert rows["ivf_k24"]["recall"] >= sign["recall"]
    assert rows["ivf_k24"]["n_candidates"] <= sign["n_candidates"]
    # the nprobe dial: strictly more candidates, at-least-equal recall
    assert rows["ivf_k24_p2"]["recall"] >= rows["ivf_k24"]["recall"]
    assert rows["ivf_k24_p2"]["n_candidates"] >= rows["ivf_k24"]["n_candidates"]


def test_sign_pack_rejects_bad_start_and_n_bits(spark):
    """sign_pack fail-loud contract (ADVICE r9): a negative start would
    make element_at index from the array END silently, and start past
    the vector length packs zero bits — both must raise like the
    existing n_bits guard, not degrade."""
    import pytest

    from pyspark_ingestion_spark.functions.vectors import sign_pack

    with pytest.raises(ValueError, match="start must be >= 0"):
        sign_pack("embedding", start=-1, n_bits=8)
    with pytest.raises(ValueError, match=r"n_bits must be in \[1, 32\]"):
        sign_pack("embedding", n_bits=0)
    with pytest.raises(ValueError, match=r"n_bits must be in \[1, 32\]"):
        sign_pack("embedding", n_bits=33)
    # the valid surface still packs as documented
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got = df.select(sign_pack("embedding", start=0, n_bits=4).alias("h"))
    # bit i = 1 iff component start+i >= 0: signs 1,0,1,1 -> 0b1101
    assert got.collect()[0]["h"] == 0b1101


def test_embedding_batch_rejects_salted_admission(spark):
    """Semantic cross-side admission salting (r13, VERDICT r12 item 3):
    a batch vector near a planted POPULAR semantic cluster (its sign
    bucket oversized at the cap) is silently admitted under drop mode
    but rejected under salt mode — recall(drop) ⊆ recall(salt) ⊆
    recall(uncapped) — while a vector matching a lone corpus vector in
    a small bucket (salt 0) is rejected in EVERY mode. Replication cost
    of the probe side is bounded at batch_rows × probe_salts."""
    import pytest

    from pyspark_ingestion_spark.operators.dedup import (
        _oversized_bucket_salts,
        _probe_salted_buckets,
    )
    from pyspark_ingestion_spark.operators.similarity import (
        embedding_batch_rejects,
    )

    cluster = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    lone = [(200, [-1.0, 2.0, -3.0, 4.0]), (201, [1.0, -2.0, 3.0, -4.0])]
    corpus = spark.createDataFrame(
        cluster + lone, "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [
            (1000, [1.0, 2.0, 3.0, 4.1]),    # near-cluster (oversized bucket)
            (1001, [-1.0, 2.0, -3.0, 4.05]),  # near lone 200 (small bucket)
            (1002, [-0.5, -0.5, -0.5, -0.5]),  # novel bucket, matches nothing
        ],
        "vec_id long, embedding array<double>",
    )

    def rejects(**kw):
        return {
            r["vec_id"]
            for r in embedding_batch_rejects(
                corpus, batch, threshold=0.95, n_dims=4, **kw
            ).collect()
        }

    uncapped = rejects()
    assert uncapped == {1000, 1001}
    # drop mode: the cluster fills its sign bucket past cap=4, so the
    # near-cluster batch vector sails through admission silently; the
    # small-bucket match is untouched
    dropped = rejects(max_bucket_size=4)
    assert dropped == {1001}
    # salt mode: the batch probes min(ceil(30/4), 4) = 4 of 8
    # sub-buckets of ~4 identical cluster vectors each -> recovered
    salted = rejects(max_bucket_size=4, bucket_cap_mode="salt")
    assert dropped <= salted <= uncapped
    assert salted == {1000, 1001}

    with pytest.raises(ValueError, match="bucket_cap_mode"):
        rejects(max_bucket_size=4, bucket_cap_mode="bogus")
    with pytest.raises(ValueError, match="max_bucket_size"):
        rejects(max_bucket_size=0, bucket_cap_mode="salt")

    # bounded replication: each batch bucket row probes at most
    # probe_salts sub-buckets, so the probe side is <= rows x salts
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.functions.vectors import sign_bucket

    bb = batch.select(
        F.col("vec_id").alias("__id"),
        sign_bucket("embedding", 4).alias("__bucket"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("__id"),
        sign_bucket("embedding", 4).alias("__bucket"),
    )
    big = _oversized_bucket_salts(cb, 4, keys=("__bucket",))
    probed = _probe_salted_buckets(
        bb, big, probe_salts=4, keys=("__bucket",), doc_col="__id"
    )
    assert probed.count() <= bb.count() * 4


def test_embedding_near_dup_pairs_salt_mode(spark):
    """Self-join face of the semantic salt (r13): a planted popular
    cluster whose sign bucket exceeds the cap loses ALL in-cluster
    pairs under drop mode; salt mode keeps each vector ~cap partners
    (pairs within a sub-bucket), with drop ⊆ salt ⊆ uncapped and every
    surviving pair a genuine bucket collision."""
    import pytest

    from pyspark_ingestion_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rows = [(i, [1.0 + i / 1000.0, 2.0, 3.0, 4.0]) for i in range(60)]
    rows += [(200, [-1.0, 2.0, -3.0, 4.0]), (201, [-1.0, 2.0, -3.0, 4.05])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairs(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                df, threshold=0.95, n_dims=4, **kw
            ).collect()
        }

    uncapped = pairs()
    assert (200, 201) in uncapped
    assert len(uncapped) == 60 * 59 // 2 + 1  # full cluster + the lone pair
    dropped = pairs(max_bucket_size=10)
    assert dropped == {(200, 201)}  # all in-cluster recall lost
    salted = pairs(max_bucket_size=10, bucket_cap_mode="salt")
    assert dropped <= salted <= uncapped
    in_cluster = {p for p in salted if p != (200, 201)}
    assert in_cluster, "salt mode kept no in-cluster pairs"
    assert len(in_cluster) < 60 * 59 // 2  # bounded, not the full quadratic
    with pytest.raises(ValueError, match="bucket_cap_mode"):
        pairs(max_bucket_size=10, bucket_cap_mode="bogus")


def test_ivf_drift_monitor_flags_planted_drift(spark):
    """r13: the retrain trigger. A generation trained on tight clusters
    around two centroids; the 'newly admitted' window drifts away from
    centroid 1 only — its cell must flag retrain, the stable cell must
    not, and a cell with no training baseline must flag by definition."""
    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_cell_residual_stats,
        ivf_drift_flags,
    )

    cents = spark.createDataFrame(
        [(0, [10.0, 0.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 10.0, 0.0])],
        "centroid_id int, cvec array<double>",
    )
    # baseline: tight around centroids 0 and 1 (cell 2 has NO baseline)
    base_rows = [(i, [10.0, 0.1 * (i % 3), 0.0, 0.0]) for i in range(20)]
    base_rows += [(100 + i, [0.1 * (i % 3), 10.0, 0.0, 0.0]) for i in range(20)]
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    # current: cell 0 stays tight, cell 1 drifts far, cell 2 appears
    cur_rows = [(200 + i, [10.0, 0.1 * (i % 3), 0.0, 0.0]) for i in range(10)]
    cur_rows += [(300 + i, [0.0, 10.0, 6.0, 0.0]) for i in range(10)]
    cur_rows += [(400 + i, [0.0, 0.0, 10.0, 1.0]) for i in range(10)]
    cur = spark.createDataFrame(cur_rows, "vec_id long, embedding array<double>")

    stats = lambda df: ivf_cell_residual_stats(  # noqa: E731
        assign_ivf_cells(df, cents, "vec_id", "embedding"), cents
    )
    flags = {
        r["cell"]: r
        for r in ivf_drift_flags(stats(cur), stats(base), min_rows=5).collect()
    }
    assert flags[0]["retrain"] == 0  # stable cell
    assert flags[1]["retrain"] == 1 and flags[1]["drift_ratio"] > 1.05  # drifted
    assert flags[2]["retrain"] == 1 and flags[2]["baseline_avg"] is None  # no baseline
    # min_rows gates thin evidence: nothing flags at min_rows > window size
    thin = ivf_drift_flags(stats(cur), stats(base), min_rows=11).collect()
    assert all(r["retrain"] == 0 for r in thin)


def test_ivf_drift_flags_zero_baseline_cells(spark):
    """ADVICE r13: baseline_avg == 0 must not flag a stable cell via an
    Infinity/NaN ratio (NaN orders above any threshold in both engines).
    Exactly-on-centroid baseline + exactly-on-centroid current ⇒ stable
    (ratio NULL, retrain 0); baseline 0 + positive current ⇒ drift."""
    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_cell_residual_stats,
        ivf_drift_flags,
    )

    cents = spark.createDataFrame(
        [(0, [10.0, 0.0]), (1, [0.0, 10.0])],
        "centroid_id int, cvec array<double>",
    )
    # both baseline cells sit EXACTLY on their centroid: avg_residual = 0
    base = spark.createDataFrame(
        [(i, [10.0, 0.0]) for i in range(10)]
        + [(100 + i, [0.0, 10.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    # current: cell 0 still exact (stable), cell 1 moves off (drift)
    cur = spark.createDataFrame(
        [(200 + i, [10.0, 0.0]) for i in range(10)]
        + [(300 + i, [2.0, 10.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    stats = lambda df: ivf_cell_residual_stats(  # noqa: E731
        assign_ivf_cells(df, cents, "vec_id", "embedding"), cents
    )
    flags = {
        r["cell"]: r
        for r in ivf_drift_flags(stats(cur), stats(base), min_rows=5).collect()
    }
    assert flags[0]["baseline_avg"] == 0.0
    assert flags[0]["drift_ratio"] is None and flags[0]["retrain"] == 0
    assert flags[1]["baseline_avg"] == 0.0
    assert flags[1]["drift_ratio"] is None and flags[1]["retrain"] == 1


def test_ivf_residual_stats_are_mergeable(spark):
    """n/sum re-aggregate across splits to the whole-frame stats — the
    property that lets per-batch streaming stats roll up into the
    drift monitor without rescanning vectors."""
    import pyspark.sql.functions as F

    from pyspark_ingestion_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_cell_residual_stats,
    )

    cents = spark.createDataFrame(
        [(0, [5.0, 1.0, 0.0, 0.0]), (1, [0.0, 1.0, 5.0, 0.0])],
        "centroid_id int, cvec array<double>",
    )
    rows = [(i, [float(i % 7), 1.0, float(i % 4), 0.5]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = lambda d: ivf_cell_residual_stats(  # noqa: E731
        assign_ivf_cells(d, cents, "vec_id", "embedding"), cents
    )
    whole = {r["cell"]: r for r in stats(df).collect()}
    parts = (
        stats(df.filter("vec_id < 17"))
        .unionByName(stats(df.filter("vec_id >= 17")))
        .groupBy("cell")
        .agg(
            F.sum("n_vectors").alias("n"),
            F.sum("sum_residual").alias("s"),
            F.max("max_residual").alias("mx"),
        )
    )
    for r in parts.collect():
        w = whole[r["cell"]]
        assert r["n"] == w["n_vectors"]
        assert abs(r["s"] - w["sum_residual"]) < 1e-9
        assert r["mx"] == w["max_residual"]
        assert round(r["s"] / r["n"], 4) == w["avg_residual"]
