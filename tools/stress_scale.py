"""Scale-stress harness: do the dedup/ANN operators scale ~linearly?

Generates synthetic corpora (docs with planted exact dups, near-dups and
a boilerplate hot shingle; constant-size embedding clusters so the TRUE
pair output grows linearly) at two sizes and times each operator at
both. A sub-quadratic operator scales by roughly the size ratio; a
quadratic pair-space bug shows up as a ratio² blow-up long before it
OOMs a real cluster. The embedding section also demonstrates the LSH
dial: candidate pairs are ~n²/2^b for b sign-bits, so holding per-bucket
population constant (add log2(growth) bits) is what keeps the stage
linear — measured here at 8 vs 12 bits.

Synthetic data is used ONLY for throughput-shape measurement —
correctness is pinned by the oracle-checked registry queries on the
driver's parquet fixtures. Results are recorded in SCALING.md.

Run: python tools/stress_scale.py [small_n] [big_n]
"""

from __future__ import annotations

import random
import sys
import time

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

WORDS = [f"w{i}" for i in range(5000)]
BOILER = "all rights reserved contact us terms of service apply here"


def make_docs(spark, n, seed=11):
    rnd = random.Random(seed)
    rows = []
    i = 0
    while i < n:
        body = " ".join(rnd.choices(WORDS, k=40))
        if rnd.random() < 0.3:           # 30% carry the boilerplate shingle run
            body = body + " " + BOILER
        rows.append((i, body)); i += 1
        r = rnd.random()
        if r < 0.01 and i < n:            # 1% exact duplicate
            rows.append((i, body)); i += 1
        elif r < 0.02 and i < n:          # 1% near duplicate (one word swapped)
            ws = body.split(); ws[rnd.randrange(len(ws))] = rnd.choice(WORDS)
            rows.append((i, " ".join(ws))); i += 1
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def make_boilerplate_docs(spark, n, template_frac=0.3, seed=17):
    """ADVERSARIAL corpus: one 40-word template shared by
    ``template_frac`` of the docs (each copy differing in two words),
    the rest random. Without the df cap the template copies' pair space
    is quadratic in the template count; the cap must keep both the
    candidate space and wall-clock in the linear regime (VERDICT r5
    item 6)."""
    rnd = random.Random(seed)
    template = [f"t{j}" for j in range(40)]
    rows = []
    for i in range(n):
        if rnd.random() < template_frac:
            ws = list(template)
            ws[(i * 7) % 40] = f"u{i}a"
            ws[(i * 11 + 3) % 40] = f"u{i}b"
            rows.append((i, " ".join(ws)))
        else:
            rows.append((i, " ".join(rnd.choices(WORDS, k=40))))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def make_embeddings(spark, n, dim=64, cluster_size=20, seed=13):
    """Constant CLUSTER SIZE (not cluster count): the true near-dup pair
    output then grows linearly with n, so stage timings measure join
    economics, not an output-quadratic corpus."""
    rnd = random.Random(seed)
    n_clusters = max(1, n // cluster_size)
    rows = []
    for c in range(n_clusters):
        center = [rnd.gauss(0, 1) for _ in range(dim)]
        for j in range(cluster_size):
            i = c * cluster_size + j
            if i >= n:
                break
            rows.append((i, [x + rnd.gauss(0, 0.10) for x in center]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(32)


def make_baskets(spark, n_orders, basket=6, seed=23):
    """(ok, part) basket table with CONSTANT basket size and parts ~
    n_orders/2 ids: the co-purchase graph's nodes AND edges then grow
    linearly with n_orders, so pagerank timings measure join/agg
    economics, not an output-quadratic graph."""
    rnd = random.Random(seed)
    n_parts = max(10, n_orders // 2)
    rows = [
        (o, rnd.randrange(n_parts))
        for o in range(n_orders)
        for _ in range(basket)
    ]
    return spark.createDataFrame(rows, "ok long, part long").repartition(32)


def pagerank_over(op):
    """The pagerank_copurchase body (queries/relational.py) over a
    synthetic (ok, part) basket table — same per-order pair build,
    symmetrization, localCheckpointed edge table and 5 unrolled damped
    power steps, so the measured growth is the query's shape."""
    op = op.distinct()
    pw = (
        op.select("ok", F.col("part").alias("src"))
        .join(op.select("ok", F.col("part").alias("dst")), "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    sym = pw.union(pw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    outw = sym.groupBy("src").agg(F.sum("w").alias("outw"))
    edges = sym.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    ).localCheckpoint(eager=False)
    n = edges.select("src").distinct().count()
    inv = 1.0 / n
    ranks = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "r", F.lit(inv)
    )
    for _ in range(5):
        ranks = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .groupBy("dst")
            .agg((F.lit(0.15) * F.lit(inv)
                  + F.lit(0.85) * F.sum(F.col("r") * F.col("p"))).alias("r"))
            .select(F.col("dst").alias("node"), "r")
        )
    return ranks.select("node", F.round("r", 6).alias("pagerank"))


def make_names(spark, n, block_pop=20, seed=29):
    """Name table with CONSTANT blocking-key population: ~half of each
    20-name block sits within edit distance 3 (true matches), the rest
    far — so the blocked pair space and the component count both grow
    linearly with n."""
    rows = []
    for i in range(n):
        blk = i // block_pop
        tail = f"x{i % 7}" if i % 2 == 0 else f"zq{i}fartail"
        rows.append((f"blk{blk} {tail}",))
    return spark.createDataFrame(rows, "p_name string").repartition(32)


def entity_over(names_df):
    """The entity_canonical_keep_one body over a synthetic name table:
    distinct-name collapse, first-token blocking, banded levenshtein
    edges, connected_components closure, per-entity rollup."""
    from pyspark_ingestion_spark.operators.dedup import connected_components

    names = names_df.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    blocked = names.select(
        "p_name", F.split("p_name", " ").getItem(0).alias("__block")
    )
    edges = (
        blocked.select(F.col("p_name").alias("name_a"), "__block")
        .join(blocked.select(F.col("p_name").alias("name_b"), "__block"), "__block")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b", 3) >= 0)
        )
        .select("name_a", "name_b")
    )
    comp = connected_components(edges, "name_a", "name_b")
    return (
        names.join(comp, names["p_name"] == comp["node"], "left")
        .groupBy(F.coalesce("component", "p_name").alias("entity"))
        .agg(F.count(F.lit(1)).alias("n_names"), F.sum("n_rows").alias("n_rows"))
    )


def stream_substring_batches(spark, corpus_n, n_batches=4, batch_rows=200, seed=31):
    """Mean steady-state per-batch seconds of INDEXED
    stream_substring_admission (dfcnt ledger, k=20, cap=10) at a given
    corpus size — the sink body on deterministic synthetic docs, batch 0
    (bootstrap) excluded. The claim under test: per-batch cost grows
    with the corpus only through SCANS (the candidate join against the
    windows index), never through a corpus-sized shuffle."""
    import shutil
    import tempfile

    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_substring_batch_indexed,
    )

    rnd = random.Random(seed)
    boiler = [
        "subscribe to our newsletter for the latest updates and offers",
        "all rights reserved reproduction without permission is prohibited",
    ]

    def rows(n, start):
        out = []
        for i in range(start, start + n):
            ws = rnd.choices(WORDS, k=40)
            if rnd.random() < 0.3:
                pos = rnd.randrange(len(ws))
                ws[pos:pos] = rnd.choice(boiler).split()
            out.append((i, " ".join(ws)))
        return out

    tmp = tempfile.mkdtemp(prefix="stress_substream_")
    try:
        spark.createDataFrame(
            rows(corpus_n, 0), "doc_id long, text string"
        ).repartition(32).write.mode("overwrite").parquet(f"{tmp}/base")
        base = spark.read.parquet(f"{tmp}/base")
        args = dict(id_col="doc_id", text_col="text", k=20, min_len=20,
                    max_window_df=10, sample_mod=None)
        times = []
        for bid in range(n_batches):
            bdf = spark.createDataFrame(
                rows(batch_rows, corpus_n + bid * 10_000),
                "doc_id long, text string",
            ).coalesce(2)
            t0 = time.perf_counter()
            _admit_substring_batch_indexed(
                bdf, bid, base, f"{tmp}/out", f"{tmp}/index", **args
            )
            times.append(time.perf_counter() - t0)
        steady = times[1:]
        dt = sum(steady) / len(steady)
        print(f"  stream_substring_admission (corpus {corpus_n:>7,})      "
              f"per-batch mean {dt:7.2f}s  (batches: "
              f"{', '.join(f'{t:.2f}' for t in times)})", flush=True)
        return dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def stream_semantic_batches(spark, corpus_n, n_batches=4, batch_rows=200,
                            n_dims=8, seed=37, quantizer="sign", nprobe=1):
    """Mean steady-state per-batch seconds of INDEXED
    stream_semantic_admission at a given corpus size (threshold 0.9,
    cluster-structured vectors so true rejects exist). Batch 0
    (bootstrap bucketing — and for ``quantizer="ivf"`` the one-off
    KMeans fit + centroid persist) excluded. The claim under test: the
    per-batch plan's only corpus-sized input is the SCAN of the buckets
    index through the batch-broadcast bucket equi-join — for BOTH bucket
    functions (r9: trained-IVF cells share the sign form's economics)."""
    import shutil
    import tempfile

    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_semantic_batch_indexed,
    )

    rnd = random.Random(seed)
    dim = 32

    def rows(n, start):
        out = []
        for i in range(start, start + n):
            center = [rnd.gauss(0, 1) for _ in range(dim)]
            out.append((i, [x + rnd.gauss(0, 0.05) for x in center]))
            if rnd.random() < 0.1:  # occasional near-dup of the previous
                out.append((i + 10_000_000,
                            [x + rnd.gauss(0, 0.02) for x in center]))
        return out

    tmp = tempfile.mkdtemp(prefix="stress_semstream_")
    try:
        spark.createDataFrame(
            rows(corpus_n, 0), "vec_id long, embedding array<double>"
        ).repartition(32).write.mode("overwrite").parquet(f"{tmp}/base")
        base = spark.read.parquet(f"{tmp}/base")
        args = dict(id_col="vec_id", vec_col="embedding", threshold=0.9,
                    n_dims=n_dims)
        if quantizer == "ivf":
            from pyspark_ingestion_spark.operators.similarity import (
                kmeans_centroids,
            )

            # K sized like the sign form's 2^n_dims nominal buckets;
            # trained once (ingest-time economics), persisted at bootstrap
            args["centroids"] = kmeans_centroids(
                base, id_col="vec_id", vec_col="embedding",
                n_centroids=2 ** n_dims, seed=42,
            )
            args["nprobe"] = nprobe
        times = []
        for bid in range(n_batches):
            bdf = spark.createDataFrame(
                rows(batch_rows, corpus_n + bid * 100_000),
                "vec_id long, embedding array<double>",
            ).coalesce(2)
            t0 = time.perf_counter()
            _admit_semantic_batch_indexed(
                bdf, bid, base, f"{tmp}/out", f"{tmp}/index", **args
            )
            times.append(time.perf_counter() - t0)
        steady = times[1:]
        dt = sum(steady) / len(steady)
        print(f"  stream_semantic_admission[{quantizer}] (corpus {corpus_n:>7,}) "
              f"per-batch mean {dt:7.2f}s  (batches: "
              f"{', '.join(f'{t:.2f}' for t in times)})", flush=True)
        return dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def timed(label, thunk):
    """Times the WHOLE operator: call (some operators run eager jobs
    inside) + count of the returned frame."""
    t0 = time.perf_counter()
    n = thunk().count()
    dt = time.perf_counter() - t0
    print(f"  {label:<46s} rows={n:>10,}  {dt:7.2f}s", flush=True)
    return dt


def main():
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    big_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark_ingestion_spark.operators.dedup import (
        connected_components,
        exact_dedup_groups,
        jaccard_similar_pairs,
        minhash_lsh_dedup_pairs,
    )
    from pyspark_ingestion_spark.operators.similarity import embedding_near_dup_pairs
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="stress-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JIT, codegen, shuffle service — so timing #1 isn't JVM startup
    warm = make_docs(spark, 2000)
    exact_dedup_groups(warm, "doc_id", "text").count()
    jaccard_similar_pairs(warm, "doc_id", "text", n=3,
                          threshold_num=1, threshold_den=2, max_doc_freq=25).count()

    results = {}
    for n in (small_n, big_n):
        print(f"== docs n={n:,}", flush=True)
        d = make_docs(spark, n).persist()
        d.count()
        r = {}
        r["exact"] = timed("exact_dedup_groups",
                           lambda: exact_dedup_groups(d, "doc_id", "text"))
        r["jaccard_dfcap"] = timed(
            "jaccard_similar_pairs (df-cap 25)",
            lambda: jaccard_similar_pairs(d, "doc_id", "text", n=3,
                                          threshold_num=1, threshold_den=2,
                                          max_doc_freq=25))
        r["minhash_lsh"] = timed(
            "minhash_lsh_dedup_pairs (df-cap 25)",
            lambda: minhash_lsh_dedup_pairs(d, "doc_id", "text",
                                            threshold_num=1, threshold_den=2,
                                            max_doc_freq=25))
        # r5: exact-substring spans. Planted exact/near dups share long
        # verbatim runs, so true span output grows linearly with n; the
        # 5000-word vocabulary keeps incidental 30-char window collisions
        # rare (unlike the sf0.1 word-soup fixtures). mod-4 sampling =
        # the 100 TB configuration.
        from pyspark_ingestion_spark.operators.dedup import repeated_substring_spans
        r["substring_spans"] = timed(
            "repeated_substring_spans (k=30, cap 25, mod-4)",
            lambda: repeated_substring_spans(d, "doc_id", "text", k=30,
                                             max_window_df=25, sample_mod=4))
        d.unpersist()
        results[("docs", n)] = r

    for n in (small_n, big_n):
        print(f"== boilerplate-adversarial docs n={n:,} (30% one template)", flush=True)
        d = make_boilerplate_docs(spark, n).persist()
        d.count()
        r = {}
        r["adv_minhash_lsh"] = timed(
            "minhash_lsh_dedup_pairs (df-cap 25)",
            lambda: minhash_lsh_dedup_pairs(d, "doc_id", "text",
                                            threshold_num=1, threshold_den=2,
                                            max_doc_freq=25))
        r["adv_jaccard_dfcap"] = timed(
            "jaccard_similar_pairs (df-cap 25)",
            lambda: jaccard_similar_pairs(d, "doc_id", "text", n=3,
                                          threshold_num=1, threshold_den=2,
                                          max_doc_freq=25))
        from pyspark_ingestion_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            release_shingle_caches,
        )
        r["adv_candidates"] = timed(
            "lsh_candidate_pairs (capped candidate SPACE)",
            lambda: lsh_candidate_pairs(
                minhash_signatures(d, "doc_id", "text", max_doc_freq=25)))
        release_shingle_caches()
        d.unpersist()
        results[("adv", n)] = r

    for n in (small_n, big_n):
        print(f"== embeddings n={n:,} (clusters of 20)", flush=True)
        e = make_embeddings(spark, n).persist()
        e.count()
        r = {}

        def pairs_at(bits):
            return embedding_near_dup_pairs(
                e, threshold=0.9, n_dims=bits,
                max_bucket_size=max(2000, n // 10),
            ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))

        r["near_dup_8b"] = timed("embedding_near_dup_pairs (8 sign bits)",
                                 lambda: pairs_at(8))
        if n == big_n:
            # the LSH dial: +log2(5)≈2..4 bits restores per-bucket population
            r["near_dup_12b"] = timed("embedding_near_dup_pairs (12 sign bits)",
                                      lambda: pairs_at(12))
        p = pairs_at(8).persist(); p.count()
        r["cc_driver"] = timed("connected_components (driver union-find)",
                               lambda: connected_components(p))
        r["cc_dist"] = timed("connected_components (distributed loop)",
                             lambda: connected_components(p, driver_max_edges=0))
        p.unpersist(); e.unpersist()
        results[("emb", n)] = r

    # r8 (VERDICT r7 item 8): graph + streaming headliners in the same
    # two-size harness
    for n in (small_n, big_n):
        print(f"== graph n={n:,} (baskets of 6 / blocks of 20)", flush=True)
        r = {}
        baskets = make_baskets(spark, n).persist()
        baskets.count()
        r["pagerank"] = timed("pagerank (5 unrolled power steps)",
                              lambda: pagerank_over(baskets))
        baskets.unpersist()
        names = make_names(spark, n).persist()
        names.count()
        r["entity_canonical"] = timed("entity_canonical (block+lev+cc+rollup)",
                                      lambda: entity_over(names))
        names.unpersist()
        results[("graph", n)] = r

    for n in (small_n, big_n):
        print(f"== streaming corpus n={n:,}", flush=True)
        results[("stream", n)] = {
            "substring_batch": stream_substring_batches(spark, n),
            "semantic_batch": stream_semantic_batches(spark, n),
            # r9: trained-IVF cells, nprobe=2 — must share the sign
            # form's flat per-batch economics
            "semantic_batch_ivf": stream_semantic_batches(
                spark, n, quantizer="ivf", nprobe=2
            ),
            # r10 (VERDICT r9 item 7): the recall dial's COST slope —
            # doubling nprobe doubles the candidate budget (recall
            # 0.29→0.51 at nprobe 2 per semantic_ivf_recall_eval); this
            # second sweep point makes a per-batch cost regression in
            # the dial visible round-over-round, not just its recall
            "semantic_batch_ivf_np4": stream_semantic_batches(
                spark, n, quantizer="ivf", nprobe=4
            ),
        }

    ratio = big_n / small_n
    print(f"\n== scaling ratios (size x{ratio:.0f}; ~linear <= ~x{ratio:.0f}, quadratic ~x{ratio*ratio:.0f})")
    for sect in ("docs", "adv", "emb", "graph", "stream"):
        for key, a in results[(sect, small_n)].items():
            b = results[(sect, big_n)].get(key)
            if b is not None:
                print(f"  {sect}/{key:<16s} {a:6.2f}s -> {b:7.2f}s   x{b/a:5.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
