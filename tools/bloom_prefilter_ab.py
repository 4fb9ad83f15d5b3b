"""A/B: Bloom scan-side prefilter on the containment/decontamination
join (r13). Measures `corpus_decontaminate`-shaped work with and
without `containment_pairs(bloom_bits=...)` at a given SF dir:

- rows: corpus-side shingles entering the containment join's exchange
  (the quantity the prefilter exists to shrink — at 100 TB this IS the
  query's dominant shuffle);
- wall: warm wall-clock of the full decontamination (3 runs, median);
- equality: the admitted doc_id sets must be identical (zero false
  negatives end-to-end).

Run: python tools/bloom_prefilter_ab.py [sf_dir] [bits_log2]
     python tools/bloom_prefilter_ab.py synth [bits_log2] [corpus_n] [eval_n]

The `synth` mode measures the REALISTIC decontamination regime the
testdata can't show: a corpus whose shingles rarely hit the eval set
(testdata documents share one vocabulary, so ~38 % of corpus shingles
truly collide with src0 — no prefilter can prune below the true-match
rate). Synth corpus/eval draw from disjoint vocabularies with a small
planted contaminated slice, so the prune factor approaches the Bloom's
FP rate and the join exchange all but disappears.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _synth_tables(spark, corpus_n: int, eval_n: int):
    """Disjoint-vocabulary corpus/eval with a 1 % planted contaminated
    slice — the low-true-hit-rate regime real decontamination runs in."""
    import random

    corpus_vocab = [f"c{i}" for i in range(50_000)]
    eval_vocab = [f"e{i}" for i in range(2_000)]
    rnd = random.Random(13)
    eval_rows = [
        (1_000_000 + i, " ".join(rnd.choices(eval_vocab, k=30)))
        for i in range(eval_n)
    ]
    rows = []
    for i in range(corpus_n):
        if i % 100 == 0:  # planted: verbatim-contains an eval doc
            rows.append((i, eval_rows[i // 100 % eval_n][1] + f" tail {i}"))
        else:
            rows.append((i, " ".join(rnd.choices(corpus_vocab, k=40))))
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(rows, schema).repartition(32)
    bench = spark.createDataFrame(eval_rows, schema)
    return corpus.persist(), bench


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bits = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)

    import pyspark.sql.functions as F

    from pyspark_ingestion_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_words,
    )
    from pyspark_ingestion_spark.operators.dedup import (
        _cross_shingle_tables,
        containment_pairs,
    )
    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.sources.readers import load_table

    spark = get_spark_session(
        app_name="bloom-prefilter-ab",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    if sf_dir == "synth":
        corpus_n = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
        eval_n = int(sys.argv[4]) if len(sys.argv) > 4 else 200
        corpus, bench = _synth_tables(spark, corpus_n, eval_n)
        corpus.count()  # materialize outside the timed arms
    else:
        d = load_table(spark, sf_dir, "documents")
        bench = d.filter(F.col("source") == "src0")
        corpus = d.filter(F.col("source") != "src0")

    sb, sc = _cross_shingle_tables(corpus, bench, "doc_id", "text", 3, None)
    words = bloom_words(bloom_build(sb, "shingle", bits, 4), bits)
    total = sc.count()
    kept = sc.filter(bloom_might_contain("shingle", words, bits, 4)).count()
    print(
        f"join-input corpus shingles: {total} -> {kept} "
        f"({kept / total:.4f}) at {bits} bits"
    )

    def decon(bloom_bits):
        # the production (sink) shape precomputes the eval sketch ONCE —
        # pass it so the timed arm measures steady-state per-batch cost
        dirty = (
            containment_pairs(
                corpus, bench, "doc_id", "text", n=3,
                threshold_num=1, threshold_den=2, bloom_bits=bloom_bits,
                bloom_state=words if bloom_bits else None,
            )
            .select("corpus_id")
            .distinct()
        )
        out = corpus.join(
            F.broadcast(dirty), corpus["doc_id"] == dirty["corpus_id"], "left_anti"
        ).select("doc_id")
        return sorted(r["doc_id"] for r in out.collect())

    for arm, bb in [("exact", None), ("bloom", bits)]:
        runs = []
        result = None
        for _ in range(3):
            t0 = time.monotonic()
            result = decon(bb)
            runs.append(time.monotonic() - t0)
        print(f"{arm}: admitted={len(result)} wall={statistics.median(runs):.3f}s "
              f"(runs {[round(r, 3) for r in runs]})")
        if arm == "exact":
            exact_result = result
    assert result == exact_result, "bloom arm changed the admitted set!"
    print("admitted sets identical: True")
    spark.stop()


if __name__ == "__main__":
    main()
