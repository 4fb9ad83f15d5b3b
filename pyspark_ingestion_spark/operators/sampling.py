"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs and engines — no RNG seed drift, no
dependence on partition layout — and (b) stable under corpus growth: a
doc's bucket never changes when other docs are added or removed, so a
10 % sample of yesterday's corpus is a strict subset of today's.

Spark's ``df.sample``/``sampleBy`` give neither (seeded per-partition
RNG). Content-hash bucketing gives both: bucket(id) = md5(id) mod B is
a pure function of the row's own key. The filter is a per-row predicate
evaluated inside the scan stage (md5 isn't a parquet row-group filter,
so all rows are read — but nothing shuffles and nothing coordinates;
the sample falls out of the single scan pass every downstream op was
going to pay anyway).

The md5-prefix construction matches the MinHash hashing in
operators/dedup.py (first 7 hex digits → 28-bit int), keeping the whole
engine's hashing story uniform and DuckDB-oracle-checkable.

NULL keys: md5(NULL) is NULL, so ``hash_bucket`` of a NULL id is NULL —
threshold filters (deterministic_sample, weighted_domain_mix) DROP such
rows, while train_val_test_split's otherwise-branch routes them to
'test'. Sample keys are primary keys by contract; if your id column is
nullable, coalesce it (or filter) upstream explicitly rather than
relying on either behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key's string form."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def deterministic_sample(
    df: DataFrame, id_col: str, keep: int = 10, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < ``keep`` — a keep/buckets fraction.

    Appends the ``bucket`` column (useful for stratified downstream
    splits of the same sample).
    """
    return df.withColumn("bucket", hash_bucket(id_col, buckets)).filter(
        F.col("bucket") < keep
    )


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, k: int
) -> DataFrame:
    """Deterministic k rows per stratum: the k smallest md5(id) per group.

    Hash-ordering makes the choice uniform-ish within a stratum yet
    fully reproducible (no RNG). One shuffle on the stratum key; at
    scale, a giant stratum is first thinned by a hash-threshold
    pre-filter (cheap scan predicate) before the exact per-group top-k,
    the same pre-filter + exact-re-rank shape the similarity operators
    use. Appends ``rn`` (1-based rank within the stratum).
    """
    from pyspark_ingestion_spark.operators.relational import topk_per_group

    return topk_per_group(
        df,
        [strata_col],
        [F.md5(F.col(id_col).cast("string")), F.col(id_col)],
        k,
        rank_col="rn",
        keep_rank=True,
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train: int = 80,
    val: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Assign each row a stable ``split`` label by hash bucket.

    buckets [0, train) → 'train', [train, train+val) → 'val', rest →
    'test'. Because the bucket is a pure function of the row key, the
    assignment is identical on every run, engine, and corpus snapshot —
    no leakage of val/test docs into train when the corpus is re-split
    after growth.
    """
    if train + val > buckets or train < 1:
        raise ValueError(
            f"train ({train}) + val ({val}) must fit inside buckets ({buckets}) "
            "with room for test — buckets >= train + val; an oversized train/val "
            "would silently produce an empty split"
        )
    b = hash_bucket(id_col, buckets)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train, F.lit("train"))
        .when(F.col("bucket") < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_domain_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 0.1,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic domain-mixture downsampling: keep each domain at its
    target sampling rate (0..1], decided per row by content-hash bucket.

    The standard corpus-mixing step (wiki at 1.0, web crawl at 0.1, ...)
    as a pure scan-side predicate: no shuffle, no per-domain pass, no
    RNG. Because the bucket is a function of the row key alone, the kept
    set is stable under corpus growth and identical across engines, and
    raising a domain's weight later only ADDS docs — existing training
    sets stay strict subsets. Appends ``bucket``.
    """
    def _threshold(label: str, w: float) -> int:
        if not 0.0 < w <= 1.0:
            raise ValueError(f"weight for {label} must be in (0, 1], got {w}")
        t = int(round(w * buckets))
        if t == 0:
            # a positive weight quantizing to bucket threshold 0 would
            # silently DROP the whole domain the caller asked to keep
            raise ValueError(
                f"weight {w} for {label} is below the bucket resolution "
                f"1/{buckets}; raise `buckets` to keep this domain"
            )
        return t

    threshold = F.lit(_threshold("default_weight", default_weight))
    for dom, w in sorted(weights.items()):
        threshold = F.when(
            F.col(domain_col) == dom, F.lit(_threshold(repr(dom), w))
        ).otherwise(threshold)
    return df.withColumn("bucket", hash_bucket(id_col, buckets)).filter(
        F.col("bucket") < threshold
    )


def shuffle_assign(df: DataFrame, id_col: str, n_shards: int = 8) -> DataFrame:
    """Deterministic global training-order shuffle: shard + position.

    Training wants the corpus in a fixed pseudo-random order, but a
    global ORDER BY md5(id) funnels 100 TB through a single range sort.
    Instead: shard = hash(id) mod n_shards (scan-side), position =
    row_number within the shard ordered by (md5 hex, id). Each shard
    sorts independently — n_shards parallel sorts of corpus/n_shards
    rows — and the reader interleaves shards round-robin. The order is a
    pure function of the key set: reproducible across runs, engines, and
    partition layouts. Appends ``shard`` and ``position`` (1-based).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
    return df.withColumn("shard", shard).withColumn(
        "position", F.row_number().over(w).cast("long")
    )
