"""Table profiling — ANALYZE-style column statistics in one pass.

An ingestion engine that lands tables into a lake needs per-column
statistics: row/null/distinct counts and min/max bounds (the min/max of
the reference's ``ref_column`` IS its incremental watermark, cf.
/root/reference/pyspark_ingestion/ingestion/ingestion.py:62-78 which
computes ``F.max`` of the reference column after load). Profiling also
feeds partition sizing and join-strategy decisions at 100 TB.

Everything is computed in ONE aggregation pass: Spark plans multiple
``count_distinct`` columns via an Expand node (k-fold row multiplication
before the partial aggregate), so the input is still scanned once —
preferable to k separate jobs. Profile k is per-call bounded (profile
the columns you need, not SELECT *).

Min/max are surfaced as strings so one long-format result covers
heterogeneous column types; callers needing typed bounds query the
column directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row of statistics per requested column.

    Returns (column_name, n_rows, n_nonnull, n_distinct, min_value,
    max_value) — min/max cast to string. Single aggregation job; the
    long format comes from an explode over the one aggregated row.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in columns
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def quality_checks(
    df,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    fk: tuple[str, "DataFrame", str] | None = None,
) -> "DataFrame":
    """Declarative data-quality audit → ONE row of violation counts.

    The ingestion-gate pattern: after a batch lands, count (a) NULLs in
    required columns, (b) surplus duplicate key values, (c) orphaned
    foreign keys, and fail the pipeline when any count is nonzero. Each
    check is an aggregate (the uniqueness check one groupBy on its key,
    the FK check an anti-join against the distinct parent keys), the
    single-row results cross-join together (1×1 rows — free), and the
    driver sees one scalar row, never data.

    ``fk`` is (local_col, parent_df, parent_col).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    if not_null_cols:
        parts.append(
            df.agg(
                *[
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long")
                    .alias(f"null_{c}")
                    for c in not_null_cols
                ]
            )
        )
    for c in unique_cols or []:
        # SQL UNIQUE semantics: NULLs are not duplicates of each other
        # (a nullable-but-unique column must be able to pass the gate;
        # nullability itself is the not_null_cols check's job)
        parts.append(
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias(f"dup_{c}"))
        )
    if fk is not None:
        local_col, parent, parent_col = fk
        parts.append(
            df.select(F.col(local_col))
            .filter(F.col(local_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(local_col)).distinct(),
                local_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias(f"orphan_{local_col}"))
        )
    if not parts:
        raise ValueError("quality_checks: no checks requested")
    return reduce(lambda a, b: a.crossJoin(b), parts)


def key_skew_profile(df, key_col: str, top_k: int = 5) -> "DataFrame":
    """Skew diagnostic for a prospective join/groupBy key: the top-k
    heaviest key values with their absolute counts and share of all
    rows.

    The number that decides a physical strategy: a top share near 1/n_
    partitions is benign; a single key holding 10%+ of a 100 TB table
    will straggle any hash-partitioned join and wants salting
    (``relational.salted_join``), AQE skew-split, or a broadcast of the
    other side. One map-side-combined count per key plus a top-k sort of
    the (small) per-key count table — no second pass over the data.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(top_k)
    )


def route_quarantine(df, rules) -> "DataFrame":
    """Row-level validation routing: append ``disposition`` = 'valid' or
    'quarantine:<first-failed-rule>' (rules checked in order, first
    failure wins; a NULL rule result counts as a failure — unknowable
    data is quarantined, not silently passed).

    ``rules`` is an ordered list of (name, must-hold Column). The whole
    thing is one CASE expression evaluated scan-side — no shuffle, no
    second pass; the valid/quarantine split downstream is two filters on
    one column (or a partitioned write on it), the standard good-rows /
    bad-rows ingestion pattern.
    """
    from pyspark.sql import functions as F

    disposition = F.lit("valid")
    for name, cond in reversed(list(rules)):
        failed = (~cond) | cond.isNull()
        disposition = F.when(failed, F.lit(f"quarantine:{name}")).otherwise(disposition)
    return df.withColumn("disposition", disposition)


def feature_histogram(
    df: "DataFrame",
    col: "str",
    edges: "list[float]",
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
) -> "DataFrame":
    """Fixed-edge histogram counts ``(bucket, cnt)`` of a numeric
    column — the MERGEABLE feed of the distribution-drift monitor
    (r14): counts sum across batches/partitions/days exactly (the same
    re-aggregation contract as the CMS cells and IVF residual stats),
    so per-batch histograms roll up to the corpus histogram without
    rescanning rows.

    ``bucket = #{edges e : value >= e}`` — 0 below the first edge,
    ``len(edges)`` at/above the last; NULLs are dropped (count them
    via :func:`profile_columns` if they matter). The edges are plan
    literals fixed BY THE CALLER (drift comparison is only meaningful
    against a shared binning — deriving edges from the data would make
    the baseline a moving target), giving O(len(edges)) comparisons
    per row and one map-side-combined aggregate onto a key space of
    ``len(edges)+1`` buckets. Deterministic integer bucketing, so an
    ANSI SQL mirror is exact.
    """
    from pyspark.sql import functions as F

    if not edges or sorted(edges) != list(edges):
        raise ValueError(f"edges must be a non-empty ascending list, got {edges}")
    v = F.col(col)
    bucket = None
    for e in edges:
        t = (v >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    return (
        df.filter(v.isNotNull())
        .select(bucket.alias(bucket_col))
        .groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias(cnt_col))
    )


def distribution_drift(
    current: "DataFrame",
    baseline: "DataFrame",
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
    min_frac: float = 1e-4,
    round_dp: int = 6,
) -> "DataFrame":
    """Population Stability Index terms between two histograms over the
    SAME edges — the quality-tier sibling of ``ivf_drift_flags``: where
    the IVF monitor watches embedding residuals drift away from a
    centroid generation, this watches a FEATURE DISTRIBUTION (quality
    score, doc length, token count ...) drift away from the corpus the
    filters/thresholds were tuned on.

    Per bucket present in EITHER frame:
    ``psi_term = (p_cur − p_base) · ln(p_cur / p_base)`` with both
    proportions floored at ``min_frac`` (the standard PSI stabilizer —
    an empty bucket would otherwise yield ±Inf; a bucket empty in BOTH
    frames contributes exactly 0, so restricting to the union domain
    loses nothing). ``sum(psi_term)`` is the feature's PSI; the usual
    reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 drifted —
    act like a retrain flag. Proportions and terms are rounded for
    cross-engine-stable hashing; the inputs are K-bucket tables, so
    the join broadcasts and nothing here touches rows.
    """
    from pyspark.sql import functions as F

    cur = current.groupBy(bucket_col).agg(F.sum(cnt_col).alias("__cc"))
    base = baseline.groupBy(bucket_col).agg(F.sum(cnt_col).alias("__cb"))
    tot_c = cur.agg(F.sum("__cc").alias("__tc"))
    tot_b = base.agg(F.sum("__cb").alias("__tb"))
    j = (
        cur.join(base, bucket_col, "full_outer")
        .crossJoin(F.broadcast(tot_c))
        .crossJoin(F.broadcast(tot_b))
    )
    p_cur = F.greatest(
        F.coalesce(F.col("__cc"), F.lit(0)) / F.col("__tc"), F.lit(min_frac)
    )
    p_base = F.greatest(
        F.coalesce(F.col("__cb"), F.lit(0)) / F.col("__tb"), F.lit(min_frac)
    )
    return j.select(
        bucket_col,
        F.coalesce(F.col("__cc"), F.lit(0)).alias("n_cur"),
        F.coalesce(F.col("__cb"), F.lit(0)).alias("n_base"),
        F.round(p_cur, round_dp).alias("p_cur"),
        F.round(p_base, round_dp).alias("p_base"),
        F.round((p_cur - p_base) * F.log(p_cur / p_base), round_dp).alias(
            "psi_term"
        ),
    )


def token_cms_buckets(
    df: "DataFrame",
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> "DataFrame":
    """Per-token sketch coordinates ``(term, i, bucket)``, one row per
    token occurrence × hash row — the SINGLE definition of the
    deterministic count-min bucketing: hash row i buckets a term via
    the cross-engine md5 fingerprint
    (``conv(substr(md5(i|term),1,15),16,10) % width``) — no RNG, so the
    sketch is reproducible across engines, runs, and partial rebuilds.
    Shared by the batch heavy-hitters query (which also derives the
    per-term estimates from these rows) and the streaming maintenance
    sink, so the two can never drift."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.functions.text import words

    tok = df.select(F.explode(words(F.lower(F.col(text_col)))).alias("term"))
    return (
        tok.select(
            "term",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
        )
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("i").cast("string"), F.col("term"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % width,
        )
    )


def token_cms_cells(
    df: "DataFrame",
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> "DataFrame":
    """Deterministic count-min-sketch cells over a document frame's token
    stream: ``(i, bucket, cnt)`` for i < depth, bucket < width.

    Cells are COUNTERS, so sketches merge by cell-wise sum: the sketch
    of a corpus equals the summed cells of any partition of it — the
    property both the batch query (`approx_topk_heavy_hitters`) and the
    streaming maintenance sink (`streaming.pipeline.stream_token_cms`)
    build on. One explode + one map-side-combined aggregate onto a key
    space hard-capped at depth×width cells.
    """
    from pyspark.sql import functions as F

    return (
        token_cms_buckets(df, text_col, depth, width)
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
