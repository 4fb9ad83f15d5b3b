"""Incremental maintenance of aggregate (rollup) tables.

A 100 TB fact table is rarely queried raw; dashboards hit pre-computed
daily/dimensional rollups. Recomputing a rollup from scratch per batch
re-reads the whole fact history, so this maintains it incrementally:
aggregate ONLY the incoming batch, then merge with the stored rollup by
re-aggregating just the partitions the batch touches. Cost per batch is
O(batch + affected rollup partitions), independent of table history.

Works for decomposable aggregates — the merge re-aggregates stored
partials with batch partials, which is exact for algebraic functions
(sum/count/min/max, and avg carried as sum+count). Non-decomposable
aggregates (exact distinct, median) need either a sketch column
(HLL/quantile sketches union-merge fine — see
``relational.agg_hll_mergeable_sketch``) or a full recompute of the
affected partitions from the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_ingestion_spark.sources.writers import overwrite_partitions


def maintain_rollup(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    group_cols: list[str],
    agg_exprs: dict[str, Column],
    partition_columns: list[str],
    file_format: str = "parquet",
) -> None:
    """Fold one fact batch into the rollup at ``rollup_path``.

    ``group_cols`` must include ``partition_columns`` (the rollup's
    grain contains its layout). ``agg_exprs`` maps output column name →
    aggregate over the BATCH rows; the same name must re-aggregate
    correctly over partials (sum over sums, min over mins, count
    carried as ``sum``) — pass ``merge_exprs``-style expressions keyed
    by the output column, e.g. ``{"n": F.count(F.lit(1))}`` with the
    understanding that the merge step uses ``sum(n)``.

    Merge rule per output column, applied to (stored ∪ batch-partial):
    ``count``→sum, ``sum``→sum, ``min``→min, ``max``→max — detected
    from the aggregate's first function name. Anything else raises:
    non-decomposable merges must go through sketches or recompute.
    """
    missing = [c for c in partition_columns if c not in group_cols]
    if missing:
        raise ValueError(f"partition columns {missing} must be part of group_cols")

    def _merge_fn(name: str, col: Column) -> Column:
        # The function name + DISTINCT flag come from the column node
        # (Spark 4 classic). This matters: str(F.count_distinct(x))
        # renders IDENTICALLY to str(F.count(x)) (verified on 4.1.2), so
        # a string-only check would merge a distinct-count via sum —
        # silently wrong, not an error. Names are matched EXACTLY
        # (min_by/max_by must not pass as min/max: their merge would
        # return the min of the VALUE column, not the value at the min
        # ordering key). The string parse remains only as a fallback for
        # runtimes without the node API, where DISTINCT aggregates are
        # undetectable — documented residual risk of that path.
        distinct = False
        try:
            node = col._jc.node()
            fn = node.functionName().lower()
            distinct = bool(node.isDistinct())
        except Exception:
            rendered = str(col).split("'", 1)[-1]
            fn = rendered.split("(")[0].strip().lower()
            if "distinct" in rendered.lower():
                distinct = True
        if distinct:
            raise ValueError(
                f"aggregate {name!r} uses DISTINCT — not decomposable (a value "
                "seen by two batches would be double-counted); use an HLL/theta "
                "sketch column instead"
            )
        if fn in ("count", "sum"):
            return F.sum(name).alias(name)
        if fn == "min":
            return F.min(name).alias(name)
        if fn == "max":
            return F.max(name).alias(name)
        raise ValueError(
            f"aggregate {name}={fn!r} is not decomposable; use a sketch column "
            "or recompute the affected partitions from the fact table"
        )

    merge_aggs = [_merge_fn(n, c) for n, c in agg_exprs.items()]
    partial = batch.groupBy(*group_cols).agg(
        *[c.alias(n) for n, c in agg_exprs.items()]
    )

    touched = [
        tuple(r) for r in partial.select(*partition_columns).distinct().collect()
    ]
    if not touched:
        return
    try:
        stored = spark.read.format(file_format).load(rollup_path)
        from functools import reduce

        part_filter = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda x, y: x & y,
                    [F.col(c) == F.lit(v) for c, v in zip(partition_columns, vals)],
                )
                for vals in touched
            ],
        )
        merged = (
            stored.filter(part_filter)
            .select(*partial.columns)
            .unionByName(partial)
            .groupBy(*group_cols)
            .agg(*merge_aggs)
        )
    except Exception as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        merged = partial
    merged = merged.localCheckpoint(eager=True)
    overwrite_partitions(
        merged, rollup_path, partition_columns=partition_columns,
        file_format=file_format,
    )
