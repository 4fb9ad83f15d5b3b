"""Relational operators the reference lacked (SURVEY §2.5 gap table).

The reference has no joins, grouped aggregation, windows, or set ops —
these are the Spark-native building blocks a user of a complete engine
needs. Everything here is a pure ``DataFrame → DataFrame`` composition
of Catalyst-optimizable primitives; none of it drops to RDDs or Python
UDFs.

Scale notes are per-function; the common theme: express the operator so
the only shuffles are on declared keys (AQE handles sizing/skew), and
never turn an as-of/range semantics into an exploded cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` over a window.

    One shuffle on ``group_cols``; no global sort. At scale this beats
    ``orderBy().limit()`` per group because each group ranks locally
    after the hash partition.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def dedupe_latest(
    df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[Column | str]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_cols`` ordering.

    The deterministic version of ``dropDuplicates`` (which keeps an
    arbitrary row); use e.g. ``[F.desc("updated_at")]`` for latest-wins
    CDC compaction.
    """
    return topk_per_group(df, key_cols, order_cols, k=1)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` keys (backward,
    inclusive — DuckDB/pandas ``merge_asof`` semantics). Left rows with
    no prior right row get NULLs. ``direction="forward"`` mirrors the
    scan (earliest right row with ``right_ts >= left_ts``, inclusive);
    nearest-match semantics compose from one pass of each direction
    plus a distance CASE (see ``join_asof_nearest``).

    Implementation is the union+window pattern, NOT a join: tag both
    sides, union, sort within each key by (ts, side) so right rows at an
    equal timestamp precede left rows, then carry the last non-null
    right payload forward with ``last(..., ignorenulls)``. Cost is one
    shuffle on ``by`` and a per-key sort — no range-explosion, no skew
    amplification, which is what makes it usable on billions of rows
    where an inequality join would cross-product hot keys.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = list(by)
    right_cols = list(right_cols if right_cols is not None else
                      [c for c in right.columns if c not in by and c != right_ts])

    payload = F.struct(F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols])
    # NULL-timestamp rows participate in no match on either side (the
    # merge_asof contract): a NULL-ts RIGHT row would otherwise sort to
    # one end of the scan and its payload would bleed into real rows
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # align schemas: right side gets left's non-key columns as nulls
    left_extra = [c for c in left.columns if c not in by]
    r_aligned = r.select(
        *by,
        "__ts",
        "__side",
        "__payload",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_extra],
    )
    l_aligned = l.select(*by, "__ts", "__side", "__payload", *left_extra)

    # forward = the same scan over a mirrored ordering: walking ts
    # DESCENDING, "the last right row seen at-or-before the current row"
    # is exactly the earliest right row with right_ts >= left_ts. Right
    # rows order before left rows at an equal ts in both directions, so
    # both scans are inclusive. NULLS FIRST in BOTH directions: a left
    # row with a NULL timestamp must see no candidates (plain .desc()
    # defaults to NULLS LAST, which handed NULL-ts left rows the
    # earliest right row — wrong and inconsistent with backward).
    ts_order = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_aligned.unionByName(l_aligned)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [*by, *left_extra]
    result = matched.select(
        *out_cols,
        F.col(f"__match.{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return result


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Sequence[tuple[str, str]],
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Join on equality keys plus a range predicate.

    With at least one equi key, Catalyst executes this as a hash/sort-merge
    join on the keys with the range condition as a post-join filter — no
    cartesian product. A pure range join (no equi key) would broadcast-
    nested-loop; callers should bucket/bin first in that case.
    """
    cond = None
    for lc, rc in equi:
        c = left[lc] == right[rc]
        cond = c if cond is None else cond & c
    cond = range_cond if cond is None else cond & range_cond
    return left.join(right, cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting — the skew-mitigation pattern.

    A hot key concentrates its whole pair-space in one task under a
    plain shuffle join; salting splits each key into ``n_salts``
    sub-partitions: the (big, skewed) left side gets a deterministic
    salt from hashing its full row, the (smaller) right side is
    replicated once per salt via a sequence+explode. Join on
    (key, salt) → the hot key's work spreads over ``n_salts`` tasks.

    AQE's skew-join handles most cases automatically (session factory
    enables it); explicit salting remains for the pathological keys AQE
    can't split — e.g. a single key too large for any one task's memory
    in a sort-merge join, or skewed aggregations.

    Result equals ``left.join(right, on, how)`` for inner/left joins.
    Right/full-outer are rejected: the replicated right side would emit
    unmatched right rows once per salt copy (silently wrong results).
    """
    if how.replace("outer", "").strip("_") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the right side is replicated per salt, so right/full outer "
            "would duplicate unmatched right rows"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")


def sequence_gaps(
    df: DataFrame, id_col: str, shard_width: int = 100_000
) -> DataFrame:
    """Gaps in a sequence-keyed id space: every (gap_after, resume_at,
    missing) where consecutive distinct ids differ by more than 1.

    Sharded so the sort is never global: ids hash-partition by
    ``id DIV shard_width`` and ``lead`` runs per shard in parallel;
    cross-shard gaps are recovered from ONE window over the per-shard
    (min, max) summaries — at most |id space| / shard_width rows, so
    that single-partition sort is bounded by construction, not by the
    data (10¹² ids at width 10⁶ → 10⁶ summary rows). Empty shards need
    no special case: ``lead`` over the summaries skips them, and a gap
    spanning whole shards surfaces as one boundary row. Negative ids
    work too — ``floor`` division keeps shard order consistent with id
    order.
    """
    k = (
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("__shard", F.floor(F.col("id") / shard_width))
    )
    inner = k.withColumn(
        "next_id", F.lead("id").over(Window.partitionBy("__shard").orderBy("id"))
    ).filter(F.col("next_id") - F.col("id") > 1)

    summaries = k.groupBy("__shard").agg(
        F.min("id").alias("__lo"), F.max("id").alias("__hi")
    )
    boundary = (
        summaries.withColumn(
            "next_id", F.lead("__lo").over(Window.orderBy("__shard"))
        )
        .filter(F.col("next_id") - F.col("__hi") > 1)
        .select(F.col("__hi").alias("id"), "next_id")
    )
    return (
        inner.select("id", "next_id")
        .unionByName(boundary)
        .select(
            F.col("id").alias("gap_after"),
            F.col("next_id").alias("resume_at"),
            (F.col("next_id") - F.col("id") - 1).alias("missing"),
        )
    )


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[str],
    n: int,
    out_col: str = "tile",
    shards: int | None = None,
) -> DataFrame:
    """Exact global ``ntile(n)`` without a single-partition window.

    Spark's ``ntile`` over an unpartitioned window drags every row
    through ONE task. This computes the identical bucket assignment in
    parallel: range-repartition on the order keys (shards hold disjoint,
    ascending key ranges — equal keys never split, and callers pass a
    tie-break key so ranks are total), ``row_number`` within each shard,
    then add per-shard prefix offsets — a window over the SHARD-COUNT
    table, at most ``shards`` rows, bounded by construction like
    ``sequence_gaps``' boundary summary — and map the exact global rank
    through Spark's own ntile formula (first ``total % n`` buckets get
    the extra row). AQE may coalesce adjacent ranges; ids stay ascending
    so ranks are unaffected. Results are bit-identical to
    ``F.ntile(n).over(Window.orderBy(*order_cols))`` (property-tested).

    The sharded-rank table is materialized once (non-eager
    ``localCheckpoint``, released by the ContextCleaner) because BOTH
    consumers — the offset aggregate and the final join — must see the
    SAME physical sharding: ``repartitionByRange`` draws its boundaries
    from a sample whose seed is not stable across re-evaluations, so two
    plan instances of the exchange can disagree on which shard a
    borderline row lands in (observed as off-by-one tiles at 4 shards).
    Cost: one extra write of the ranked table — the price of exactness;
    the approximate alternative (percentile-boundary bucketing) avoids
    it when exact tile populations aren't required.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    n = int(n)
    spark = df.sparkSession
    if shards:
        shards = int(shards)
    else:
        try:
            shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:  # platforms set this to e.g. "auto"
            shards = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(shards, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(*cols)
    t = ranged.withColumn("__rn", F.row_number().over(w_in)).localCheckpoint(
        eager=False
    )
    counts = t.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_pre = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_pre), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__total"),
    )
    # all tile arithmetic in LONG integer ops (`DIV`, `%`, `*`): Spark's
    # `/` on longs yields double, which is exact only below 2^53 — DIV
    # keeps the bit-identical-to-F.ntile guarantee at any row count
    q = f"(__total DIV {n})"                          # floor: totals are non-negative
    r = f"(__total % {n})"
    big = f"({r} * ({q} + 1))"                        # rows living in the larger buckets
    q_safe = f"GREATEST({q}, 1L)"                     # q=0 ⇒ every rank is in `big`
    tile = F.expr(
        f"CAST(CASE WHEN __rank <= {big} THEN (__rank - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + (__rank - {big} - 1) DIV {q_safe} + 1 END AS INT)"
    )
    return (
        t.join(F.broadcast(offs), "__pid")
        .withColumn("__rank", F.col("__off") + F.col("__rn"))
        .withColumn(out_col, tile)
        .drop("__pid", "__rn", "__off", "__total", "__rank")
    )


def hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "__h",
) -> DataFrame:
    """Hilbert space-filling-curve index of two integer dimensions — the
    locality-better sibling of the z-order interleave
    (``zorder_layout_pruning``): consecutive curve positions are always
    GRID NEIGHBORS (no z-curve jumps), so range-partitioning by the
    index packs files into tighter bounding boxes and min/max pruning
    skips more of them. This is the curve behind lakehouse clustering
    features that outgrew OPTIMIZE ZORDER.

    Standard top-down xy→d walk, one round per bit from ``s = 2^(bits-1)``
    down to 1: quadrant digit ``(3·rx + ry − 2·rx·ry)`` (the arithmetic
    form of ``(3·rx) XOR ry`` — portable to engines where ``^`` is not
    XOR) accumulates into ``d``; the (flip, swap) rotation re-expresses
    x/y for the next round. Implemented as per-round column
    REASSIGNMENT (select-chained; the plan grows linearly in ``bits``)
    — a single nested expression would double per round. Pure integer
    arithmetic end to end, so a recursive-CTE SQL mirror is bit-exact;
    bijectivity + the neighbor property are pinned in pytest. Inputs
    must be non-negative and < 2^bits — out-of-range values would
    alias quadrants silently, so a per-row ``assert_true`` guard makes
    them RAISE instead (the ``pq_encode`` dim-guard pattern, r12/r13:
    measured cost nothing against a constant-folded bound; rescale
    first if your domain is wider).
    """
    if bits < 1 or bits > 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    lim = 1 << bits
    x0, y0 = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    guard = F.assert_true(
        (x0 >= 0) & (x0 < lim) & (y0 >= 0) & (y0 < lim),
        F.lit(
            f"hilbert_index: inputs must be in [0, 2^{bits}) — out-of-range "
            "values would alias quadrants; rescale first"
        ),
    )
    out = df.select(
        "*",
        F.when(guard.isNull(), x0).alias("__hx"),
        F.when(guard.isNull(), y0).alias("__hy"),
        F.lit(0).cast("long").alias(out_col),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        out = out.select("*", rx.alias("__rx"), ry.alias("__ry"))
        digit = (
            3 * F.col("__rx") + F.col("__ry")
            - 2 * F.col("__rx") * F.col("__ry")
        )
        flip = (F.col("__ry") == 0) & (F.col("__rx") == 1)
        swap = F.col("__ry") == 0
        fx = F.when(flip, F.lit(s - 1) - F.col("__hx")).otherwise(F.col("__hx"))
        fy = F.when(flip, F.lit(s - 1) - F.col("__hy")).otherwise(F.col("__hy"))
        out = (
            out.withColumn(out_col, F.col(out_col) + F.lit(s) * F.lit(s) * digit)
            .select("*", fx.alias("__fx"), fy.alias("__fy"))
            .withColumn("__nx", F.when(swap, F.col("__fy")).otherwise(F.col("__fx")))
            .withColumn("__ny", F.when(swap, F.col("__fx")).otherwise(F.col("__fy")))
            .drop("__hx", "__hy", "__rx", "__ry", "__fx", "__fy")
            .withColumnRenamed("__nx", "__hx")
            .withColumnRenamed("__ny", "__hy")
        )
    return out.drop("__hx", "__hy")


def hilbert_index_nd(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "__h",
) -> DataFrame:
    """N-dimensional Hilbert index (r14 — the d≥3 generalization of
    :func:`hilbert_index`, which keeps the classic 2-D walk for the
    (date, id)-style layouts it models; the two ORIENTATIONS differ, so
    indexes are not cross-compatible — pick one per table and stay on
    it).

    Skilling's transpose algorithm (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — public): the axes walk
    runs ``(bits−1)·n`` rounds of pure XOR/AND column reassignment
    (select-chained, plan linear in ``bits·n``), then the Gray decode,
    then the exchange-fold ``t`` — computed here in CLOSED FORM instead
    of Skilling's second loop: bit ``j`` of ``t`` is the parity of the
    set bits of ``X[n−1]`` above position ``j``
    (``bit_count(x >> (j+1)) % 2``), which both Spark and ANSI SQL
    mirrors evaluate without recursion. The final index interleaves the
    transposed bits round-robin, axis 0 most significant. Everything is
    integer/bitwise arithmetic end to end, so a recursive-CTE SQL
    mirror is bit-exact (driver row ``hilbert3_index_fixture``);
    bijectivity + the grid-neighbor property are pinned in pytest for
    n = 3 over the full cube.

    Same per-row range guard as the 2-D walk: inputs must lie in
    ``[0, 2^bits)`` or the row RAISES (aliased quadrants would silently
    interleave wrong); ``bits·n`` must fit a signed 64-bit index.
    """
    n = len(cols)
    if n < 2:
        raise ValueError(f"need at least 2 dimensions, got {n}")
    if bits < 1 or bits * n > 63:
        raise ValueError(
            f"bits*ndims must be in [1, 63] to fit a BIGINT index, "
            f"got bits={bits} * n={n} = {bits * n}"
        )
    lim = 1 << bits
    raw = [F.col(c).cast("long") for c in cols]
    in_range = None
    for x in raw:
        ok = (x >= 0) & (x < lim)
        in_range = ok if in_range is None else (in_range & ok)
    guard = F.assert_true(
        in_range,
        F.lit(
            f"hilbert_index_nd: inputs must be in [0, 2^{bits}) — "
            "out-of-range values would alias quadrants; rescale first"
        ),
    )
    xs = [f"__hn{i}" for i in range(n)]
    out = df.select(
        "*", *[F.when(guard.isNull(), x).alias(c) for x, c in zip(raw, xs)]
    )
    # axes -> transpose: one (Q, i) step per select round
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            x0, xi = F.col(xs[0]), F.col(xs[i])
            cond = xi.bitwiseAND(F.lit(q)) > 0
            if i == 0:
                new0 = F.when(cond, x0.bitwiseXOR(F.lit(p))).otherwise(x0)
                out = (
                    out.select("*", new0.alias("__n0"))
                    .drop(xs[0])
                    .withColumnRenamed("__n0", xs[0])
                )
            else:
                t = x0.bitwiseXOR(xi).bitwiseAND(F.lit(p))
                new0 = F.when(cond, x0.bitwiseXOR(F.lit(p))).otherwise(
                    x0.bitwiseXOR(t)
                )
                newi = F.when(cond, xi).otherwise(xi.bitwiseXOR(t))
                out = (
                    out.select("*", new0.alias("__n0"), newi.alias("__ni"))
                    .drop(xs[0], xs[i])
                    .withColumnRenamed("__n0", xs[0])
                    .withColumnRenamed("__ni", xs[i])
                )
        q >>= 1
    # Gray decode (sequential: each step reads the previous one's value)
    for i in range(1, n):
        out = out.withColumn(xs[i], F.col(xs[i]).bitwiseXOR(F.col(xs[i - 1])))
    # exchange fold, closed form over the last axis
    last = F.col(xs[n - 1])
    t = F.lit(0).cast("long")
    for j in range(bits - 1):
        t = t + F.shiftleft(
            F.bit_count(F.shiftright(last, j + 1)).cast("long") % 2, j
        )
    out = out.select("*", t.alias("__ht"))
    for i in range(n):
        out = out.withColumn(xs[i], F.col(xs[i]).bitwiseXOR(F.col("__ht")))
    # interleave: bit beta of X[i] -> index bit beta*n + (n-1-i)
    d = F.lit(0).cast("long")
    for beta in range(bits):
        for i in range(n):
            d = d + F.shiftleft(
                F.shiftright(F.col(xs[i]), beta).bitwiseAND(F.lit(1)),
                beta * n + (n - 1 - i),
            )
    return out.select("*", d.alias(out_col)).drop("__ht", *xs)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    shards: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (r14) — the GPT-style
    pretraining layout: documents are concatenated in ``id_col`` order
    and the token stream is cut into fixed-``capacity`` training
    sequences, so every sequence except the last is exactly full (zero
    padding waste; docs may straddle a boundary, the standard
    trade against per-sequence padding).

    Output: one row per (document, sequence) FRAGMENT —
    ``(id, n_tokens, seq_id, doc_off_start, doc_off_end,
    seq_off_start, seq_off_end)`` with half-open offsets; a doc
    spanning k boundaries emits k+1 rows, so the writer can slice each
    doc's token array per target sequence and the attention-mask
    builder knows every intra-sequence document boundary. Zero-token
    docs are dropped (nothing to pack).

    Scale shape: the global prefix sum runs SHARDED, never through a
    single-partition window — range-repartition on the id (disjoint
    ascending ranges), within-shard cumulative sum, then per-shard
    prefix offsets from a window over the SHARD-COUNT table (≤ shards
    rows, bounded by construction) — ``global_ntile``'s exactness
    machinery, including the non-eager ``localCheckpoint`` that pins
    both consumers to one physical sharding (repartitionByRange
    boundaries are sample-seeded and not stable across plan
    re-evaluations). All arithmetic is 64-bit integer (``DIV``, never
    float division — exact past 2^53 tokens; 100 TB of text is ~2^44),
    so an ANSI-SQL window mirror is bit-exact (driver row
    ``pack_training_sequences``).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    capacity = int(capacity)
    spark = df.sparkSession
    if shards:
        shards = int(shards)
    else:
        try:
            shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:
            shards = spark.sparkContext.defaultParallelism
    rows = df.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("__tok")
    ).filter(F.col("__tok") > 0)
    ranged = rows.repartitionByRange(shards, F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(id_col)
    t = ranged.withColumn("__cs", F.sum("__tok").over(w_in)).localCheckpoint(
        eager=False
    )
    totals = t.groupBy("__pid").agg(F.sum("__tok").alias("__pt"))
    w_pre = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__pid", F.coalesce(F.sum("__pt").over(w_pre), F.lit(0)).alias("__off")
    )
    j = (
        t.join(F.broadcast(offs), "__pid")
        .withColumn("__ca", F.col("__off") + F.col("__cs"))
        .withColumn("__cb", F.col("__ca") - F.col("__tok"))
    )
    # integer DIV (not float /): exact at any corpus size
    first = F.expr(f"__cb DIV {capacity}")
    last = F.expr(f"(__ca - 1) DIV {capacity}")
    frag = j.select(
        id_col,
        F.col("__tok").alias("n_tokens"),
        "__cb",
        "__ca",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    lo = F.greatest(F.col("__cb"), F.col("seq_id") * capacity)
    hi = F.least(F.col("__ca"), (F.col("seq_id") + 1) * capacity)
    return frag.select(
        id_col,
        "n_tokens",
        "seq_id",
        (lo - F.col("__cb")).alias("doc_off_start"),
        (hi - F.col("__cb")).alias("doc_off_end"),
        (lo - F.col("seq_id") * capacity).alias("seq_off_start"),
        (hi - F.col("seq_id") * capacity).alias("seq_off_end"),
    )


def snapshot_diff(
    old: "DataFrame",
    new: "DataFrame",
    key_cols: list[str],
    compare_cols: list[str],
) -> "DataFrame":
    """Row-level diff between two snapshots of the same table — the
    DERIVATION side of CDC (``ingestion.cdc.cdc_upsert`` applies a
    change feed; this produces one, for sources that only hand you full
    snapshots). Output: the key columns plus ``change_type``
    ('added' | 'removed' | 'changed') and ``changed_cols`` (the compared
    columns whose values differ, null-safely; empty for added/removed).
    Unchanged rows are dropped — the result is O(churn), not O(table).

    One full-outer shuffle join on the key; all comparisons are
    null-safe (``<=>``) single-row expressions fused into the join's
    projection. At lake scale, restrict both sides to the partitions
    the feed can touch before calling (the cdc_upsert pattern) so the
    join shuffles the churn's partition footprint, not the table.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    differs = [
        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols
    ]
    any_diff = None
    for d in differs:
        any_diff = d if any_diff is None else (any_diff | d)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
    )
    # keys-only diff (compare_cols=[]): there is no 'changed' state —
    # a key present on both sides is by definition unchanged, so only
    # the added/removed branches apply (ADVICE r6: F.when(None, ...)
    # raised TypeError at plan-build time here)
    if any_diff is not None:
        change = change.when(any_diff, F.lit("changed"))
    changed_cols = F.when(
        change == "changed",
        F.array_compact(
            F.array(*[F.when(d, F.lit(c)) for d, c in zip(differs, compare_cols)])
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
            changed_cols.alias("changed_cols"),
        )
    )
