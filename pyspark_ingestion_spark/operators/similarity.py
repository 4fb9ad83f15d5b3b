"""Similarity search over embedding columns.

Two tiers:
- brute-force top-k — exact; the query set is broadcast so the big
  corpus never shuffles. Baseline and re-rank stage.
- sign-bucketed top-k — deterministic fixed-hyperplane LSH (sign
  pattern of leading dimensions) prunes candidates to same-bucket
  vectors before scoring. The scale path: the corpus is hash-partitioned
  by bucket, each query probes one bucket.

Scoring is the native zip_with/aggregate cosine (functions/vectors.py)
— JVM codegen, no Python. For 1000-executor deployments the same shape
holds: broadcast queries, mapPartitions-free column math, topk via
row_number window on (query, -sim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_ingestion_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    sign_bucket,
)
from pyspark_ingestion_spark.operators.relational import topk_per_group
from pyspark_ingestion_spark.sources.localtable import local_rows_df


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must have (query_id_col, vec_col). Returns
    (query_id, neighbor_id, sim, rank). Self-matches (same id) are not
    excluded — filter upstream if undesired.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("sim"),
    )
    return topk_per_group(
        scored,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Train IVF centroids with MLlib KMeans on a (seeded) corpus sample.

    The scale recipe: deterministic hash-sample of the corpus (md5 of
    the id — reproducible regardless of partitioning, unlike
    ``df.sample``), one KMeans fit (a handful of passes over the
    sample), centroids persisted as a K-row DataFrame that every
    subsequent ``ivf_topk`` call broadcasts. Fit once per corpus
    generation, not per query batch. ``clusterCenters()`` materializes K
    vectors on the driver — trivially small by construction.

    Returns (centroid_id, cvec) with centroid ids ordered by the fitted
    cluster index.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        den = 1_000_000
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
            .cast("long") % den
        )
        train = corpus.filter(bucket < int(sample_fraction * den))
    feats = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat")
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="__feat").fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    # Arrow-path local table (r14, guide §4): the fitted centroids are
    # evaluated once per downstream collect/broadcast — JVM-resident
    # beats a pickled-RDD scan that re-enters Python every evaluation
    return local_rows_df(
        corpus.sparkSession, rows, "centroid_id int, cvec array<double>"
    )


def centroid_rows_of(centroids) -> list[tuple[int, list[float]]]:
    """Normalize a centroid table to a bounded driver-side list of
    ``(centroid_id, cvec)`` sorted by id — the input of the scan-side
    cell expressions below. Accepts the ``kmeans_centroids`` DataFrame
    (K rows — trivially collectable by construction, the same driver
    materialization ``kmeans_centroids`` itself performs) or an already
    collected list (passed through, sorted)."""
    if isinstance(centroids, DataFrame):
        rows = [
            (int(r["centroid_id"]), [float(x) for x in r["cvec"]])
            for r in centroids.collect()
        ]
    else:
        rows = [(int(c), [float(x) for x in v]) for c, v in centroids]
    return sorted(rows)


def _sql_ident(name: str) -> str:
    """Backtick-quote a simple column name for embedding in an
    ``F.expr`` string (escaping embedded backticks)."""
    return "`" + name.replace("`", "``") + "`"


#: shared SQL fragments for the scan-side ANN expressions: the exact
#: dot_product fold (functions/vectors.py) spelled as parser text — the
#: parsed tree is the same zip_with+aggregate the Column API builds, so
#: arithmetic (and therefore every rounded sim / argmax tie) is
#: bit-identical between the two construction paths
_SQL_DOT = "aggregate(zip_with({a},{b},(x,y)->x*y),0.0D,(acc,v)->acc+v)"


def _ivf_score_structs(vec_col, centroid_rows) -> F.Column:
    """array<struct<s,n>> of (6-dp cosine vs centroid, -centroid_id) —
    the struct-max of this array IS ``assign_ivf_cells``' deterministic
    argmax (max rounded sim, ties toward the lowest centroid id), but as
    a pure scan-side expression: no crossJoin, no aggregate, no shuffle.

    Plan-size discipline (r9, measured twice): centroids enter as ONE
    literal array of (cid, cvec) structs built from a SINGLE SQL string
    (``F.expr``), and the cosine is computed inside a single
    ``transform`` lambda — the scoring subtree appears ONCE in the plan
    and runs K times at runtime. Two naive forms both failed at K=256:
    one unrolled cosine subtree per centroid put K×dims aggregate nodes
    into the plan (~60 s of Catalyst analysis per micro-batch), and
    per-element ``F.lit`` calls cost one py4j round trip EACH (~6.5 s
    just to BUILD the column). The SQL string parses in ~10 ms; double
    literals use ``repr(x)D``, whose shortest-round-trip text parses
    back to the exact same IEEE double, so equivalence with
    ``assign_ivf_cells`` (which reads the same values through a
    DataFrame) is bit-exact. A quantizer beyond a few thousand cells
    belongs in the ingest-time ``assign_ivf_cells`` stored-cell layout
    instead.

    r14 (guide §1.2 step 2 — per-task work): the WHOLE expression now
    comes from one SQL string (the old form still paid ~0.5 s of py4j
    chatter per build for the lambda plumbing), each centroid's
    ``sqrt(c·c)`` is inlined as a literal (``cn`` — Python and the JVM
    compute IEEE-754 doubles identically for the same left-fold order,
    so the product ``sqrt(v·v)·cn`` is bit-equal to the old
    ``sqrt(v·v)·sqrt(c·c)``), and ``sqrt(v·v)`` is hoisted out of the
    per-centroid lambda through a one-element ``transform`` binding —
    K per-row norm folds become one. Higher-order functions are
    CodegenFallback (interpreted per element), so dropping K-1 norm
    folds and K ``c·c`` folds per row is a direct scan-CPU cut
    (measured: the 16-centroid cell assign over sf0.1 fell ~2× inside
    the unchanged ivf_pq_assign plan). Equivalence with the old form is
    pinned by the assign_ivf_cells property test."""
    import math

    if not isinstance(vec_col, str) or "." in vec_col:
        # Column inputs (or dotted nested-field names) cannot be
        # rendered into a SQL string — keep the original builder,
        # identical arithmetic, only slower to construct
        return _ivf_score_structs_col(vec_col, centroid_rows)
    cns = [_py_dot(cvec, cvec, math_sqrt=True) for _cid, cvec in centroid_rows]
    if not all(math.isfinite(cn) for cn in cns):
        # r15 (ADVICE): a non-finite norm would render as 'infD'/'nanD'
        # and fail SQL parsing at build time — the Column builder
        # computes c·c at runtime and tolerates it like the pre-r14 form
        return _ivf_score_structs_col(vec_col, centroid_rows)

    v = f"CAST({_sql_ident(vec_col)} AS ARRAY<DOUBLE>)"
    entries = ",".join(
        "named_struct("
        f"'n',{-int(cid)},"
        f"'cn',{cn!r}D,"
        f"'cvec',array({','.join(f'{float(x)!r}D' for x in cvec)}))"
        for (cid, cvec), cn in zip(centroid_rows, cns)
    )
    dot_vc = _SQL_DOT.format(a=v, b="c.cvec")
    return F.expr(
        f"transform(array(sqrt({_SQL_DOT.format(a=v, b=v)})),"
        f"vn -> transform(array({entries}),"
        f"c -> named_struct("
        f"'s',round(CASE WHEN (vn * c.cn) != 0.0D"
        f" THEN {dot_vc} / (vn * c.cn) END, 6),"
        f"'n',c.n)))[0]"
    )


def _py_dot(a, b, math_sqrt: bool = False) -> float:
    """Driver-side left-fold dot product in IEEE-754 doubles — the same
    ``0.0 + a0·b0 + a1·b1 + …`` order ``dot_product`` folds on the JVM,
    so inlining the result as a literal is bit-equal to computing it
    per row."""
    import math

    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (float(x) * float(y))
    return math.sqrt(acc) if math_sqrt else acc


def _ivf_score_structs_col(vec_col, centroid_rows) -> F.Column:
    """Column-API fallback of :func:`_ivf_score_structs` for non-string
    vector inputs — the pre-r14 builder, arithmetic identical."""
    cents = F.expr(
        "array("
        + ",".join(
            f"named_struct('cid',{int(cid)},'cvec',"
            f"array({','.join(f'{float(x)!r}D' for x in cvec)}))"
            for cid, cvec in centroid_rows
        )
        + ")"
    )
    return F.transform(
        cents,
        lambda c: F.struct(
            F.round(cosine_similarity(vec_col, c["cvec"]), 6).alias("s"),
            (-c["cid"]).alias("n"),
        ),
    )


def ivf_cell_expr(vec_col, centroid_rows) -> F.Column:
    """Scan-side nearest-centroid cell id (int) for one vector column.

    Semantics identical to ``assign_ivf_cells(..., nprobe=1)`` — max
    over (rounded cosine, -centroid_id) — proven by the shared property
    test; use THIS form when the assignment must not add an exchange to
    the plan (the streaming admission sink's per-batch plan pins)."""
    best = F.array_max(_ivf_score_structs(vec_col, centroid_rows))
    return (-best["n"]).cast("int")


def ivf_probe_cells_expr(vec_col, centroid_rows, nprobe: int = 1) -> F.Column:
    """Scan-side array<int> of the vector's ``nprobe`` nearest cells in
    probe order — the query-side recall/compute dial of an IVF index,
    shuffle-free. ``nprobe=1`` yields a one-element array holding
    ``ivf_cell_expr``'s cell."""
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    ordered = F.sort_array(_ivf_score_structs(vec_col, centroid_rows), asc=False)
    return F.transform(
        F.slice(ordered, 1, nprobe), lambda x: (-x["n"]).cast("int")
    )


def assign_ivf_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its nearest centroid(s) (IVF cells).

    ``centroids`` is (centroid_id, cvec) and is broadcast — the corpus
    streams past K centroids without shuffling. Nearest = max cosine,
    ties broken toward the lowest centroid id (deterministic: the max is
    taken over (rounded sim, -centroid_id) pairs). Adds a ``cell``
    column; with ``nprobe > 1`` each vector gets one row per probed
    cell (its nprobe nearest centroids) — used on the query side to
    trade compute for recall.
    """
    if nprobe <= 1:
        scored = df.crossJoin(F.broadcast(centroids)).select(
            F.col(id_col),
            F.struct(
                F.round(cosine_similarity(vec_col, "cvec"), 6).alias("s"),
                (-F.col("centroid_id")).alias("n"),
            ).alias("__sc"),
        )
        best = scored.groupBy(id_col).agg((-F.max("__sc")["n"]).alias("cell"))
        return df.join(best, id_col)
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col("centroid_id").alias("cell"),
        F.round(cosine_similarity(vec_col, "cvec"), 6).alias("__s"),
    )
    probed = topk_per_group(
        scored, [id_col], [F.desc("__s"), F.asc("cell")], k=nprobe
    ).select(id_col, "cell")
    return df.join(probed, id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
    preassigned: bool = False,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells, then
    score each query only against its probed cell(s).

    ``centroids`` (centroid_id, cvec) normally comes from
    ``kmeans_centroids`` — trained once, persisted, broadcast here. When
    None, falls back to the first ``n_centroids`` corpus vectors by id:
    a deterministic quantizer that keeps the query SQL-oracle-checkable
    (KMeans isn't SQL-expressible) and pins the assignment/probe shape;
    on real data its cells can be badly unbalanced, so production use is
    trained centroids. Corpus cell assignment is a one-off broadcast
    pass; per-query work is Σ|probed cells|, not |corpus|. ``nprobe``
    probes the query's n nearest cells (corpus vectors stay in exactly
    one cell, so probed cells are disjoint and no pair dedup is needed)
    — the standard IVF recall/compute dial.
    """
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    # a corpus that already carries its cell assignment (the production
    # layout: cells are computed ONCE per centroid generation at ingest
    # and stored as a column / partition key) skips the per-call
    # assignment pass — measured 18.7 s → 0.77 s at 100k vectors
    # (SCALING.md). The fast path is OPT-IN (``preassigned=True``), never
    # inferred from a column named 'cell': a stale assignment from an
    # older centroid generation, or a multi-row nprobe>1 assignment,
    # would silently return wrong/duplicated neighbors. The caller owns
    # the only fact that matters — that the column was produced by
    # assign_ivf_cells(nprobe=1) against THESE centroids — so the
    # contract is explicit rather than guessed.
    if preassigned:
        if "cell" not in corpus.columns:
            raise ValueError("preassigned=True requires a 'cell' column "
                             "(from assign_ivf_cells with nprobe=1)")
        c = corpus
    else:
        if "cell" in corpus.columns:
            raise ValueError(
                "corpus already has a 'cell' column; pass preassigned=True to "
                "use it (it must come from assign_ivf_cells(nprobe=1) against "
                "the SAME centroids) or drop the column for fresh assignment"
            )
        c = assign_ivf_cells(corpus, centroids, id_col, vec_col)
    q = assign_ivf_cells(queries, centroids, query_id_col, vec_col, nprobe=nprobe).select(
        query_id_col, F.col(vec_col).alias("__qvec"), "cell"
    )
    scored = c.join(F.broadcast(q), "cell").select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("sim"),
    )
    return topk_per_group(
        scored,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_dims: int = 4,
    max_bucket_size: int | None = None,
    bucket_cap_mode: str = "drop",
    salt_hash: str = "xxhash64",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by sign-bucket.

    The dedup flavor of similarity search: self-join the corpus on the
    sign-bucket key (pairs meet only inside a bucket — never a full
    cross join), score candidates with the native cosine, keep pairs at
    or above ``threshold``. Returns (id_a, id_b, sim) with id_a < id_b.

    At 100 TB the corpus is hash-partitioned by bucket once; each
    bucket's pair space is quadratic only in the bucket population, and
    widening ``n_dims`` shrinks buckets geometrically. Recall is the
    LSH trade: raise n_dims for speed, lower it (or union multiple
    rotated bucketings) for recall.

    Sign bucketing degenerates when components are BIASED — e.g.
    post-ReLU embeddings are mostly positive, so the all-ones bucket
    holds nearly the whole corpus and its pair space is quadratic
    again. ``max_bucket_size`` drops buckets above the cap (broadcast
    anti-join on the tiny oversized-bucket list) and fails the pipeline
    toward skipped comparisons rather than a runaway join; the durable
    fix is centering the embeddings or switching to trained IVF cells.

    ``bucket_cap_mode="salt"`` (r13): the recall-preserving trade the
    LSH/fingerprint pair searches already have — an oversized bucket
    salt-splits into ``ceil(n/cap)`` deterministic sub-buckets
    (``dedup._salt_big_buckets``) and pairs WITHIN a sub-bucket
    survive, so a legitimately POPULAR semantic cluster keeps ~cap
    candidate partners per vector (work per bucket n·cap, never n²)
    instead of losing all in-cluster recall to the drop. Surviving
    pairs ⊆ the uncapped set and ⊇ the drop set by construction.
    """
    if bucket_cap_mode not in ("drop", "salt"):
        raise ValueError(
            f"bucket_cap_mode must be 'drop' or 'salt', got {bucket_cap_mode!r}"
        )
    # The norm is computed ONCE PER ROW here, not once per candidate
    # pair: higher-order-function aggregates are interpreted (no
    # whole-stage codegen), so evaluating cosine as dot/(|a||b|) with
    # per-pair norms costs three HOF passes per pair — measured 3x the
    # pair-stage wall time at bench scale. Hoisting the norms leaves one
    # dot product per pair and is bit-identical (same expressions over
    # the same vectors, just evaluated in the row projection).
    b = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        sign_bucket(vec_col, n_dims).alias("__bucket"),
        l2_norm(vec_col).alias("__norm"),
    )
    join_on = F.col("a.__bucket") == F.col("b.__bucket")
    if max_bucket_size is not None:
        if bucket_cap_mode == "salt":
            from pyspark_ingestion_spark.operators.dedup import (
                _salt_big_buckets,
            )

            b = _salt_big_buckets(
                b, max_bucket_size, keys=("__bucket",), doc_col="__id",
                salt_hash=salt_hash,
            )
            join_on = join_on & (F.col("a.__salt") == F.col("b.__salt"))
        else:
            big = (
                b.groupBy("__bucket")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_bucket_size)
                .select("__bucket")
            )
            b = b.join(F.broadcast(big), "__bucket", "left_anti")
    a, c = b.alias("a"), b.alias("b")
    denom = F.col("a.__norm") * F.col("b.__norm")
    cos = F.when(denom != 0, dot_product(F.col("a.__vec"), F.col("b.__vec")) / denom)
    return (
        a.join(
            c,
            join_on & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cos, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def sign_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_dims: int = 8,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's sign-bucket are scored.

    The bucket join replaces the cross join — at scale the corpus is
    partitioned by bucket once and each query touches one partition.
    Recall is traded for the prune; verify/re-rank with brute_force_topk
    on the shortlist if exactness on the shortlist matters.
    """
    c = corpus.withColumn("__bucket", sign_bucket(vec_col, n_dims))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        sign_bucket(vec_col, n_dims).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("sim"),
    )
    return topk_per_group(
        scored,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )


def sign_bucket_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_dims: int = 8,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multiprobe sign-bucket ANN: each query scores its own bucket PLUS
    every Hamming-1 neighbor (one sign bit flipped) — 1 + n_dims probes.

    The standard recall-recovery dial for LSH bucketing: near neighbors
    lost to a single flipped hyperplane sign are recovered at
    (n_dims+1)× the candidate cost, while the corpus layout is
    untouched (each corpus vector still lives in exactly ONE bucket, so
    probed buckets are disjoint and no candidate dedup is needed). At
    scale the query side explodes ×(n_dims+1) BEFORE the broadcast —
    queries are the small side, so the fan-out is cheap; the corpus is
    still partitioned by bucket once and never re-shuffled.
    """
    c = corpus.withColumn("__bucket", sign_bucket(vec_col, n_dims))
    probes = F.array(*[F.lit(x) for x in [0] + [2**i for i in range(n_dims)]])
    q = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            sign_bucket(vec_col, n_dims).alias("__b0"),
        )
        .select(
            query_id_col,
            "__qvec",
            F.explode(probes).alias("__flip"),
            F.col("__b0"),
        )
        .select(
            query_id_col,
            "__qvec",
            F.col("__b0").bitwiseXOR(F.col("__flip")).alias("__bucket"),
        )
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_similarity(vec_col, "__qvec"), 6).alias("sim"),
    )
    return topk_per_group(
        scored,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )


def embedding_batch_rejects(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_dims: int = 4,
    centroids=None,
    nprobe: int = 1,
    max_bucket_size: int | None = None,
    bucket_cap_mode: str = "drop",
    probe_salts: int = 4,
    salt_hash: str = "xxhash64",
) -> DataFrame:
    """Semantic batch admission: batch vectors whose cosine against ANY
    corpus vector in their bucket meets ``threshold`` — the
    embedding-space member of the incremental-admission trio
    (``incremental_near_rejects`` = exact shingles,
    ``incremental_lsh_rejects`` = MinHash bands, this = embeddings).

    Returns (id, n_matches, best_sim, best_match_id) per rejected batch
    vector, deterministically: best match = max (rounded sim, lowest
    corpus id). Caller contract: corpus and batch ids are disjoint (a
    shared id would match itself at sim 1).

    The bucket is the ``n_dims``-bit sign pattern by default; with
    ``centroids`` (a trained quantizer — ``kmeans_centroids`` DataFrame
    or a collected (centroid_id, cvec) list) it is the nearest-centroid
    IVF cell, and ``nprobe`` widens the BATCH side to each vector's n
    nearest cells (corpus vectors stay in exactly one cell, so probed
    candidate pairs never double-count). This is the recompute twin of
    the indexed ``streaming.pipeline.stream_semantic_admission`` — both
    derive buckets from the same scan-side expression.

    Scale shape: the corpus is scanned once with scan-side bucket/norm
    expressions and NEVER reshuffles — the (small) batch broadcasts into
    a bucket equi-join, exactly the admission economics of the shingle
    forms; at 100 TB the bucketed corpus layout (trained IVF cells) is
    precomputed once and maintained incrementally. The final
    aggregate groups on batch keys only.

    ``max_bucket_size`` (r13, VERDICT r12 item 3) caps CORPUS bucket
    population against degenerate skew — post-ReLU/biased embeddings
    collapse most of the corpus into the all-ones sign bucket, making
    the candidate join O(batch·corpus) there. ``bucket_cap_mode``
    picks the trade inside an oversized bucket, exactly the
    fingerprint-sink semantics (``dedup._probe_salted_buckets``):
    ``"drop"`` loses the whole bucket (a batch vector near a POPULAR
    semantic cluster silently loses admission recall); ``"salt"``
    splits the bucket into ``ceil(n/cap)`` deterministic sub-buckets
    and replicates each batch row into ``min(n_salts, probe_salts)``
    of them, recovering ~probe_salts·cap candidate partners per batch
    vector at O(batch·probe_salts) replication — the per-sub-bucket
    join stays bounded at ~cap corpus rows. Rejects: drop ⊆ salt ⊆
    uncapped (property-pinned). The durable fix for biased embeddings
    remains a trained quantizer sized to the corpus; the cap guards
    the residue.
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if bucket_cap_mode not in ("drop", "salt"):
        raise ValueError(
            f"bucket_cap_mode must be 'drop' or 'salt', got {bucket_cap_mode!r}"
        )
    rows_c = centroid_rows_of(centroids) if centroids is not None else None
    if nprobe > 1 and not rows_c:
        raise ValueError(
            "nprobe > 1 requires trained centroids (sign buckets have no "
            "probe order)"
        )

    def prep(df, probe: int = 1):
        if rows_c:
            bucket = (
                F.explode(ivf_probe_cells_expr(vec_col, rows_c, probe))
                if probe > 1
                else ivf_cell_expr(vec_col, rows_c)
            )
        else:
            bucket = sign_bucket(vec_col, n_dims)
        return df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
            bucket.alias("__bucket"),
            l2_norm(vec_col).alias("__norm"),
        )

    c, b = prep(corpus), prep(batch, probe=nprobe)
    on = F.col("b.__bucket") == F.col("c.__bucket")
    if max_bucket_size is not None:
        if max_bucket_size < 1:
            raise ValueError(
                f"max_bucket_size must be >= 1, got {max_bucket_size}"
            )
        from pyspark_ingestion_spark.operators.dedup import (
            _drop_big_buckets,
            _oversized_bucket_salts,
            _probe_salted_buckets,
            _salt_corpus_bands,
        )

        if bucket_cap_mode == "salt":
            big_salts = _oversized_bucket_salts(
                c, max_bucket_size, keys=("__bucket",)
            )
            c = _salt_corpus_bands(
                c, big_salts, keys=("__bucket",), doc_col="__id",
                salt_hash=salt_hash,
            )
            b = _probe_salted_buckets(
                b, big_salts, probe_salts, keys=("__bucket",),
                doc_col="__id", salt_hash=salt_hash,
            )
            on = on & (F.col("b.__salt") == F.col("c.__salt"))
        else:
            c = _drop_big_buckets(c, max_bucket_size, keys=("__bucket",))
    denom = F.col("b.__norm") * F.col("c.__norm")
    cos = F.when(
        denom != 0, dot_product(F.col("b.__vec"), F.col("c.__vec")) / denom
    )
    matches = (
        c.alias("c")
        .join(F.broadcast(b.alias("b")), on)
        .select(
            F.col("b.__id").alias("__bid"),
            F.col("c.__id").alias("__cid"),
            F.round(cos, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    best = F.max(
        F.struct(F.col("sim").alias("s"), (-F.col("__cid")).alias("n"))
    ).alias("__best")
    return matches.groupBy("__bid").agg(
        F.count(F.lit(1)).alias("n_matches"), best
    ).select(
        F.col("__bid").alias(id_col),
        "n_matches",
        F.col("__best.s").alias("best_sim"),
        (-F.col("__best.n")).alias("best_match_id"),
    )


def sign_bits_for(corpus_rows: int, target_bucket_pop: int = 500,
                  min_bits: int = 4, max_bits: int = 24) -> int:
    """Pick the sign-bucket width from the corpus size: enough bits that
    the MEAN bucket population is ≤ ``target_bucket_pop``, clamped to
    [min_bits, max_bits].

    Encodes the measured scale rule (SCALING.md round-4 stress): the
    sign-bucket candidate space is ~n²/2^b, so a FIXED b turns
    superlinear as the corpus grows; adding ⌈log₂ growth⌉ bits restores
    per-bucket population (93.6 s → 16.6 s at 100 k vectors, 8→12 bits).
    The mean is the right statistic only for roughly centered
    embeddings — check ``embedding_dim_stats``' frac_nonneg first, and
    prefer trained IVF cells (`kmeans_centroids`) when components are
    biased.
    """
    import math

    if corpus_rows <= 0:
        raise ValueError(f"corpus_rows must be positive, got {corpus_rows}")
    bits = math.ceil(math.log2(max(1.0, corpus_rows / target_bucket_pop)))
    return max(min_bits, min(max_bits, bits))


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Train product-quantization codebooks: per subvector position ``m``
    (the vector split into ``n_sub`` contiguous chunks), a KMeans
    codebook of ``k_codes`` centroids over the corpus's m-th subvectors.

    The memory tier BELOW int8 scalar quantization: a D-dim float vector
    becomes ``n_sub`` byte-sized codes (64-dim float32 = 256 B → 8 B at
    the defaults), the compression that lets a 100 TB vector corpus keep
    its searchable representation in cluster RAM. Like
    ``kmeans_centroids``: train once per corpus generation on a seeded
    md5 hash-sample (``sample_fraction``), persist the (tiny,
    n_sub × k_codes rows) codebook table, broadcast it everywhere else.

    Returns (m, code_id, subvec). Requires dim % n_sub == 0.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        den = 1_000_000
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
            .cast("long") % den
        )
        train = corpus.filter(bucket < int(sample_fraction * den))
    first = train.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError(
            "empty training set: the corpus (after sample_fraction, if any) "
            "has no rows to train PQ codebooks on — raise sample_fraction"
        )
    dim = first["d"]
    if dim is None or dim % n_sub:
        raise ValueError(f"vector dim {dim} not divisible by n_sub={n_sub}")
    d_sub = dim // n_sub
    # cache the (sampled, double-cast) training vectors across the n_sub
    # fits: without this every fit re-scans + re-filters the corpus —
    # n_sub−1 redundant input passes for a training set that fits the
    # cache by construction (it's a KMeans sample)
    train = train.select(F.col(vec_col).cast("array<double>").alias("__v")).persist()
    try:
        # materialize the cache ONCE before fanning out — concurrent
        # first-use from the fit threads would compute it n_sub times
        train.count()

        # the n_sub fits are independent (disjoint subvector slices,
        # per-m seeds), so they run as CONCURRENT Spark jobs (r11):
        # each KMeans iteration on a hash-sample underutilizes the
        # cluster, and sequential fits made codebook training
        # fit-count-dominated (16 fits 30.5 s → 8 fits 12.0 s at
        # sf0.01, r5 measurement). Thread-order cannot affect results —
        # ex.map preserves m order and every fit is seeded.
        def _fit_one(m: int) -> list[tuple[int, int, list[float]]]:
            feats = train.select(
                array_to_vector(F.slice(F.col("__v"), m * d_sub + 1, d_sub)).alias(
                    "__feat"
                )
            )
            model = KMeans(k=k_codes, seed=seed + m, featuresCol="__feat").fit(feats)
            return [
                (m, ci, [float(x) for x in c])
                for ci, c in enumerate(model.clusterCenters())
            ]

        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # inheritable_thread_target (r15, ADVICE): under pinned-thread
        # mode, plain pool threads would not inherit the caller's job
        # group / scheduler-pool local properties, so a caller's
        # cancelJobGroup could not reach the overlapped fits
        with ThreadPoolExecutor(max_workers=min(n_sub, 8)) as ex:
            rows = [
                r
                for chunk in ex.map(
                    inheritable_thread_target(corpus.sparkSession)(_fit_one),
                    range(n_sub),
                )
                for r in chunk
            ]
    finally:
        train.unpersist(blocking=False)
    # Arrow-path local table (r14, guide §4) — same reasoning as
    # kmeans_centroids
    return local_rows_df(
        corpus.sparkSession, rows, "m int, code_id int, subvec array<double>"
    )


def ivf_pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_sub: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the IVF centroids and the PQ codebooks of one index
    generation CONCURRENTLY (r14, guide §2.6 — overlap independent
    jobs): the two trainings share no state (separate seeded KMeans
    fits over disjoint feature projections), each underutilizes the
    cluster on its small hash-sample, and running them sequentially
    made ingest-time fitting latency the SUM of the two (measured at
    sf0.1: 2.5 s + 5.0 s sequential → ~5.5 s overlapped). Returns
    ``(centroids, codebooks)`` — exactly
    ``kmeans_centroids(corpus, …)`` and ``pq_codebooks(corpus, …)``
    with the same arguments; thread order cannot affect either result
    (both fits are seed-deterministic and independent), pinned by the
    equality test."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # inheritable_thread_target (r15, ADVICE): propagate the caller's
    # job group / scheduler-pool local properties into the overlapped
    # fits so cancelJobGroup and pool assignment reach them
    wrap = inheritable_thread_target(corpus.sparkSession)
    with ThreadPoolExecutor(max_workers=2) as ex:
        cents_f = ex.submit(
            wrap(kmeans_centroids),
            corpus, id_col, vec_col, n_centroids, seed, sample_fraction,
        )
        cb_f = ex.submit(
            wrap(pq_codebooks),
            corpus, id_col, vec_col, n_sub, k_codes, seed, sample_fraction,
        )
        return cents_f.result(), cb_f.result()


def _validate_pq_inputs(
    df: DataFrame,
    codebooks: DataFrame,
    vec_col: str,
    n_sub: int,
    k_codes: int | None = None,
) -> None:
    """Bounded driver-side validation of a PQ configuration — one
    ``first()`` on the vector frame plus one aggregate over the (tiny,
    n_sub×k_codes-row) codebook table.

    Config mismatches here produce SILENTLY WRONG results, not errors:
    a k_codes argument disagreeing with the codebooks' per-m entry count
    misaligns the flat ADC lookup index (mi·k_codes + code reads another
    subquantizer's entry — in-range, plausible, wrong); an n_sub or dim
    mismatch truncates/NULLs subvector math. Same contract philosophy as
    the explicit ``preassigned`` opt-in: trusted-by-construction inputs
    are cheap to verify, so verify them.
    """
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty vector frame: nothing to encode/score")
    dim = first["d"]
    if dim is None or dim % n_sub:
        raise ValueError(f"vector dim {dim} not divisible by n_sub={n_sub}")
    d_sub = dim // n_sub
    stats = codebooks.groupBy("m").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("code_id").alias("mn"),
        F.max("code_id").alias("mx"),
        F.min(F.size("subvec")).alias("sl"),
        F.max(F.size("subvec")).alias("sh"),
    ).collect()
    ms = sorted(r["m"] for r in stats)
    if ms != list(range(n_sub)):
        raise ValueError(
            f"codebooks cover m={ms}, expected 0..{n_sub - 1} — n_sub mismatch"
        )
    for r in stats:
        if r["sl"] != d_sub or r["sh"] != d_sub:
            raise ValueError(
                f"codebook m={r['m']} subvector length {r['sl']}..{r['sh']} "
                f"!= dim/n_sub = {d_sub}"
            )
        if k_codes is not None and (
            r["c"] != k_codes or r["mn"] != 0 or r["mx"] != k_codes - 1
        ):
            raise ValueError(
                f"codebook m={r['m']} has {r['c']} codes ({r['mn']}..{r['mx']}), "
                f"expected exactly {k_codes} (0..{k_codes - 1}) — a k_codes "
                "mismatch silently misaligns the ADC lookup table"
            )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    expected_dim: int | None = None,
) -> DataFrame:
    """Encode vectors against PQ codebooks → (id, codes array<int>).

    Per subvector: nearest codebook entry under L2. Row-local explode to
    (id, m, subvec), broadcast join on ``m`` (the big side never
    shuffles for the codebooks), argmin via the struct-max idiom
    (2·s·c − |c|² maximized ⟺ L2 minimized; |s|² is constant per
    (id, m)), lowest code_id on ties — deterministic. Two hash
    aggregations on the id reassemble the code array. Encode is an
    ingest-time one-off per centroid/codebook generation, exactly like
    ``assign_ivf_cells`` — store the codes column next to the corpus.
    Validates dim % n_sub == 0 and the codebooks' m-domain/subvector
    lengths up front (a mismatch would silently truncate trailing
    dimensions out of every code).

    ``expected_dim`` (r13, ADVICE): without it, ``d_sub`` comes from
    ``size(vec)`` PER ROW — a mixed-dim corpus row slices misaligned
    subvectors and emits plausible-but-wrong (or null) codes silently,
    exactly the failure :func:`pq_codes_expr` closed in r12. With it,
    ``d_sub`` is a constant-folded literal and every row carries an
    ``assert_true(size(vec) = expected_dim)`` guard, so dim drift
    raises at execution. :func:`ivf_pq_assign`'s aggregate+join
    fallback (the branch big production codebooks take) passes the
    corpus dim here, making both physical forms raise identically.
    """
    _validate_pq_inputs(df, codebooks, vec_col, n_sub)
    vec = F.col(vec_col).cast("array<double>")
    if expected_dim is not None:
        if expected_dim % n_sub:
            raise ValueError(
                f"expected_dim {expected_dim} not divisible by n_sub={n_sub}"
            )
        d_sub = expected_dim // n_sub
        guard = F.assert_true(
            F.size(vec) == expected_dim,
            F.concat(
                F.lit("pq_encode: row vector dim "),
                F.size(vec).cast("string"),
                F.lit(f" != codebook dim {expected_dim}"),
            ),
        )
        # assert_true is NULL on success: the when-branch passes the
        # vector through unchanged, the first off-dim row raises
        vec = F.when(guard.isNull(), vec)
    else:
        d_sub = (F.size(vec) / n_sub).cast("int")
    sub = df.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice(vec, m * d_sub + 1, d_sub).alias("__sv"),
                )
                for m in range(n_sub)
            ])
        ).alias("s"),
    ).select(id_col, F.col("s.m").alias("m"), F.col("s.__sv").alias("__sv"))
    scored = sub.join(F.broadcast(codebooks), "m").select(
        F.col(id_col),
        "m",
        F.struct(
            (
                2.0 * dot_product("__sv", "subvec") - dot_product("subvec", "subvec")
            ).alias("s"),
            (-F.col("code_id")).alias("n"),
        ).alias("__sc"),
    )
    best = scored.groupBy(id_col, "m").agg((-F.max("__sc")["n"]).cast("int").alias("code"))
    return best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def codebook_rows_of(codebooks) -> list[tuple[int, int, list[float]]]:
    """Normalize a PQ codebook table to a bounded driver-side list of
    ``(m, code_id, subvec)`` sorted by (m, code_id) — the input of the
    scan-side code expression below. Accepts the ``pq_codebooks``
    DataFrame (n_sub×k_codes rows — kilobytes by construction, the same
    driver materialization the ADC LUT build performs) or an already
    collected list (passed through, sorted). The exact analogue of
    :func:`centroid_rows_of` for the PQ tier."""
    if isinstance(codebooks, DataFrame):
        rows = [
            (int(r["m"]), int(r["code_id"]), [float(x) for x in r["subvec"]])
            for r in codebooks.collect()
        ]
    else:
        rows = [(int(m), int(c), [float(x) for x in v]) for m, c, v in codebooks]
    return sorted(rows, key=lambda r: (r[0], r[1]))


#: cap on the total double literals ivf_pq_topk will inline as SQL text
#: (codebook entries for pq_codes_expr + centroids for ivf_cell_expr)
#: before falling back to the aggregate+join encode. Each double
#: renders ~20 chars, so 65536 ≈ 1.3 MB of expression string — well
#: inside sane parse/analysis budgets; a realistic big-PQ config
#: (k_codes=256, d=768, n_sub=16 → 196k codebook doubles alone) lands
#: in the fallback (r12, ADVICE: plan-size dependence the join form
#: does not have).
_PQ_EXPR_MAX_LITERALS = 65536


def pq_codes_expr(
    vec_col, codebook_rows, n_sub: int, expected_dim: int | None = None
) -> F.Column:
    """Scan-side PQ codes (``array<int>``) for one vector column —
    semantics identical to :func:`pq_encode` (property-pinned), but as
    a pure column expression: no explode, no broadcast join, no
    (id, m) / id hash aggregations, NO SHUFFLE. Per subquantizer ``m``
    the codebook entries enter as ONE literal array of (cid, cvec)
    structs from a single SQL string (the ``_ivf_score_structs``
    plan-size discipline — per-element ``F.lit`` costs a py4j round
    trip each), and the argmin reuses pq_encode's exact arithmetic:
    struct-max over (2·sv·c − |c|², −code_id) with the same
    ``dot_product`` fold, so the two forms agree bit-for-bit.

    This is the 100 TB encode shape: the corpus's codes column comes
    out of the SAME scan that computes its IVF cell, instead of a
    two-aggregation reassembly joined back on id. The flip side of
    inlining is plan-size dependence — the expression carries
    ``n_sub·k_codes·d_sub`` double literals of SQL text — so callers
    with large codebooks must prefer the join form;
    :func:`ivf_pq_topk` guards on :data:`_PQ_EXPR_MAX_LITERALS` (r12,
    ADVICE).

    ``expected_dim`` (r12, ADVICE): without it, ``d_sub`` is computed
    PER ROW from ``size(vec)`` — a corpus with mixed vector dims would
    slice misaligned subvectors and emit plausible-but-wrong codes for
    the off-dim rows. With it, ``d_sub`` is a constant-folded literal
    and every row carries an ``assert_true(size(vec) = expected_dim)``
    guard, so dim drift raises AT EXECUTION instead of corrupting
    codes — per-row and scan-side, i.e. free at 100 TB, where a
    build-time min/max-size aggregate would cost one extra full pass
    over the vector column.

    r14 (guide §1.2 step 2): with ``expected_dim`` set and a simple
    string ``vec_col``, the whole codes array is built from ONE SQL
    string — the per-m Column-API plumbing cost ~1.4 s of py4j round
    trips per build (measured sf0.1 config, 8×32×8 literals) vs ~20 ms
    for the parse — and each entry's ``c·c`` fold is inlined as a
    driver-computed literal (``csq`` — same left-fold order, IEEE-equal,
    see :func:`_py_dot`), dropping half the interpreted higher-order
    work per row (higher-order functions are CodegenFallback): measured
    2.5 → 1.9 s per sf0.1 encode pass, 84 → 68 s at 100k rows, output
    bit-identical (pq_encode property pin + the driver-hash-checked
    encode fixtures)."""
    by_m: dict[int, list[tuple[int, list[float]]]] = {}
    for m, c, v in codebook_rows:
        by_m.setdefault(int(m), []).append((int(c), v))
    if sorted(by_m) != list(range(n_sub)):
        raise ValueError(
            f"codebook rows cover m={sorted(by_m)}, expected 0..{n_sub - 1}"
        )
    vec = F.col(vec_col).cast("array<double>") if isinstance(vec_col, str) else vec_col
    if expected_dim is not None:
        if expected_dim % n_sub:
            raise ValueError(
                f"expected_dim {expected_dim} not divisible by n_sub={n_sub}"
            )
        d_sub = expected_dim // n_sub
    else:
        d_sub = (F.size(vec) / n_sub).cast("int")

    import math

    csq_by_m = {
        m: [(cid, cvec, _py_dot(cvec, cvec)) for cid, cvec in sorted(by_m[m])]
        for m in by_m
    }
    all_finite = all(
        math.isfinite(csq) for rows in csq_by_m.values() for _c, _v, csq in rows
    )
    if (
        expected_dim is not None
        and isinstance(vec_col, str)
        and "." not in vec_col
        # r15 (ADVICE): a non-finite c·c would render as 'infD'/'nanD'
        # and fail SQL parsing at build time — the Column branch below
        # computes it at runtime and tolerates it like the pre-r14 form
        and all_finite
    ):
        v_sql = f"CAST({_sql_ident(vec_col)} AS ARRAY<DOUBLE>)"
        parts = []
        for m in range(n_sub):
            entries = ",".join(
                "named_struct("
                f"'n',{-cid},"
                f"'csq',{csq!r}D,"
                f"'cvec',array({','.join(f'{float(x)!r}D' for x in cvec)}))"
                for cid, cvec, csq in csq_by_m[m]
            )
            sv = f"slice({v_sql},{m * d_sub + 1},{d_sub})"
            dot = _SQL_DOT.format(a=sv, b="e.cvec")
            parts.append(
                f"CAST((-array_max(transform(array({entries}),"
                f"e -> named_struct('s',(2.0D*{dot})-e.csq,'n',e.n))).n) AS INT)"
            )
        codes = F.expr(f"array({','.join(parts)})")
    else:

        def code_for(m: int) -> F.Column:
            entries = F.expr(
                "array("
                + ",".join(
                    f"named_struct('cid',{cid},'cvec',"
                    f"array({','.join(f'{float(x)!r}D' for x in cvec)}))"
                    for cid, cvec in sorted(by_m[m])
                )
                + ")"
            )
            sv = F.slice(vec, m * d_sub + 1, d_sub)
            scored = F.transform(
                entries,
                lambda e: F.struct(
                    (
                        2.0 * dot_product(sv, e["cvec"])
                        - dot_product(e["cvec"], e["cvec"])
                    ).alias("s"),
                    (-e["cid"]).alias("n"),
                ),
            )
            return (-F.array_max(scored)["n"]).cast("int")

        codes = F.array(*[code_for(m) for m in range(n_sub)])
    if expected_dim is None:
        return codes
    # per-row dim guard: assert_true returns NULL on success (taking
    # the when-branch) and raises on the first off-dim row
    guard = F.assert_true(
        F.size(vec) == expected_dim,
        F.concat(
            F.lit("pq_codes_expr: row vector dim "),
            F.size(vec).cast("string"),
            F.lit(f" != codebook dim {expected_dim}"),
        ),
    )
    return F.when(guard.isNull(), codes)


def ivf_pq_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
) -> DataFrame:
    """Ingest-time IVF-PQ layout (r12): the corpus frame plus its
    ``cell`` (nearest IVF centroid, ``assign_ivf_cells(nprobe=1)``
    semantics) and ``codes`` (PQ codes, ``pq_encode`` semantics)
    columns — exactly the production columns
    ``ivf_pq_topk(preassigned=True)`` queries against. Store the result
    next to the corpus once per centroid/codebook generation; the
    bench's preassigned row and SCALING.md's 100k receipt both measure
    this layout at ~2.5–10× under the ad-hoc re-encode-per-query shape.

    Physical form picks itself: ONE scan-side projection (zero
    shuffles — ``ivf_cell_expr`` + ``pq_codes_expr`` with a
    constant-folded ``d_sub`` and a per-row dim assert) while the
    inlined centroid+codebook literals fit :data:`_PQ_EXPR_MAX_LITERALS`;
    past that budget, the aggregate+join twins (plan size O(1) in the
    codebook — the r12 ADVICE trade). Both forms are property-pinned
    identical, and BOTH carry the per-row dim assert (r13, ADVICE: the
    fallback used to compute d_sub per row, so only the expression
    form raised on mixed-dim corpora). Raises on an empty corpus, a corpus/codebook dim
    mismatch, or existing cell/codes columns (a stale generation must
    be dropped explicitly, never silently overwritten)."""
    stale = {"cell", "codes"} & set(corpus.columns)
    if stale:
        raise ValueError(
            f"corpus already has {sorted(stale)} — drop the previous "
            "generation's columns before re-assigning"
        )
    cfirst = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if cfirst is None:
        raise ValueError("empty corpus: nothing to index/score")
    cdim = cfirst["d"]
    if cdim is None or cdim % n_sub:
        raise ValueError(
            f"corpus vector dim {cdim} not divisible by n_sub={n_sub}"
        )
    cb_rows = codebook_rows_of(codebooks)
    bad = [(m, c) for m, c, v in cb_rows if len(v) != cdim // n_sub]
    if bad:
        raise ValueError(
            f"codebook subvector length != corpus dim/n_sub = "
            f"{cdim // n_sub} for (m, code) {bad[:3]} — dim mismatch"
        )
    c_rows = centroid_rows_of(centroids)
    n_literals = (len(cb_rows) * (cdim // n_sub)) + len(c_rows) * cdim
    if n_literals > _PQ_EXPR_MAX_LITERALS:
        return assign_ivf_cells(
            corpus, centroids, id_col, vec_col, nprobe=1
        ).join(
            pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col,
                      n_sub=n_sub, expected_dim=cdim),
            id_col,
        )
    return corpus.select(
        "*",
        ivf_cell_expr(vec_col, c_rows).alias("cell"),
        pq_codes_expr(vec_col, cb_rows, n_sub, expected_dim=cdim).alias("codes"),
    )


def ivf_cell_residual_stats(
    assigned: DataFrame,
    centroids: DataFrame,
    cell_col: str = "cell",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell residual statistics of an IVF layout — the health signal
    that decides when a centroid generation needs retraining.

    For each vector, the L2 residual to its ASSIGNED centroid is
    ``sqrt(v·v − 2·v·c + c·c)`` (three ``dot_product`` folds — the same
    index-order float arithmetic a SQL mirror computes, so the per-row
    residual is cross-engine exact at 6 dp). Per cell:
    ``(cell, n_vectors, sum_residual, avg_residual, max_residual)``.
    ``sum_residual`` is left unrounded and makes the stats MERGEABLE
    (``n``/``sum`` re-aggregate across batches/partitions exactly like
    the sketch family; ``avg = sum/n`` derives at read time);
    avg/max are rounded (4/6 dp) for oracle-stable display.

    Scale shape: the centroid table broadcasts (K rows), the layout
    streams past it with one map-side-combinable aggregation — no
    corpus shuffle beyond the K-cell rollup.
    """
    cents = centroids.select(
        F.col("centroid_id").alias(cell_col), F.col("cvec")
    )
    rr = assigned.join(F.broadcast(cents), cell_col).select(
        cell_col,
        F.round(
            F.sqrt(
                F.greatest(
                    dot_product(vec_col, vec_col)
                    - F.lit(2.0) * dot_product(vec_col, "cvec")
                    + dot_product("cvec", "cvec"),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("__r"),
    )
    return rr.groupBy(cell_col).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("__r").alias("sum_residual"),
        F.round(F.avg("__r"), 4).alias("avg_residual"),
        F.round(F.max("__r"), 6).alias("max_residual"),
    )


def ivf_drift_flags(
    current: DataFrame,
    baseline: DataFrame,
    cell_col: str = "cell",
    min_rows: int = 1,
    max_ratio: float = 1.05,
) -> DataFrame:
    """Retrain trigger: cells whose newly-admitted vectors sit measurably
    farther from their centroid than the train-time population did.

    ``current`` / ``baseline`` are :func:`ivf_cell_residual_stats`
    frames (current = the post-training window, e.g. the streaming
    stats table's rollup; baseline = the corpus the generation was
    trained on). Per current cell:
    ``drift_ratio = round(avg_current / avg_baseline, 4)`` and
    ``retrain = n_vectors >= min_rows AND (ratio > max_ratio OR no
    baseline)`` — a cell that had no training mass receiving vectors is
    drift by definition. Ratios divide the already-rounded averages, so
    the flag is deterministic cross-engine. Both inputs are K-row
    tables; the join broadcasts trivially.

    Zero-baseline cells (ADVICE r13): a baseline average of exactly 0
    (every train-time vector ON its centroid — degenerate but legal)
    has no meaningful ratio, so ``drift_ratio`` is NULL instead of
    Infinity/NaN (both engines order NaN above everything, which would
    have flagged a perfectly stable zero-residual cell) and the flag
    decides directly: current avg > 0 ⇒ drift (any movement off an
    exactly-converged centroid is growth), current avg = 0 ⇒ stable.
    """
    cur = current.select(
        cell_col,
        "n_vectors",
        "avg_residual",
    )
    base = baseline.select(
        F.col(cell_col),
        F.col("avg_residual").alias("baseline_avg"),
    )
    ratio = F.when(
        F.col("baseline_avg") > 0,
        F.round(F.col("avg_residual") / F.col("baseline_avg"), 4),
    )
    return (
        cur.join(F.broadcast(base), cell_col, "left")
        .select(
            cell_col,
            "n_vectors",
            "avg_residual",
            "baseline_avg",
            ratio.alias("drift_ratio"),
            (
                (F.col("n_vectors") >= F.lit(min_rows))
                & (
                    F.col("baseline_avg").isNull()
                    | (
                        (F.col("baseline_avg") == 0)
                        & (F.col("avg_residual") > 0)
                    )
                    | F.coalesce(ratio > F.lit(max_ratio), F.lit(False))
                )
            )
            .cast("int")
            .alias("retrain"),
        )
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id_col: str = "query_id",
    nprobe: int = 1,
    n_sub: int = 8,
    k_codes: int = 16,
    preassigned: bool = False,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ ANN: IVF cells prune the candidate space, PQ codes replace
    the vectors at scoring time — asymmetric distance computation (ADC).

    Per query, a lookup table over the (broadcast) codebooks:
    ``pdot[m][c] = q_m · codebook[m][c]`` and ``psq[m][c] =
    |codebook[m][c]|²``; a candidate's cosine is then approximated from
    its codes alone — Σ_m pdot[m][code_m] over (|q| · √Σ_m
    psq[m][code_m]) — i.e. cosine against the PQ *reconstruction*,
    without touching the original vector. n_sub array lookups per
    candidate instead of a D-term dot product, and the corpus's scoring
    representation is n_sub small ints per vector.

    100 TB shape: cells + codes are precomputed at ingest (one pass,
    stored as columns); a query batch broadcasts (nprobe rows × a
    n_sub·k_codes LUT each); the corpus partition-local-scans only its
    probed cells.

    ``rerank`` (candidate pool size > k) adds the standard exact re-rank
    stage: PQ picks the top-``rerank`` candidates per query, their TRUE
    vectors are fetched (broadcast of the queries×rerank candidate ids
    into one more corpus scan — the corpus never shuffles) and rescored
    with exact cosine. This is how production IVF-PQ recovers recall
    lost to quantization error (measured at 100k vectors: 0.42 ADC-only
    → see SCALING.md) while still only ever exact-scoring
    queries×rerank vectors instead of queries×corpus.

    Returns (query_id, neighbor_id, sim, rank); sim is the rounded ADC
    cosine approximation (exact cosine when ``rerank`` is set).

    ``preassigned=True`` takes the corpus's existing ``cell`` and
    ``codes`` columns (the production ingest-time layout — both come
    from ``assign_ivf_cells(nprobe=1)`` + ``pq_encode`` against THESE
    centroids/codebooks); same explicit opt-in contract as
    ``ivf_topk`` — never inferred from column presence. The
    (n_sub, k_codes) configuration is validated against the actual
    codebook table up front — a mismatch would misalign the flat LUT
    index and return plausible-but-wrong neighbors with no error.

    The corpus input is run through ``spread_input`` (r11, VERDICT r10
    item 1): cell assignment, PQ encode, and the ADC accumulator are
    all per-row CPU over the corpus scan, so a byte-narrow embeddings
    scan serializes them on one core (measured at sf0.1: ADC scoring
    6.0 → 4.4 s spread). The KMeans FITS behind ``centroids``/
    ``codebooks`` are deliberately NOT spread — the r10 negative A/B
    measured 13.6 → 23.1 s degradation there (62 rows/task × 32 task
    launches per fit iteration); callers pass fitted tables in, so the
    spread here cannot reach them. The guard makes it a no-op once the
    corpus scan has real splits (any multi-GB corpus).
    """
    from pyspark_ingestion_spark.sources.readers import spread_input

    _validate_pq_inputs(queries, codebooks, vec_col, n_sub, k_codes)
    # spread ONLY the per-row-CPU scans (cells/codes/ADC); the rerank
    # stage below keeps the original corpus — it broadcast-filters the
    # scan down to queries×rerank rows, so a pre-shuffle of the full
    # corpus there would be pure cost
    corpus_wide = spread_input(corpus)
    if preassigned:
        missing = {"cell", "codes"} - set(corpus.columns)
        if missing:
            raise ValueError(
                f"preassigned=True requires 'cell' and 'codes' columns, missing {sorted(missing)}"
            )
        # sampled shape check on the preassigned codes: a codes column
        # from a different PQ generation (other n_sub/k_codes) would
        # NULL the ADC accumulator or misalign the LUT silently. One
        # row proves the common failure (configs are uniform per
        # generation); it cannot prove every row — the full guarantee
        # stays with the ingest pipeline that wrote the column.
        probe = corpus.select(
            F.size("codes").alias("n"),
            F.array_min("codes").alias("mn"),
            F.array_max("codes").alias("mx"),
        ).first()
        if probe is not None and (
            probe["n"] != n_sub
            or (probe["mn"] is not None and probe["mn"] < 0)
            or (probe["mx"] is not None and probe["mx"] >= k_codes)
        ):
            raise ValueError(
                f"preassigned codes look like another PQ generation: sampled row "
                f"has {probe['n']} codes in [{probe['mn']}, {probe['mx']}], "
                f"expected {n_sub} codes in [0, {k_codes - 1}] — re-encode with "
                "pq_encode against THESE codebooks"
            )
        corpus_pq = corpus_wide.select(id_col, "cell", "codes")
    else:
        stale = {"cell", "codes"} & set(corpus.columns)
        if stale:
            raise ValueError(
                f"corpus already has {sorted(stale)}; pass preassigned=True to use "
                "them (they must come from assign_ivf_cells(nprobe=1) + pq_encode "
                "against the SAME centroids/codebooks) or drop them"
            )
        # ONE corpus scan computes cell + codes as column expressions
        # (r11; shared with the ingest path as ivf_pq_assign since
        # r12): the former assign+encode+join reassembly cost two
        # hash-agg shuffles and an id join of the FULL corpus per query
        # batch. ivf_pq_assign carries the r12 ADVICE guards — the
        # per-row dim assert (a mixed-dim corpus raises instead of
        # emitting misaligned codes) and the literal-budget fallback to
        # the aggregate+join form for big codebooks.
        corpus_pq = ivf_pq_assign(
            corpus_wide, centroids, codebooks,
            id_col=id_col, vec_col=vec_col, n_sub=n_sub,
        ).select(id_col, "cell", "codes")

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
        l2_norm(vec_col).alias("__qnorm"),
    )
    d_sub = (F.size(F.col("__qvec")) / n_sub).cast("int")
    pdot = dot_product(
        F.slice(F.col("__qvec"), F.col("m") * d_sub + 1, d_sub), F.col("subvec")
    )
    psq = dot_product("subvec", "subvec")
    # flat LUT in (m, code_id) order: entry index = m·k_codes + code
    lut = (
        q.crossJoin(F.broadcast(codebooks))
        .select(
            query_id_col,
            "__qnorm",
            F.struct("m", "code_id", pdot.alias("pdot"), psq.alias("psq")).alias("e"),
        )
        .groupBy(query_id_col)
        .agg(
            F.min("__qnorm").alias("__qnorm"),
            F.transform(
                F.array_sort(F.collect_list("e")),
                lambda e: F.struct(e["pdot"].alias("pdot"), e["psq"].alias("psq")),
            ).alias("__lut"),
        )
    )
    probes = assign_ivf_cells(
        q.select(query_id_col, F.col("__qvec").alias(vec_col)),
        centroids,
        query_id_col,
        vec_col,
        nprobe=nprobe,
    ).select(query_id_col, "cell")
    qside = lut.join(probes, query_id_col)

    # ADC accumulator UNROLLED over the (constant) n_sub lookups (r14,
    # guide §1.2 step 2): the former aggregate-over-sequence fold is a
    # higher-order function — CodegenFallback, interpreted per element
    # per candidate row — while GetArrayItem + Add codegen. The fold
    # order is preserved exactly (((0.0 + t0) + t1) + …), so the sum is
    # bit-identical; the repeated lut-entry subtree is deduplicated by
    # codegen subexpression elimination.
    dot_acc, sq_acc = F.lit(0.0), F.lit(0.0)
    for mi in range(n_sub):
        entry = F.get(
            F.col("__lut"), F.lit(mi * k_codes) + F.get(F.col("codes"), F.lit(mi))
        )
        dot_acc = dot_acc + entry["pdot"]
        sq_acc = sq_acc + entry["psq"]
    acc = F.struct(dot_acc.alias("dot"), sq_acc.alias("sq"))
    denom = F.col("__qnorm") * F.sqrt(F.col("__acc")["sq"])
    scored = (
        corpus_pq.join(F.broadcast(qside), "cell")
        .withColumn("__acc", acc)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                F.when(denom != 0, F.col("__acc")["dot"] / denom), 6
            ).alias("sim"),
        )
    )
    if rerank is None:
        return topk_per_group(
            scored,
            group_cols=[query_id_col],
            order_cols=[F.desc("sim"), F.asc("neighbor_id")],
            k=k,
            keep_rank=True,
            rank_col="rank",
        )
    if rerank < k:
        raise ValueError(f"rerank pool ({rerank}) must be >= k ({k})")
    if vec_col not in corpus.columns:
        raise ValueError(f"rerank needs the true vectors: corpus lacks '{vec_col}'")
    cands = topk_per_group(
        scored,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=rerank,
    ).select(query_id_col, "neighbor_id")
    truevecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    )
    exact = (
        truevecs.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(q.select(query_id_col, "__qvec")), query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            F.round(cosine_similarity("__nvec", "__qvec"), 6).alias("sim"),
        )
    )
    return topk_per_group(
        exact,
        group_cols=[query_id_col],
        order_cols=[F.desc("sim"), F.asc("neighbor_id")],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )
