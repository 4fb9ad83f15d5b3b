"""Model-based corpus curation: train a classifier on (weak) labels,
score the whole corpus — the fastText-style quality/language filter
tier that sits above the heuristic gates (quality_scores,
quality_gopher_rules, lang_id_heuristic).

Reference scope note: the reference (`/root/reference`, 1.1k LoC of
ingestion glue) has no ML surface at all — this family exists for the
LLM-training-data pipeline mandate, alongside the KMeans quantizers in
``operators/similarity.py``.

100 TB shape: FIT on a bounded (hash-)sample — a classifier of
n_features coefficients needs thousands of examples, not the corpus —
then SCORE with the broadcast model via MLlib's native transform
(JVM-side vectorized math; the corpus streams past the model with no
shuffle and no Python). Tokens come from the engine's own native
``words()`` expression so the featurization matches the rest of the
text stack; hashing-trick features keep the model size fixed
(n_features floats) regardless of vocabulary.

Float caveat (documented, not hidden): LR training aggregates gradients
in partition order, so coefficients can differ in the last bits across
partitionings; scores are rounded (4 dp) and the tests assert ranking
quality (AUC), never exact coefficients.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_ingestion_spark.functions.text import words


def train_text_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_features: int = 1024,
    max_iter: int = 20,
    reg_param: float = 0.01,
    sample_fraction: float | None = None,
    id_col: str = "doc_id",
):
    """Fit logistic regression on hashing-trick token features.

    ``label_col`` must be numeric 0/1 (weak labels are fine — heuristic
    gates, source lists, a hand-labeled seed set). ``sample_fraction``
    trains on a deterministic md5 hash-sample of the corpus (same
    recipe as ``kmeans_centroids``). Returns a fitted
    ``pyspark.ml.PipelineModel`` whose ``transform`` adds
    ``probability``/``prediction`` columns.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    train = docs
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        den = 1_000_000
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
            .cast("long") % den
        )
        train = docs.filter(bucket < int(sample_fraction * den))
    train = train.select(
        F.col(label_col).cast("double").alias("label"),
        words(F.lower(F.col(text_col))).alias("__tokens"),
    )
    tf = HashingTF(inputCol="__tokens", outputCol="features", numFeatures=n_features)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features", labelCol="label"
    )
    return Pipeline(stages=[tf, lr]).fit(train)


def score_corpus(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "model_score",
) -> DataFrame:
    """Score every document with a fitted classifier → (id, score).

    The model broadcasts; scoring is one narrow JVM-side pass (hashing +
    a dot product per row), so the corpus never shuffles — the filter
    can fuse into the same scan as the heuristic gates. Score = P(label
    = 1), rounded to 4 dp (see module float caveat).
    """
    from pyspark.ml.functions import vector_to_array

    feats = docs.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__tokens")
    )
    scored = model.transform(feats)
    return scored.select(
        id_col,
        F.round(vector_to_array(F.col("probability"))[1], 4).alias(score_col),
    )


def auc_of_scores(
    scored: DataFrame, labels: DataFrame, id_col: str, label_col: str,
    score_col: str = "model_score",
) -> float:
    """Exact ROC-AUC of scores against 0/1 labels, computed as the
    normalized Mann-Whitney U statistic entirely in DataFrame ops
    (rank window + one aggregate; ties get average rank so the
    estimate is tie-correct). Bounded driver value — the eval loop's
    scalar, like ``ann_recall_eval``'s recall.

    The rank window is UNPARTITIONED (one task): correct for the eval
    use — run it on a bounded eval sample (≤ ~10M rows), never the full
    corpus. A corpus-scale AUC would shard the rank like
    ``relational.global_ntile`` does; an eval scalar doesn't warrant it.
    """
    from pyspark.sql import Window

    j = scored.join(labels.select(id_col, label_col), id_col)
    # average rank over score ties: rank() + (count-1)/2 within the tie
    w = Window.orderBy(score_col)
    wt = Window.partitionBy(score_col)
    ranked = j.select(
        F.col(label_col).cast("double").alias("__y"),
        (F.rank().over(w) + (F.count(F.lit(1)).over(wt) - 1) / 2.0).alias("__r"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("__y") == 1.0, F.col("__r"))).alias("rpos"),
        F.sum(F.col("__y")).alias("npos"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    npos, n = agg["npos"], agg["n"]
    nneg = n - npos
    if not npos or not nneg:
        raise ValueError(f"AUC undefined: {npos} positives, {nneg} negatives")
    u = agg["rpos"] - npos * (npos + 1) / 2.0
    return float(u / (npos * nneg))
