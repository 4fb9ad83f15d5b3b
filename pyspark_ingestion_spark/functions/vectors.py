"""Vector math over ``ARRAY<FLOAT>`` embedding columns — pure native expressions.

Everything stays JVM-side (``zip_with``/``aggregate`` higher-order
functions compile into codegen'd loops); no Python UDFs, no Arrow
transfer. Math is done in double precision regardless of the stored
float type so results are stable and comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dcol(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (no explode, no shuffle)."""
    return F.aggregate(
        F.zip_with(_dcol(a), _dcol(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; NULL if either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def sign_bucket(a: Column | str, n_dims: int = 8) -> Column:
    """Deterministic coarse bucket: the sign pattern of the first ``n_dims``
    components, packed into an int. A fixed-hyperplane LSH — vectors can
    only be near-neighbors under cosine if they mostly share signs, so
    bucketing by sign prunes the candidate space without randomness
    (keeps results reproducible across engines and runs).
    """
    acc = F.lit(0)
    arr = _dcol(a)
    for i in range(n_dims):
        acc = acc + F.when(F.element_at(arr, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return acc
