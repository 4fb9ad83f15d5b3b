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


def sign_pack(a: Column | str, start: int = 0, n_bits: int = 32) -> Column:
    """Pack the sign bits of components [start, start+n_bits) into one
    BIGINT: bit i = 1 iff component start+i ≥ 0. The binary-quantized
    embedding representation (32× smaller than float32) scored by
    Hamming distance — a scan-side fold (high→low, acc·2 + bit), no
    shift-by-column needed, so both the packing and the downstream
    ``bit_count(xor(...))`` scoring stay in whole-stage codegen and are
    SQL-oracle-reproducible. Keep n_bits ≤ 32 and split wider vectors
    into (lo, hi) halves: bit 63 of a single long would need
    two's-complement wraparound SQL cannot express (the PHASH_SCHEMA
    rationale)."""
    if not 1 <= n_bits <= 32:
        raise ValueError(f"n_bits must be in [1, 32], got {n_bits}")
    if start < 0:
        # a negative start would make element_at index from the array
        # END silently — fail loud like the n_bits check does.
        raise ValueError(f"start must be >= 0, got {start}")
    arr = _dcol(a)
    return F.aggregate(
        F.sequence(F.lit(n_bits - 1), F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.element_at(arr, i + start + 1) >= 0, 1).otherwise(0),
    )


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
