"""Mergeable Bloom-filter sketch + broadcastable membership prefilter.

The missing piece between "broadcast the whole small-side key set" and
"shuffle the 100 TB side to join it": a fixed-size bitset that answers
"might this key be on the small side?" scan-side, with zero false
negatives. At 100 TB the corpus-side shingle/key stream is the dominant
shuffle cost of contamination checks and semi-join-shaped audits; a
2^20-bit Bloom (128 KB) built from the eval/bench side prunes that
stream **before** any exchange, and the exact equi-join downstream
removes the false positives — so composed results are bit-identical to
the exact plan (the property the oracle checks exploit).

Spark itself injects runtime bloom filters into some join plans
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only within a
single query, only when the creation side is under a size threshold, and
never persisted. This operator makes the sketch a first-class value:
built with one aggregation (map-side combinable ``bit_or`` partials —
the same mergeability contract as the HLL/KLL/theta sketches in
``profiling.py``), persistable as ordinary rows, unionable across
days/partitions with ``bloom_merge``, and applied as a pure native
expression (no UDF; stays inside WholeStageCodegen).

Hash contract (shared by build and probe — the zero-false-negative
guarantee depends on both sides computing byte-identical positions):

    position_i = pmod(xxhash64(key, CAST(i AS INT)), num_bits),  i ∈ [0, k)

``xxhash64``'s multi-argument form keys the hash on the probe index,
giving k independent hash functions from one JVM-side primitive. The
bitset is stored as ``num_bits/64`` bigint words, little-endian within
the word (bit ``p % 64`` of word ``p >> 6``).

The reference has no sketch surface (its scale ceiling was one JDBC
table per job); this is part of the engine's 100 TB gap-closing tier
alongside HLL/KLL/theta/CMS.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Same rationale as ``similarity._PQ_EXPR_MAX_LITERALS``: a literal
#: array this long embeds ~1.3 MB of SQL text in the plan — past that,
#: shrink the filter (or keep the sketch as rows and broadcast-join it).
_BLOOM_MAX_LITERAL_WORDS = 65536


def _check_shape(num_bits: int, num_hashes: int) -> None:
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 16, num_hashes: int = 4
) -> DataFrame:
    """Build the sketch: one (word_idx INT, word BIGINT) row per touched word.

    Single aggregation job — the explode multiplies rows k-fold but the
    ``bit_or`` partials combine map-side, so the exchange carries at
    most ``num_bits/64`` rows per partition regardless of input size.
    Untouched words are omitted (densify with :func:`bloom_words`).
    """
    _check_shape(num_bits, num_hashes)
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    return (
        df.select(F.explode(positions).alias("pos"))
        .select(
            F.shiftright("pos", 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches of the SAME shape: bitwise-OR aligned words.

    ``merge(build(A), build(B)) == build(A ∪ B)`` exactly (bit-for-bit;
    pinned in tests) — the property that lets per-day / per-partition
    sketches persist and re-aggregate without touching rows.
    """
    if not sketches:
        raise ValueError("bloom_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_words(sketch: DataFrame, num_bits: int) -> list[int]:
    """Densify a sketch to its full little-endian word list.

    The collect is O(num_bits/64) rows — kilobytes by construction,
    independent of how many keys were inserted; this is the broadcast
    step, same cost class as collecting fitted centroids.
    """
    n = num_bits // 64
    out = [0] * n
    for r in sketch.collect():
        i = r["word_idx"]
        if not 0 <= i < n:
            raise ValueError(
                f"sketch word_idx {i} out of range for num_bits={num_bits} "
                "(was the sketch built with a different num_bits?)"
            )
        out[i] = r["word"] or 0
    return out


def bloom_might_contain(
    col: str, words: Sequence[int], num_bits: int, num_hashes: int = 4
) -> Column:
    """Membership predicate over a densified sketch — pure native expression.

    ``col`` is a SQL expression string naming the probe key. False
    negatives are impossible (probe recomputes the build's exact
    positions); false positives pass and must be removed by the exact
    operator downstream — which is why composed uses (prefilter + exact
    join) stay bit-identical to the unfiltered plan. The word list
    embeds once as an array literal inside a ``forall`` lambda, so plan
    size is O(num_bits/64), not O(k * num_bits/64).
    """
    _check_shape(num_bits, num_hashes)
    if len(words) != num_bits // 64:
        raise ValueError(
            f"words has {len(words)} entries, expected {num_bits // 64} "
            "(densify with bloom_words)"
        )
    if len(words) > _BLOOM_MAX_LITERAL_WORDS:
        raise ValueError(
            f"{len(words)} words exceeds the {_BLOOM_MAX_LITERAL_WORDS}-literal "
            "plan budget — use fewer bits, or keep the sketch as rows and "
            "broadcast-join it instead of embedding it"
        )
    arr = "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
    return F.expr(
        f"forall("
        f"transform(sequence(0, {num_hashes - 1}), "
        f"i -> pmod(xxhash64(({col}), CAST(i AS INT)), {num_bits})), "
        f"p -> (element_at({arr}, CAST(shiftright(p, 6) AS INT) + 1) "
        f"& shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)"
    )


def bloom_fp_rate(num_bits: int, num_hashes: int, n_items: int) -> float:
    """Expected false-positive rate (1 - e^{-kn/m})^k — the sizing formula.

    Used by tests to bound the measured rate and by callers to pick
    ``num_bits`` for a target rate at the expected small-side
    cardinality.
    """
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_items / num_bits)) ** num_hashes
