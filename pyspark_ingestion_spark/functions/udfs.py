"""The UDF escape hatch — Python surfaces for logic with no native expression.

Engine policy (SURVEY §4 O-GAP2): native Column expressions first,
always. The reference implemented its ENTIRE scalar surface as
row-at-a-time Python UDFs (reference config.py:32-90 — `BatchEvalPython`,
rows pickled one by one); this module shows the two surfaces that remain
legitimate in the new engine and how to use them without giving up
Arrow batching:

- ``pandas_udf`` — vectorized scalar functions (Arrow column batches,
  10-100× faster than row UDFs) for model scoring / library calls.
- ``udtf`` — user-defined TABLE functions (one row in → many rows out)
  for custom flattening/generation the built-in generators can't do.

Both demos reimplement logic the engine also has natively, so the
driver's oracle can verify the Python path BIT-EXACTLY against SQL —
proving the escape hatch preserves semantics, not just shape. The
tokenizer mirrors the engine's ASCII-``\\s`` split semantics (Java/RE2
regex, NOT Python's Unicode ``str.split``).

NOTE the decorator placement: ``pandas_udf``/``udtf`` are applied at
CALL time, not import time — executors re-import this module when
unpickling, and the decorators need the JVM, which Python workers
don't have.
"""

from __future__ import annotations

import re

import pandas as pd


def _ascii_words(text: str | None) -> list[str]:
    """words() semantics: trim ASCII spaces, split on ASCII whitespace runs."""
    if text is None:
        return []
    t = text.strip(" ")
    return [] if t == "" else re.split(r"\s+", t, flags=re.ASCII)


def _quality_batch(text: pd.Series) -> pd.Series:
    """Vectorized quality score: (letters/chars) × min(1, words/20).

    NULL in → NULL out (nullable Float64 + pd.NA → Arrow null), matching
    the native expression and the SQL oracle — float NaN would NOT do
    this (Spark keeps NaN distinct from NULL).
    """
    import numpy as np

    chars = text.str.len().astype("float64")
    letters = text.str.count(r"[A-Za-z]").astype("float64")
    words = text.map(lambda t: float(len(_ascii_words(t))), na_action="ignore")
    score = (letters / chars) * (words / 20.0).clip(upper=1.0)
    # half-UP to 6 dp: SQL ROUND (Spark/DuckDB) rounds .5 away from zero,
    # pandas .round is banker's half-even — they differ on exact boundaries
    rounded = np.floor(score.where(chars > 0, 0.0) * 1e6 + 0.5) / 1e6
    return pd.Series(rounded, dtype="Float64").mask(text.isna(), pd.NA)


def quality_score_pandas():
    """Arrow-vectorized scalar UDF reimplementing functions.text.quality_score."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_quality_batch, "double")


class SplitWordsUDTF:
    """Table function: text → one row per (word, 0-based position).

    The generator shape ``explode``/``posexplode`` already covers for
    arrays; a UDTF earns its keep when the expansion needs real Python
    (custom tokenizers, parsers, model-driven span extraction). Pure and
    deterministic here, so Catalyst may evaluate it freely.
    """

    def eval(self, text: str | None):
        for i, w in enumerate(_ascii_words(text)):
            yield w, i


def split_words_udtf():
    """The registered form of SplitWordsUDTF (returnType bound at call time)."""
    from pyspark.sql.functions import udtf

    return udtf(SplitWordsUDTF, returnType="word string, pos int")


def order_gaps_grouped(orders, key_col="o_custkey", date_col="o_orderdate",
                       id_col="o_orderkey"):
    """Per-key consecutive-event gaps via ``groupBy().applyInPandas``.

    The grouped-map escape hatch: each key's rows arrive as ONE pandas
    frame (sorted here, then diffed), for logic that genuinely needs the
    whole group in memory — sequence models, per-group fitting, custom
    session logic. This particular computation is also expressible as a
    lag window (which the SQL oracle uses), making the pandas path
    value-checkable bit-for-bit: gaps are integer day counts, so no
    float drift. One shuffle on the key; per-group memory is the bound
    to watch at 100 TB (a hot key's whole history in one task — cap
    with a date horizon upstream if keys can be unbounded).
    """
    import pandas as pd

    def _gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([date_col, id_col])
        days = pd.to_datetime(pdf[date_col]).diff().dt.days
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                id_col: pdf[id_col],
                "gap_days": days.astype("Int64"),
            }
        )

    out_schema = f"{key_col} long, {id_col} long, gap_days int"
    return (
        orders.select(key_col, id_col, date_col)
        .groupBy(key_col)
        .applyInPandas(_gaps, schema=out_schema)
    )


class NGramsUDTF:
    """Polymorphic table function: (text, n) → one row per n-gram, with
    the OUTPUT SCHEMA derived from the ``n`` argument at plan time via
    ``analyze`` (Spark 3.5+/4 polymorphic UDTF contract) — n=2 plans
    (w0, w1, pos), n=3 plans (w0, w1, w2, pos).

    This is the API for Python expansions whose shape depends on their
    arguments (parsers with schema args, configurable extractors);
    static-``returnType`` UDTFs (SplitWordsUDTF) can't express it.
    Tokenization shares ``_ascii_words`` so results stay engine-portable.
    """

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import IntegerType, StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None:
            # non-constant n: AnalyzeArgument.value is None — the output
            # schema is plan-time, so n must be a literal
            raise ValueError(
                "NGramsUDTF: n must be a constant literal (the output "
                "schema is derived from it at plan time)"
            )
        nv = int(n.value)
        if nv < 1:
            raise ValueError(f"n must be >= 1, got {nv}")
        fields = [StructField(f"w{i}", StringType()) for i in range(nv)]
        return AnalyzeResult(StructType(fields + [StructField("pos", IntegerType())]))

    def eval(self, text: str | None, n: int):
        ws = _ascii_words(text)
        for i in range(max(len(ws) - n + 1, 0)):
            yield tuple(ws[i : i + n]) + (i,)


def ngrams_udtf():
    """The registered form of NGramsUDTF (schema bound by analyze())."""
    from pyspark.sql.functions import udtf

    return udtf(NGramsUDTF)
