"""Native rewrites of the reference's entire scalar-function surface.

The reference implemented every one of these as a row-at-a-time Python
UDF (reference config.py:14-92 — SURVEY §2.4 F1-F8), which forces
``BatchEvalPython`` nodes: rows pickled to Python workers, no codegen,
no predicate pushdown through them. Each function below is a pure
Column→Column expression that stays inside whole-stage codegen and is
pushdown-transparent — at 100 TB this is the difference between the JDBC
source shipping only new rows vs. the full table every run.

Pinned semantics (FIXTURES.md, SURVEY §7 risks):
- YEAR/MONTH/WEEK partition values are *strings*; MONTH/WEEK not
  zero-padded (matches the reference's Python ``str(ts.month)``).
- WEEK is ISO-8601 week-of-year (``weekofyear`` ≡ ``isocalendar()[1]``).
- Boolean stringification follows Spark ``cast('string')`` →
  ``'true'/'false'`` (documented divergence from Python ``'True'``).
- ``sha2`` of NULL is NULL (matches the reference's AttributeError→None).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sap_timestamp(date_col: Column | str, time_col: Column | str) -> Column:
    """F1 — SAP composite timestamp parse.

    Two string columns, date ``'yyyyMMdd'`` + time ``'HHmmss'``, combined
    into a single timestamp. Parity: reference config.py:18-32
    (``custom_date`` UDF slicing year [:4], month [4:6], day [6:], …) —
    here a single codegen'd ``to_timestamp(concat(...))``.
    """
    return F.to_timestamp(F.concat(_col(date_col), _col(time_col)), "yyyyMMddHHmmss")


def year_string(ts: Column | str) -> Column:
    """F2 — YEAR partition value as string (reference config.py:38,53,89)."""
    return F.year(_col(ts)).cast("string")


def month_string(ts: Column | str) -> Column:
    """F3 — MONTH partition value as non-zero-padded string (reference config.py:39,54)."""
    return F.month(_col(ts)).cast("string")


def day_string(ts: Column | str) -> Column:
    """DAY partition value as non-zero-padded string — completes the
    YEAR/MONTH family for day-grain lake layouts (the partition_date
    view recombines all three; see catalog.cvas_partition_date)."""
    return F.dayofmonth(_col(ts)).cast("string")


def iso_week_string(ts: Column | str) -> Column:
    """F4 — ISO-8601 week-of-year as string (reference config.py:90).

    ``weekofyear`` is ISO-8601, matching Python ``isocalendar()[1]``.
    """
    return F.weekofyear(_col(ts)).cast("string")


def sha256_pseudonymize(c: Column | str) -> Column:
    """F5 — SHA-256 pseudonymization, NULL-safe (reference config.py:68-77)."""
    return F.sha2(_col(c), 256)


def stringify(c: Column | str) -> Column:
    """F6 — cast any column to string (reference config.py:81-85).

    Spark renders booleans ``'true'/'false'`` (pinned divergence from the
    reference's Python ``str()`` → ``'True'/'False'``).
    """
    return _col(c).cast("string")


def partition_date(
    year_col: Column | str = "year",
    month_col: Column | str = "month",
    day_col: Column | str = "day",
) -> Column:
    """F8 — reassemble a DATE from string partition columns.

    Parity: the Athena CVAS view's
    ``CAST(date_parse(concat(year,month,day),'%Y%m%d') AS date)``
    (reference athena.py:77-83). Zero-pads month/day first so the
    non-padded partition strings still parse.
    """
    return F.to_date(
        F.concat(
            F.lpad(_col(year_col), 4, "0"),
            F.lpad(_col(month_col), 2, "0"),
            F.lpad(_col(day_col), 2, "0"),
        ),
        "yyyyMMdd",
    )


def aes_pseudonymize(
    col: Column | str, key: Column | str, deterministic: bool = True
) -> Column:
    """Reversible PII tokenization with native AES (vs F5's one-way sha256).

    The modern replacement for the reference's security surface (its
    MD5-derived-key 3DES settings cipher is obsolete — SURVEY says do
    not reproduce; Spark's aes_encrypt is the supported primitive).
    ``deterministic=True`` uses ECB so equal plaintexts tokenize equally
    — required when the token must keep join/group semantics across
    tables, at the classic cost that equal values are linkable; pass
    False for randomized GCM (semantically secure, but tokens no longer
    join). Key must be 16/24/32 bytes. Returns binary.
    """
    mode = F.lit("ECB") if deterministic else F.lit("GCM")
    return F.aes_encrypt(_col(col), _col(key) if not isinstance(key, str) else F.lit(key), mode)


def aes_reveal(
    col: Column | str, key: Column | str, deterministic: bool = True
) -> Column:
    """Inverse of :func:`aes_pseudonymize` → original string."""
    mode = F.lit("ECB") if deterministic else F.lit("GCM")
    return F.aes_decrypt(
        _col(col), _col(key) if not isinstance(key, str) else F.lit(key), mode
    ).cast("string")
