"""Source-catalog settings: declarative per-system/per-table configuration.

Parity: the reference stored a nested settings dict 3DES-encrypted on
disk with an MD5-derived key (reference utils/security.py:7-36,
constants.py:9-24) and parsed an Excel data dictionary into per-table
settings (reference bin/ingestion/parse-data-dictionary.py:21-54).

Here the catalog is plain JSON/CSV validated into dataclasses — secrets
belong in env vars or a real keystore, not homegrown crypto (SURVEY §1.1
flags the reference scheme as do-NOT-reproduce). The data-dictionary
ingester keeps the reference's semantics: rows are grouped per
``schema.table``, the imported-column list is the group's column set,
and the incremental reference column is the first non-null
``INCREMENTAL_REFERENCE`` value in the group.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark_ingestion_spark.ingestion.prep import TableSettings

#: data-dictionary column names (reference parse-data-dictionary.py:9-13)
DD_SCHEMA_COL = "TABLE_SCHEMA"
DD_TABLE_COL = "TABLE_NAME"
DD_COLUMN_COL = "COLUMN_NAME"
DD_REF_COL = "INCREMENTAL_REFERENCE"

#: reference hardcoded this initial watermark (parse-data-dictionary.py:41-45)
DEFAULT_REF_FIRST_VALUE = "2019-04-30T00:00:00.000000Z"


@dataclass
class SystemSettings:
    """Connection + table catalog for one source system
    (reference constants.py:9-24 key set, credentials via env)."""

    dbms: str
    host: str = ""
    port: str = ""
    service: str = ""
    driver: str | None = None
    user_env: str = ""  # env var NAME holding the username
    password_env: str = ""  # env var NAME holding the password
    tables: dict[str, TableSettings] = field(default_factory=dict)

    @property
    def user(self) -> str | None:
        return os.environ.get(self.user_env) if self.user_env else None

    @property
    def password(self) -> str | None:
        return os.environ.get(self.password_env) if self.password_env else None


def load_settings(path: str) -> dict[str, SystemSettings]:
    """Load a plain-JSON settings catalog → {system: SystemSettings}.

    Shape: {"connection": {<system>: {dbms, host, ..., "table-settings":
    {<table>: {ref_column, ...}}}}} — the reference's decrypted layout
    (constants.py:9-24), minus inline credentials.
    """
    with open(path) as f:
        doc = json.load(f)
    systems: dict[str, SystemSettings] = {}
    for name, cfg in doc.get("connection", {}).items():
        tables = {
            t: TableSettings(**ts) for t, ts in cfg.get("table-settings", {}).items()
        }
        systems[name] = SystemSettings(
            dbms=cfg.get("dbms", ""),
            host=cfg.get("host", ""),
            port=str(cfg.get("port", "")),
            service=cfg.get("service", ""),
            driver=cfg.get("driver"),
            user_env=cfg.get("user_env", ""),
            password_env=cfg.get("password_env", ""),
            tables=tables,
        )
    return systems


def parse_data_dictionary(
    rows: list[dict],
    ref_first_value: str = DEFAULT_REF_FIRST_VALUE,
) -> dict[str, TableSettings]:
    """Data-dictionary rows → per-table settings (reference S5 semantics).

    ``rows`` are plain dicts with TABLE_SCHEMA / TABLE_NAME / COLUMN_NAME
    / INCREMENTAL_REFERENCE keys — from ``csv.DictReader``, a pandas
    frame's ``to_dict("records")``, or a collected Spark DataFrame; the
    source format (Excel/CSV/table) is the caller's concern. Keyed by
    ``schema.table`` (reference's TABLE_RESOLUTION). Tables whose group
    has no non-null INCREMENTAL_REFERENCE are skipped, matching the
    reference's dropna on the ref column.
    """
    grouped: dict[str, dict] = {}
    for row in rows:
        key = f"{row[DD_SCHEMA_COL]}.{row[DD_TABLE_COL]}"
        g = grouped.setdefault(key, {"columns": [], "ref": None})
        col = row.get(DD_COLUMN_COL)
        if col and col not in g["columns"]:
            g["columns"].append(col)
        ref = row.get(DD_REF_COL)
        if g["ref"] is None and ref:
            g["ref"] = ref
    return {
        key: TableSettings(
            ref_column=g["ref"],
            ref_first_value=ref_first_value,
            columns_to_import=g["columns"],
        )
        for key, g in grouped.items()
        if g["ref"]
    }


def parse_data_dictionary_csv(path: str, **kwargs) -> dict[str, TableSettings]:
    """CSV data dictionary → per-table settings (driver-side config tooling)."""
    import csv

    with open(path, newline="") as f:
        return parse_data_dictionary(list(csv.DictReader(f)), **kwargs)


def parse_data_dictionary_excel(path: str, **kwargs) -> dict[str, TableSettings]:
    """Excel workbook → per-table settings (reference
    parse-data-dictionary.py:21-54: read all sheets, concat, group).

    Requires pandas plus an Excel engine (openpyxl) — not present in
    every deployment, so this is import-gated; convert the workbook to
    CSV and use :func:`parse_data_dictionary_csv` where it isn't.
    """
    try:
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None)
    except ImportError as e:
        raise NotImplementedError(
            "Excel parsing needs pandas + openpyxl; export the workbook to "
            "CSV and use parse_data_dictionary_csv instead"
        ) from e
    rows = pd.concat(sheets.values()).to_dict("records")
    return parse_data_dictionary(rows, **kwargs)
