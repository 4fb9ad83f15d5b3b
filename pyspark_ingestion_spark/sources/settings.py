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
    def _cell(v):
        """Blank-cell normalization: pandas delivers empty Excel cells
        as float NaN (truthy!), csv as "" — both mean 'no value'. A NaN
        ref would otherwise LOCK the group's ref at the first blank row
        (NaN is not None) and defeat the refless-table skip filter."""
        if v is None:
            return None
        if isinstance(v, float) and v != v:  # NaN
            return None
        s = str(v).strip()
        return s or None

    grouped: dict[str, dict] = {}
    for row in rows:
        key = f"{row[DD_SCHEMA_COL]}.{row[DD_TABLE_COL]}"
        g = grouped.setdefault(key, {"columns": [], "ref": None})
        col = _cell(row.get(DD_COLUMN_COL))
        if col and col not in g["columns"]:
            g["columns"].append(col)
        ref = _cell(row.get(DD_REF_COL))
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

    Prefers pandas + an Excel engine (openpyxl) when installed; falls
    back to a minimal stdlib reader of the public OOXML layout
    (xlsx = zip of XML parts) that covers what a data dictionary needs:
    shared/inline strings, numbers, booleans, multiple sheets.
    """
    try:
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None)
        rows = pd.concat(sheets.values()).to_dict("records")
    except ImportError:
        rows = []
        for sheet_rows in read_xlsx(path).values():
            if not sheet_rows:
                continue
            header = [str(h) if h is not None else "" for h in sheet_rows[0]]
            for raw in sheet_rows[1:]:
                padded = list(raw) + [None] * (len(header) - len(raw))
                rows.append(dict(zip(header, padded)))
    return parse_data_dictionary(rows, **kwargs)


def read_xlsx(path: str) -> dict[str, list[list]]:
    """Minimal stdlib XLSX reader → {sheet name: rows of cell values}.

    Parses the public OOXML workbook layout directly with zipfile +
    ElementTree: workbook.xml for sheet names/ids, workbook.xml.rels for
    part targets, sharedStrings.xml for the string table, and each
    worksheet's ``<c r="A1" t="..."><v>`` cells. Cell types covered:
    shared string (t=s), inline string (t=inlineStr), formula-string
    (t=str), boolean (t=b), numeric (default; int when integral). Gaps
    between cells become None. Enough for config workbooks — this is
    driver-side tooling, not a data path.
    """
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

    def _cell_col(ref: str) -> int:
        acc = 0
        for ch in re.match(r"[A-Z]+", ref).group(0):
            acc = acc * 26 + (ord(ch) - 64)
        return acc - 1

    def _si_text(si) -> str:
        # plain <t> or rich-text runs <r><t>
        return "".join(t.text or "" for t in si.iter(f"{{{ns['m']}}}t"))

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in sst.findall("m:si", ns)]

        out: dict[str, list[list]] = {}
        for sheet in wb.find("m:sheets", ns):
            name = sheet.get("name")
            target = rel_target[sheet.get(rns)]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row in ws.iter(f"{{{ns['m']}}}row"):
                vals: list = []
                for c in row.findall("m:c", ns):
                    idx = _cell_col(c.get("r", "A1"))
                    while len(vals) < idx:
                        vals.append(None)
                    t = c.get("t", "n")
                    if t == "inlineStr":
                        is_el = c.find("m:is", ns)
                        vals.append(_si_text(is_el) if is_el is not None else None)
                        continue
                    v = c.find("m:v", ns)
                    if v is None or v.text is None:
                        vals.append(None)
                    elif t == "s":
                        vals.append(shared[int(v.text)])
                    elif t == "str":
                        vals.append(v.text)
                    elif t == "b":
                        vals.append(v.text == "1")
                    else:
                        num = float(v.text)
                        vals.append(int(num) if num.is_integer() else num)
                rows.append(vals)
            out[name] = rows
    return out
