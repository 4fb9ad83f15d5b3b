"""Incremental-load watermark state ("sync file").

Parity: the reference keeps one JSON file per table *inside the table
directory* with shape
``{"sync": {"system", "table_name", "ref_column", "ref_last_value"}}``
and format ``%Y-%m-%dT%H:%M:%S.%fZ`` (reference ingestion.py:143-164,
constants.py:26). The same shape is kept here for drop-in compatibility,
but reads/writes go through one small class so a metadata-table backend
can replace the JSON file without touching the pipeline.

This is driver-side scalar state — a few hundred bytes per table — so a
local/object-store JSON file is the right tool even at 100 TB; the data
path never touches it.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass

SYNC_FILENAME = "sync.json"
SYNC_DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%S.%fZ"


@dataclass
class Watermark:
    system: str
    table_name: str
    ref_column: str
    ref_last_value: str  # SYNC_DATETIME_FORMAT string

    def as_datetime(self) -> dt.datetime:
        return dt.datetime.strptime(self.ref_last_value, SYNC_DATETIME_FORMAT)

    def to_dict(self) -> dict:
        return {
            "sync": {
                "system": self.system,
                "table_name": self.table_name,
                "ref_column": self.ref_column,
                "ref_last_value": self.ref_last_value,
            }
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Watermark":
        s = d["sync"]
        return cls(s["system"], s["table_name"], s["ref_column"], s["ref_last_value"])


def format_watermark(ts: dt.datetime) -> str:
    return ts.strftime(SYNC_DATETIME_FORMAT)


def _require_local_path(table_path: str) -> None:
    """The JSON watermark store is local-filesystem only — fail loud on URIs.

    ``os.path`` silently treats ``gs://...`` as a relative local path: the
    watermark would 'reset' every run (duplicating every batch) while
    writes landed in a bogus local ``gs:/`` directory. Object-store
    deployments should keep the lake remote but the sync state on a
    driver-local/shared-posix path, or swap this module for a
    metadata-table backend (the pipeline only touches it through
    read_watermark/write_watermark).
    """
    if "://" in table_path:
        raise NotImplementedError(
            f"JSON watermark store requires a local filesystem path, got "
            f"{table_path!r}; point the sync store at a local/posix path or "
            "use a metadata-table backend"
        )


def read_watermark(
    table_path: str,
    system: str,
    table_name: str,
    ref_column: str,
    ref_first_value: str,
) -> Watermark:
    """Load the table's watermark; initialize from ``ref_first_value`` if absent.

    Parity: reference ``read_sync_file`` (ingestion.py:143-158).
    """
    _require_local_path(table_path)
    path = os.path.join(table_path, SYNC_FILENAME)
    if os.path.exists(path):
        with open(path) as f:
            return Watermark.from_dict(json.load(f))
    return Watermark(system, table_name, ref_column, ref_first_value)


def write_watermark(wm: Watermark, table_path: str) -> None:
    """Persist the watermark after a successful write (reference ingestion.py:161-164).

    Written atomically (tmp + rename) so a crash mid-write can't corrupt
    state; a crash *between* data write and watermark write re-ingests
    the last batch, which the dynamic-partition-overwrite writer makes
    idempotent (SURVEY §4 O-GAP6).
    """
    _require_local_path(table_path)
    os.makedirs(table_path, exist_ok=True)
    path = os.path.join(table_path, SYNC_FILENAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(wm.to_dict(), f, indent=2)
    os.replace(tmp, path)
