"""Schema evolution sync: ledger schema changes → target-table DDL.

The reference evolves schemas by rebuilding the table with extra columns and
renaming it over the original (``/root/reference/Sql Scripts/
FCT_RESERVATION_UPD.sql:167-256``). The engine instead diffs the incoming
feed's schema against the lake table **by field id** and issues
``add_column`` / ``rename_column`` — a rename keeps the field id, so data
files written before the rename still resolve (Iceberg semantics).

The mapping ledger-field-id → pages-column-name is persisted in the pages
table properties (``ledger_field_map``) and reconciled idempotently: a crash
between the DDL commit and the map update is repaired on the next sync (the
rename/add is detected as already applied and only the map is refreshed).
"""

from __future__ import annotations

import json

from ..lake import LakeTable

LEDGER_META_COLS = ("seq", "part", "op")
FIELD_MAP_PROP = "ledger_field_map"


def payload_fields(ledger: LakeTable) -> list:
    return [f for f in ledger.manifest.current_fields if f.name not in LEDGER_META_COLS]


def initial_field_map(ledger: LakeTable) -> dict[str, str]:
    return {str(f.id): f.name for f in payload_fields(ledger)}


def sync_schema(ledger: LakeTable, pages: LakeTable) -> LakeTable:
    """Bring ``pages`` columns in line with the ledger's current payload
    schema. Returns the (possibly evolved) pages handle."""
    fmap: dict[str, str] = json.loads(pages.manifest.properties.get(FIELD_MAP_PROP, "{}"))
    pages_names = {f.name for f in pages.manifest.current_fields}
    changed = False

    for lf in payload_fields(ledger):
        fid = str(lf.id)
        mapped = fmap.get(fid)
        if mapped is None:
            # new feed column → ADD COLUMN (idempotent if a crash left it half-applied)
            if lf.name not in pages_names:
                pages = pages.add_column(lf.name, lf.type)
            fmap[fid] = lf.name
            changed = True
        elif mapped != lf.name:
            # feed renamed the column → RENAME (no-op if already applied pre-crash)
            if mapped in pages_names and lf.name not in pages_names:
                pages = pages.rename_column(mapped, lf.name)
            fmap[fid] = lf.name
            changed = True
        pages_names = {f.name for f in pages.manifest.current_fields}

    if changed:
        pages = pages.set_properties({FIELD_MAP_PROP: json.dumps(fmap, sort_keys=True)})
    return pages
