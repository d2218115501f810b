"""Schema-evolution sync (field-id diff → DDL) — pure manifest logic, no Spark."""

import json
import os

from data_warehouse_etl_spark.cdc import evolve
from data_warehouse_etl_spark.lake import LakeTable

LEDGER_SCHEMA = [
    ("seq", "bigint"), ("part", "int"), ("op", "string"),
    ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"), ("lang", "string"),
]


def _mk(tmp, name, schema):
    return LakeTable.create(os.path.join(str(tmp), name), schema, bucket_col=None)


def _pages_for(tmp, ledger):
    cols = []
    for f in evolve.payload_fields(ledger):
        cols.append((f.name, f.type))
        if f.name == "html":
            cols.append(("text", "string"))
    cols += [("_seq", "bigint"), ("_deleted", "boolean")]
    return LakeTable.create(
        os.path.join(str(tmp), "pages"), cols, bucket_col="url",
        properties={evolve.FIELD_MAP_PROP: json.dumps(evolve.initial_field_map(ledger))},
    )


def _names(t):
    return [f.name for f in t.manifest.current_fields]


def test_rename_and_add_sync(tmp_path):
    ledger = _mk(tmp_path, "ledger", LEDGER_SCHEMA)
    pages = _pages_for(tmp_path, ledger)
    ledger.add_column("fetch_status", "int")
    ledger.rename_column("lang", "language")

    pages = evolve.sync_schema(ledger, pages)
    assert "language" in _names(pages) and "lang" not in _names(pages)
    assert "fetch_status" in _names(pages)
    # pages' renamed column kept its field id (old files still resolve)
    ids = {f.name: f.id for f in pages.manifest.current_fields}
    old_ids = {f.name: f.id for f in pages.manifest.schemas[0]}
    assert ids["language"] == old_ids["lang"]
    # idempotent: second sync is a no-op
    v = pages.manifest.version
    pages = evolve.sync_schema(ledger, pages)
    assert pages.manifest.version == v


def test_crash_between_ddl_and_map_is_repaired(tmp_path):
    """Simulate the crash window: DDL applied but the field map not updated.
    The next sync must detect the applied rename and only refresh the map."""
    ledger = _mk(tmp_path, "ledger", LEDGER_SCHEMA)
    pages = _pages_for(tmp_path, ledger)
    ledger.rename_column("lang", "language")
    # crash simulation: apply the rename to pages manually, leave map stale
    pages = pages.rename_column("lang", "language")
    pages = evolve.sync_schema(ledger, pages)
    assert "language" in _names(pages)
    fmap = json.loads(pages.manifest.properties[evolve.FIELD_MAP_PROP])
    lang_fid = str([f.id for f in ledger.manifest.current_fields if f.name == "language"][0])
    assert fmap[lang_fid] == "language"


def test_repeated_rename_chain(tmp_path):
    ledger = _mk(tmp_path, "ledger", LEDGER_SCHEMA)
    pages = _pages_for(tmp_path, ledger)
    ledger.rename_column("lang", "language")
    pages = evolve.sync_schema(ledger, pages)
    ledger.rename_column("language", "lang_code")
    pages = evolve.sync_schema(ledger, pages)
    assert "lang_code" in _names(pages)
    assert "language" not in _names(pages) and "lang" not in _names(pages)
