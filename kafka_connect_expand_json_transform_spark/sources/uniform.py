"""UniForm-style Delta export for txlog tables — write a spec-conformant
``_delta_log`` BESIDE the txlog's own log, over the SAME immutable data
files, so any Delta client (delta-rs, delta-spark, this repo's
``delta_reader``) can read the table without copying a byte.

This is the public "Delta UniForm" idea (one copy of data, multiple
format metadata trees) applied to the repo's native table format: txlog
data files are plain parquet and immutable per version, which is exactly
Delta's add-action contract, so the export is METADATA-ONLY:

* ``export_delta(root)`` — snapshot the txlog's CURRENT file set into the
  next Delta version: first call writes version 0 (protocol + metaData +
  adds); later calls diff against the previously exported state and write
  adds/removes only (no change -> no new version, returns the existing
  one).  The Delta schemaString is the txlog's log-owned schema
  (Spark's StructType JSON — the exact format Delta uses).

Fail-closed (metadata-only export cannot represent these; a wrong export
would corrupt every downstream Delta reader):

* live merge-on-read DELETION VECTORS (Delta expresses DVs with reader
  feature v3 sidecars this exporter does not write) — compact first;
* hive-PARTITIONED txlog tables (partition values live in the txlog stats
  sidecar, not in the files; Delta needs partitionValues per add plus a
  partition-pruned directory contract) — export the unpartitioned layout;
* column mapping renames (the txlog stores physical names in files;
  expressible as Delta columnMapping=name, left for a later tier).

Scale: the export is O(live files) metadata on the planner — the same
bound the txlog's own commit machinery pays — and zero data movement.
"""

from __future__ import annotations

import json
import os
import time as _time

from pyspark.sql import types as T

from kafka_connect_expand_json_transform_spark.sources import txlog as TX


class UniformExportUnsupported(RuntimeError):
    """The txlog table uses features a metadata-only Delta export cannot
    represent; see the docstring for the compact-first workarounds."""


def _txlog_state(root: str):
    entries = TX._list_entries(root)
    if not entries:
        raise FileNotFoundError(f"no txlog table at {root}")
    version = entries[-1]["version"]
    files, schema_ddl = TX._replay(entries, None)
    if TX._replay_dvs(entries, None):
        raise UniformExportUnsupported(
            "table has live merge-on-read deletion vectors; run "
            "compact_table() first — a metadata-only export cannot "
            "express DVs"
        )
    if TX._table_partition_by(entries):
        raise UniformExportUnsupported(
            "hive-partitioned txlog tables are not exportable yet "
            "(partition values live in the stats sidecar, not the files)"
        )
    mapping = TX._replay_mapping(entries)
    if any(k != v for k, v in mapping.items()):
        raise UniformExportUnsupported(
            "table has column-mapping renames; exportable as Delta "
            "columnMapping=name in a later tier"
        )
    return entries, version, files, schema_ddl


def _expand_parquet(root: str, rel_entries: list[str]) -> dict[str, int]:
    """Concrete parquet files (rel path -> size) under the replayed file
    entries, which may be single files or version directories."""
    out: dict[str, int] = {}
    for rel in rel_entries:
        p = os.path.join(root, rel)
        if os.path.isfile(p):
            out[rel] = os.path.getsize(p)
            continue
        for dirpath, _dirs, names in os.walk(p):
            for n in sorted(names):
                if not n.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, n)
                out[os.path.relpath(full, root)] = os.path.getsize(full)
    return out


def _delta_replayed(root: str) -> tuple[int | None, set[str]]:
    """(latest exported delta version, its live file set) — None when no
    _delta_log exists yet."""
    from kafka_connect_expand_json_transform_spark.sources import delta_reader as DR

    try:
        files, _meta, _proto, ver = DR._replay(root, None)
    except FileNotFoundError:
        return None, set()
    return ver, set(files)


def export_delta(root: str) -> int:
    """Export the txlog table's current snapshot as the next Delta
    version beside it; returns the Delta version written (or the current
    one when nothing changed).  Metadata-only: the data files are shared,
    never copied."""
    _entries, tx_version, rel_files, schema_ddl = _txlog_state(root)
    current = _expand_parquet(root, rel_files)
    prev_version, prev_files = _delta_replayed(root)

    adds = sorted(set(current) - prev_files)
    removes = sorted(prev_files - set(current))
    if prev_version is not None and not adds and not removes:
        return prev_version

    struct = T._parse_datatype_string(schema_ddl)
    schema_string = json.dumps(struct.jsonValue())
    now_ms = int(_time.time() * 1000)
    actions = [
        {"commitInfo": {
            "timestamp": now_ms,
            "operation": "WRITE",
            "operationParameters": {"txlogVersion": tx_version},
            "engineInfo": "kafka-connect-expand-json-transform-spark uniform export",
        }}
    ]
    if prev_version is None:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": f"txlog-uniform-{os.path.basename(os.path.abspath(root))}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now_ms,
        }})
    actions.extend(
        {"add": {"path": rel, "partitionValues": {}, "size": current[rel],
                 "modificationTime": now_ms, "dataChange": True}}
        for rel in adds
    )
    actions.extend(
        {"remove": {"path": rel, "deletionTimestamp": now_ms,
                    "dataChange": True}}
        for rel in removes
    )
    version = 0 if prev_version is None else prev_version + 1
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{version:020d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    if os.path.exists(final):
        os.remove(tmp)
        raise TX.TxLogConflict(f"concurrent Delta export at version {version}")
    os.replace(tmp, final)
    return version
