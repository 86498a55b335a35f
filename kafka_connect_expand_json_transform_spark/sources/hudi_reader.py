"""Pure-Python Apache Hudi COPY-ON-WRITE reader — the third open
lakehouse format, completing the interop trio with ``delta_reader`` and
``iceberg_reader`` (hudi.apache.org docs: timeline + file-group layout,
all public).

Hudi's model: data lives in FILE GROUPS (a stable ``fileId``); every
commit that touches a group writes a new FILE SLICE (a full base-file
rewrite under copy-on-write).  The timeline under ``.hoodie/`` records
completed commits as ``<instant>.commit`` JSON whose
``partitionToWriteStats`` lists the files each commit wrote.  A snapshot
at instant T is: for every file group, the newest slice written at an
instant <= T.

* ``read_hudi(spark, path, as_of_instant=None)`` — latest snapshot or
  time travel by instant (instants are ``yyyyMMddHHmmssSSS`` strings and
  order lexically); Hudi meta columns (``_hoodie_*``) are dropped by
  default (``keep_meta=True`` keeps them);
* ``hudi_timeline(path)`` — completed commits, newest first;
* ``replacecommit`` instants (clustering / insert_overwrite) are APPLIED:
  their ``partitionToReplaceFileIds`` kill all OLDER slices of the
  replaced file groups while the replacecommit's own new files stay
  visible — the timeline semantics hudi.apache.org documents; time
  travel to an instant before the replacement still sees the replaced
  groups.

Fail-closed (the same rule the Delta/Iceberg readers apply):
MERGE_ON_READ tables (unmerged ``.log`` deltas in Hudi's binary
HoodieLogFormat would be silently missing; parsing that format is out of
scope for this reader) raise instead of mis-reading.

Scale: the timeline is O(commits) small JSON files; only the live
file-slice LIST reaches the planner — the bound every Hudi client's file
index pays — and the data is one parquet scan.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_COMMIT_RE = re.compile(r"^(\d+)\.(commit|replacecommit)$")


class HudiUnsupported(RuntimeError):
    """The table requires reader capabilities this implementation lacks."""


def _hoodie_dir(path: str) -> str:
    return os.path.join(path, ".hoodie")


def _properties(path: str) -> dict:
    p = os.path.join(_hoodie_dir(path), "hoodie.properties")
    if not os.path.exists(p):
        raise FileNotFoundError(f"no Hudi table at {path} (missing {p})")
    props = {}
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def hudi_timeline(path: str) -> list[dict]:
    """Completed commit + replacecommit instants, newest first (the
    time-travel index).  Each entry carries ``kind`` ('commit' or
    'replacecommit')."""
    d = _hoodie_dir(path)
    out = []
    for name in os.listdir(d):
        m = _COMMIT_RE.match(name)
        if m:
            out.append({"instant": m.group(1), "kind": m.group(2),
                        "path": os.path.join(d, name)})
    return sorted(out, key=lambda c: c["instant"], reverse=True)


def _load_instant(path: str) -> dict:
    """Parse a completed instant's JSON; a zero-length file is an
    in-flight/incomplete instant — its writes are not committed, so it
    contributes nothing."""
    if os.path.getsize(path) == 0:
        return {}
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _replaced_ids(meta: dict) -> set[str]:
    out: set[str] = set()
    for ids in (meta.get("partitionToReplaceFileIds") or {}).values():
        out.update(ids)
    return out


def _live_slices(path: str, as_of_instant: str | None) -> list[str]:
    commits = hudi_timeline(path)  # newest first
    if as_of_instant is not None:
        eligible = [c for c in commits if c["instant"] <= str(as_of_instant)]
        if not eligible:
            raise ValueError(
                f"instant {as_of_instant} predates the first commit"
            )
        commits = eligible
    latest: dict[str, tuple[str, str]] = {}  # fileId -> (instant, rel path)
    replaced: set[str] = set()
    for c in commits:  # newest first: first writer of a fileId wins
        meta = _load_instant(c["path"])
        for stats in (meta.get("partitionToWriteStats") or {}).values():
            for st in stats:
                fid = st["fileId"]
                if fid not in latest and fid not in replaced:
                    latest[fid] = (c["instant"], st["path"])
        # AFTER this instant's own writes: a replacecommit kills all OLDER
        # slices of the replaced groups (clustering/insert_overwrite), so
        # the suppression applies only to commits we have not walked yet
        replaced.update(_replaced_ids(meta))
    return sorted(os.path.join(path, rel) for _, rel in latest.values())


def read_hudi_incremental(
    spark: SparkSession,
    path: str,
    begin_instant: str,
    end_instant: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Hudi's INCREMENTAL query mode without the bundle (the public
    ``hoodie.datasource.query.type=incremental`` semantics): rows WRITTEN
    by commits in ``(begin_instant, end_instant]``.  CoW slices contain
    carried rows beside the new ones, so the slice read is filtered on
    ``_hoodie_commit_time`` — exactly what the native incremental relation
    does.  Reads only the file groups the range's commits touched."""
    from pyspark.sql import functions as F

    commits = hudi_timeline(path)  # newest first
    end = end_instant or (commits[0]["instant"] if commits else "")
    in_range = [c for c in commits
                if str(begin_instant) < c["instant"] <= str(end)]
    touched: set[str] = set()
    for c in in_range:
        meta = _load_instant(c["path"])
        for stats in (meta.get("partitionToWriteStats") or {}).values():
            touched.update(st["fileId"] for st in stats)
    if not touched:
        raise ValueError(
            f"no commits in ({begin_instant}, {end}] touched any file group"
        )
    # newest slice per touched file group, as of the range end (same
    # replacement suppression as the snapshot walk)
    latest: dict[str, str] = {}
    replaced: set[str] = set()
    for c in [c for c in commits if c["instant"] <= str(end)]:
        meta = _load_instant(c["path"])
        for stats in (meta.get("partitionToWriteStats") or {}).values():
            for st in stats:
                fid = st["fileId"]
                if fid in touched and fid not in latest and fid not in replaced:
                    latest[fid] = st["path"]
        replaced.update(_replaced_ids(meta))
    df = spark.read.parquet(
        *sorted(os.path.join(path, rel) for rel in latest.values())
    ).where(
        (F.col("_hoodie_commit_time") > str(begin_instant))
        & (F.col("_hoodie_commit_time") <= str(end))
    )
    if not keep_meta:
        df = df.drop(*[c for c in df.columns if c.startswith("_hoodie_")])
    return df


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of_instant: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Snapshot (or time-travel) read of a Hudi COPY_ON_WRITE table
    without the hudi-spark bundle: timeline walk -> newest file slice per
    file group -> one parquet scan.  ``_hoodie_*`` meta columns are
    dropped unless ``keep_meta``."""
    props = _properties(path)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise HudiUnsupported(
            f"table type {ttype} not supported: MERGE_ON_READ snapshots "
            "need unmerged .log deltas applied — use a Hudi-native reader "
            "or compact the table first"
        )
    files = _live_slices(path, as_of_instant)
    if not files:
        raise ValueError(f"no completed commits in {path}")
    df = spark.read.parquet(*files)
    if not keep_meta:
        df = df.drop(*[c for c in df.columns if c.startswith("_hoodie_")])
    return df
