"""Iceberg-or-parquet table abstraction (SURVEY.md §7 step 1).

The engine targets Iceberg tables (north rule); this sandbox has no
Iceberg runtime jar, so the interface detects Iceberg support at
runtime and otherwise provides a parquet surrogate with the same
contract:

- ``load(spark, ref)`` — ``ref`` is an Iceberg table name (contains no
  '/') or a parquet path;
- ``save(df, ref)`` — writeTo(...).createOrReplace() on Iceberg, else
  parquet overwrite;
- ``snapshot_id(spark, ref)`` — Iceberg: the current snapshot id (the
  resume/lineage key, monotone per commit); parquet surrogate: a
  deterministic content fingerprint over (path, size, mtime) of the
  data files — any rewrite changes it, so a resume ledger keyed by it
  can never mix state across corpus versions;
- ``commit_snapshot`` / ``snapshots`` / ``load_snapshot`` — a manifest
  log under ``<table>/_snapshots`` (underscore-prefixed: invisible to
  Spark's file index) recording each snapshot id's exact data-file
  list, so any pinned snapshot can be re-read AS OF its commit even
  after later appends — Iceberg time travel on the parquet surrogate.
  Manifest files are named by the snapshot id, so committing the same
  state twice is a no-op (idempotent, like the resume ledger).
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str) -> bool:
    """Iceberg table name vs filesystem path (job.py dispatch rule)."""
    return not ref.endswith(".parquet") and "/" not in ref


def has_iceberg(spark: SparkSession) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in ext
    except Exception:
        return False


def load(spark: SparkSession, ref: str) -> DataFrame:
    if is_table_ref(ref):
        return spark.table(ref)
    return spark.read.parquet(ref)


def save(df: DataFrame, ref: str) -> None:
    if is_table_ref(ref):
        df.writeTo(ref).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(ref)


def snapshot_id(spark: SparkSession, ref: str) -> str:
    """The lineage key a run is pinned to (engine.Ledger, job.py)."""
    if is_table_ref(ref) and has_iceberg(spark):
        row = spark.sql(
            f"SELECT snapshot_id FROM {ref}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row["snapshot_id"]) if row else "empty"
    if is_table_ref(ref):
        # No snapshot metadata: derive a content fingerprint from the
        # table's data files so two versions of the same table can never
        # share a resume-ledger key (a constant 'table:<ref>' key would
        # let --resume mix state across corpus versions).
        try:
            files = sorted(spark.table(ref).inputFiles())
            # file size + mtime from the FileSystem status: content-
            # sensitive (an in-place rewrite reusing the same file names
            # changes both) and metadata-only — no count() job per call
            jvm = spark.sparkContext._jvm
            hconf = spark.sparkContext._jsc.hadoopConfiguration()
            h = hashlib.sha256()
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                st = p.getFileSystem(hconf).getFileStatus(p)
                h.update(
                    f"{f}\x1f{st.getLen()}\x1f{st.getModificationTime()}\n".encode()
                )
            return "tablefp:" + h.hexdigest()[:16]
        except Exception:
            raise ValueError(
                f"cannot derive a snapshot/fingerprint for table {ref!r}; "
                "refusing a resume key that could mix corpus versions"
            )
    h = hashlib.sha256()
    base = Path(ref)
    files = sorted(base.rglob("*.parquet")) if base.is_dir() else [base]
    for f in files:
        st = f.stat()
        h.update(f"{f}\x1f{st.st_size}\x1f{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


# ------------------------------------------------------- snapshot manifests


def _table_files(ref: str) -> list[str]:
    base = Path(ref)
    files = sorted(base.rglob("*.parquet")) if base.is_dir() else [base]
    return [str(f) for f in files]


def _manifest_dir(ref: str) -> Path:
    """Manifests live under ``<table>/_snapshots`` for a directory table;
    a single-file table keeps them beside it, namespaced by file name
    (``<parent>/_snapshots/<name>``) so co-located tables never mix."""
    base = Path(ref)
    if base.is_dir():
        return base / "_snapshots"
    return base.parent / "_snapshots" / base.name


def commit_snapshot(spark: SparkSession, ref: str) -> str:
    """Record the table's current data files as a snapshot manifest and
    return the snapshot id.  Parquet surrogate only — on a real Iceberg
    table the catalog's own snapshot log is authoritative and this is a
    pass-through to :func:`snapshot_id`.

    Idempotent: the manifest file is named by the content fingerprint,
    so re-committing an unchanged table rewrites the same manifest with
    the same content."""
    if is_table_ref(ref):
        return snapshot_id(spark, ref)
    sid = snapshot_id(spark, ref)
    mdir = _manifest_dir(ref)
    mdir.mkdir(parents=True, exist_ok=True)
    path = mdir / f"{sid}.json"
    if not path.exists():
        path.write_text(
            json.dumps(
                {
                    "snapshot_id": sid,
                    "committed_at": time.time(),
                    "files": _table_files(ref),
                }
            )
        )
    return sid


def snapshots(ref: str) -> list[dict]:
    """All recorded snapshot manifests for a parquet table, oldest
    first."""
    mdir = _manifest_dir(ref)
    if not mdir.is_dir():
        return []
    recs = [json.loads(p.read_text()) for p in mdir.glob("*.json")]
    return sorted(recs, key=lambda r: r["committed_at"])


def load_snapshot(spark: SparkSession, ref: str, sid: str) -> DataFrame:
    """Read a parquet table AS OF a committed snapshot: exactly the
    manifest's file list, regardless of files appended since.  Fails
    fast if a manifest file has been deleted (the same contract as
    Iceberg time travel after a vacuum)."""
    path = _manifest_dir(ref) / f"{sid}.json"
    if not path.exists():
        known = [r["snapshot_id"] for r in snapshots(ref)]
        raise ValueError(f"no snapshot manifest {sid!r} for {ref!r}; known: {known}")
    rec = json.loads(path.read_text())
    missing = [f for f in rec["files"] if not Path(f).exists()]
    if missing:
        raise ValueError(
            f"snapshot {sid} references {len(missing)} deleted data file(s), "
            f"e.g. {missing[0]}"
        )
    return spark.read.parquet(*rec["files"])
