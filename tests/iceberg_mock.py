"""Mocked Iceberg catalog: executes TableIO's iceberg write/read/publish
paths without the iceberg-spark runtime jars (which are not baked into this
container, and the sandbox has no network to fetch them — the documented
hard blocker).

The fake implements honest DataFrameWriterV2 semantics at the level the
seam depends on:

  * ``createOrReplace`` — wipe + write, snapshot committed
  * ``create`` — fails if the table exists
  * ``append`` — fails if the table does NOT exist (exercises TableIO's
    append→create fallback)
  * ``overwritePartitions`` — dynamic partition overwrite: replaces exactly
    the partitions PRESENT in the written frame, keyed by the table's
    declared partition transform
  * ``partitionedBy(bucket(n, col))`` — a real hash-of-col partitioning
    (crc32 % n as the murmur stand-in) that is deliberately DIFFERENT from
    any precomputed engine column, so misuse of dynamic overwrite across
    non-transform-aligned write groups loses rows in the mock exactly as it
    would on real Iceberg

Tables materialize as parquet under a per-catalog temp root; a snapshot
log records every commit (the time-travel bookkeeping publish() relies
on)."""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import functions as F


class FakeIcebergCatalog:
    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        # ident -> {"transforms": [...], "snapshots": [int]}
        self.tables: dict[str, dict] = {}

    def path(self, ident: str) -> str:
        return os.path.join(self.root, ident.replace(".", "__"))

    def exists(self, ident: str) -> bool:
        return ident in self.tables

    def read(self, ident: str, snapshot_id=None):
        if ident not in self.tables:
            raise ValueError(f"mock iceberg: no such table {ident}")
        path = self.path(ident)
        if snapshot_id is not None:
            sid = int(snapshot_id)
            if sid not in self.tables[ident]["snapshots"]:
                raise ValueError(
                    f"mock iceberg: no snapshot {sid} on {ident}"
                )
            path = f"{path}@{sid}"
        df = self.spark.read.parquet(path)
        if "_ice_pid" in df.columns:  # hash-transform partition column
            df = df.drop("_ice_pid")
        return df

    def snapshots(self, ident: str) -> list[int]:
        return list(self.tables.get(ident, {}).get("snapshots", []))


class FakeWriterV2:
    """The subset of DataFrameWriterV2 TableIO drives."""

    def __init__(self, catalog: FakeIcebergCatalog, df, ident: str):
        self.catalog = catalog
        self.df = df
        self.ident = ident
        self.transforms: list[str] = []

    def partitionedBy(self, *cols):
        self.transforms = [str(c._jc.toString()) for c in cols]
        return self

    # -- transform machinery -------------------------------------------------
    def _apply_transforms(self, df, transforms):
        """Returns (df_with_partition_cols, physical_partition_cols)."""
        pcols = []
        for t in transforms:
            m = re.match(r"bucket\((\d+),\s*(\w+)\)", t)
            if m:
                n, col = int(m.group(1)), m.group(2)
                # stand-in hash: crc32 over a salted key — deterministic
                # but intentionally DIFFERENT from the engine's plain
                # crc32(term) bucket column, like iceberg's murmur is
                df = df.withColumn(
                    "_ice_pid",
                    (
                        F.crc32(
                            F.concat(F.lit("ice#"), F.col(col).cast("string"))
                        )
                        % n
                    ).cast("int"),
                )
                pcols.append("_ice_pid")
            else:
                pcols.append(re.sub(r"^.*?(\w+)$", r"\1", t))
        return df, pcols

    def _write(self, path, transforms, mode="overwrite"):
        df, pcols = self._apply_transforms(self.df, transforms)
        w = df.write.mode(mode)
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(path)

    def _commit(self, transforms):
        meta = self.catalog.tables.setdefault(
            self.ident, {"transforms": transforms, "snapshots": []}
        )
        meta["snapshots"].append(len(meta["snapshots"]) + 1)

    def _materialize_snapshot(self):
        """Freeze the table's current data under its newest snapshot id so
        pinned reads (snapshot-id option) see exactly that commit's state
        — the mock's stand-in for Iceberg's immutable snapshot files."""
        meta = self.catalog.tables[self.ident]
        sid = meta["snapshots"][-1]
        path = self.catalog.path(self.ident)
        snap = f"{path}@{sid}"
        shutil.rmtree(snap, ignore_errors=True)
        shutil.copytree(path, snap)

    # -- commit operations ---------------------------------------------------
    def createOrReplace(self):
        path = self.catalog.path(self.ident)
        shutil.rmtree(path, ignore_errors=True)
        self._write(path, self.transforms)
        prev = self.catalog.tables.pop(self.ident, None)
        self._commit(self.transforms)
        if prev:  # REPLACE retains table history
            self.catalog.tables[self.ident]["snapshots"] = prev["snapshots"] + [
                len(prev["snapshots"]) + 1
            ]
        self._materialize_snapshot()

    def create(self):
        if self.catalog.exists(self.ident):
            raise ValueError(f"mock iceberg: table exists {self.ident}")
        self.createOrReplace()

    def append(self):
        if not self.catalog.exists(self.ident):
            raise ValueError(f"mock iceberg: no such table {self.ident}")
        self._write(
            self.catalog.path(self.ident),
            self.catalog.tables[self.ident]["transforms"],
            mode="append",
        )
        self._commit(self.catalog.tables[self.ident]["transforms"])
        self._materialize_snapshot()

    def overwritePartitions(self):
        """Replace exactly the partitions present in self.df, under the
        TABLE's declared transform (as real Iceberg does)."""
        meta = self.catalog.tables[self.ident]
        transforms = meta["transforms"]
        path = self.catalog.path(self.ident)
        df, pcols = self._apply_transforms(self.df, transforms)
        if not pcols:
            # unpartitioned table: dynamic overwrite degenerates to full
            shutil.rmtree(path, ignore_errors=True)
            self._write(path, transforms)
            self._commit(transforms)
            self._materialize_snapshot()
            return
        touched = [
            tuple(r) for r in df.select(*pcols).distinct().collect()
        ]
        for vals in touched:
            sub = os.path.join(
                path, *(f"{c}={v}" for c, v in zip(pcols, vals))
            )
            shutil.rmtree(sub, ignore_errors=True)
        w = df.write.mode("append").partitionBy(*pcols)
        w.parquet(path)
        self._commit(transforms)
        self._materialize_snapshot()


def install_mock_iceberg(monkeypatch, spark, root: str) -> FakeIcebergCatalog:
    """Route TableIO's iceberg code paths through the fake catalog:
    DataFrame.writeTo, DataFrameReader.table, Catalog.tableExists, and
    the jar probe."""
    from deusu_spark import tableio

    cat = FakeIcebergCatalog(spark, root)
    monkeypatch.setattr(tableio, "iceberg_available", lambda s: True)
    # patch the CONCRETE DataFrame class (pyspark 4 splits the abstract
    # pyspark.sql.DataFrame from the classic implementation)
    monkeypatch.setattr(
        type(spark.range(0)),
        "writeTo",
        lambda df, ident: FakeWriterV2(cat, df, ident),
    )
    real_option = type(spark.read).option

    def _option(rdr, key, value):
        # record python-side (snapshot-id pinning) AND pass through, so
        # unrelated readers using .option in the same test are unaffected
        opts = dict(getattr(rdr, "_mock_opts", {}) or {})
        opts[key] = value
        result = real_option(rdr, key, value)
        result._mock_opts = opts
        return result

    monkeypatch.setattr(type(spark.read), "option", _option)
    monkeypatch.setattr(
        type(spark.read),
        "table",
        lambda rdr, ident: cat.read(
            ident, getattr(rdr, "_mock_opts", {}).get("snapshot-id")
        ),
    )
    monkeypatch.setattr(
        type(spark.catalog), "tableExists", lambda c, ident: cat.exists(ident)
    )
    return cat
