"""Versioned parquet table store — the engine's mutable-table substrate.

The reference's target engine (ClickHouse MergeTree) supports DROP /
TRUNCATE / DELETE WHERE / ALTER UPDATE. Spark's parquet tables are
immutable, and Delta/Iceberg jars are not in this image, so the store
implements the minimal transactional surface the five load operations
need with *versioned directory swap*:

    <root>/<schema>/<table>/v<N>/part-*.parquet
    <root>/<schema>/<table>/_current        (atomic pointer file)

Every mutation writes a NEW version directory and then atomically
renames the pointer — readers never observe a half-written table, and
a failed write leaves the previous version live. This is the same
snapshot-pointer idea Delta/Iceberg use, scaled down; at 100 TB the
per-version data is still written fully parallel by executors, and the
only driver-side work is the pointer swap. Old versions are pruned
keeping the last ``keep_versions``.

Reference operations mapped here:
- drop/create (``clickhouse/jdbsChSession.scala:238-263``) → new v0
- truncate (``:693-700``) → empty version
- delete where (``:222-236``) → filtered rewrite into a new version
- ALTER UPDATE via dict (``:61-91``) → join-merge rewrite (operators/)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableNotFound(KeyError):
    pass


class TableStore:
    def __init__(self, spark: SparkSession, root: str, keep_versions: int = 2):
        self.spark = spark
        self.root = root
        self.keep_versions = keep_versions
        os.makedirs(root, exist_ok=True)

    # ---- paths -----------------------------------------------------
    def _tdir(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema, table)

    def _pointer(self, schema: str, table: str) -> str:
        return os.path.join(self._tdir(schema, table), "_current")

    def current_version_dir(self, schema: str, table: str) -> str:
        ptr = self._pointer(schema, table)
        if not os.path.exists(ptr):
            raise TableNotFound(f"{schema}.{table}")
        with open(ptr) as f:
            meta = json.load(f)
        return os.path.join(self._tdir(schema, table), meta["version"])

    # ---- catalog ---------------------------------------------------
    def create_database(self, schema: str) -> None:
        """CREATE DATABASE IF NOT EXISTS (jdbsChSession.scala:677-691)."""
        os.makedirs(os.path.join(self.root, schema), exist_ok=True)

    def table_exists(self, schema: str, table: str) -> bool:
        """system.tables probe (jdbsChSession.scala:39-59)."""
        return os.path.exists(self._pointer(schema, table))

    def list_tables(self, schema: str) -> list[str]:
        sdir = os.path.join(self.root, schema)
        if not os.path.isdir(sdir):
            return []
        return sorted(
            t for t in os.listdir(sdir) if os.path.exists(self._pointer(schema, t))
        )

    def columns(self, schema: str, table: str) -> list[str]:
        """system.columns probe (jdbsChSession.scala:466-485)."""
        return self.read(schema, table).schema.fieldNames()

    def row_count(self, schema: str, table: str) -> int:
        """Row-count probe (jdbsChSession.scala:206-220, 299-308)."""
        return self.read(schema, table).count()

    # ---- read ------------------------------------------------------
    def read(self, schema: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.current_version_dir(schema, table))

    # ---- write (atomic version swap) -------------------------------
    def write(
        self,
        schema: str,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
    ) -> str:
        """Materialize ``df`` as the next version and swap the pointer
        atomically. Returns the new version directory.

        ``partition_by`` writes hive-style partition directories —
        at scale this is what makes O2's ranged delete+insert a
        partition-pruned rewrite instead of a full-table one, and
        gives readers partition pruning for free."""
        tdir = self._tdir(schema, table)
        os.makedirs(tdir, exist_ok=True)
        version = f"v{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}"
        vdir = os.path.join(tdir, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        tmp = self._pointer(schema, table) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"version": version, "ts": time.time()}, f)
        os.replace(tmp, self._pointer(schema, table))  # atomic
        self._prune(schema, table, keep=version)
        return vdir

    def append(self, schema: str, table: str, df: DataFrame) -> str:
        """Append = union with the current snapshot into a new version.

        Note for scale: this rewrites the table. A production deploy
        would use Delta/Iceberg appends (pure file adds); the
        versioned rewrite keeps exactly the same operator semantics
        and swaps in transparently.
        """
        if self.table_exists(schema, table):
            cur = self.read(schema, table)
            df = cur.unionByName(df)
        return self.write(schema, table, df)

    def truncate(self, schema: str, table: str) -> None:
        """truncate table (jdbsChSession.scala:693-700)."""
        cur = self.read(schema, table)
        self.write(schema, table, cur.limit(0))

    def drop(self, schema: str, table: str) -> None:
        """drop table if exists (jdbsChSession.scala:238-263)."""
        tdir = self._tdir(schema, table)
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)

    def compact(self, schema: str, table: str, target_partitions: int | None = None) -> str:
        """``OPTIMIZE TABLE … FINAL`` analogue
        (jdbsChSession.scala:387-398): rewrite the current snapshot
        into fewer, larger files (coalesce — no shuffle). Sizing rule
        of thumb at scale: total_bytes / 128 MiB."""
        df = self.read(schema, table)
        n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
        return self.write(schema, table, df.coalesce(n))

    def _prune(self, schema: str, table: str, keep: str) -> None:
        tdir = self._tdir(schema, table)
        versions = sorted(
            d for d in os.listdir(tdir) if d.startswith("v") and d != keep
        )
        for d in versions[: max(0, len(versions) - (self.keep_versions - 1))]:
            shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
