"""Mutable keyed tables: Delta when available, parquet emulation otherwise.

Re-expresses the reference's table layer (SURVEY.md §2.1): append sinks
(S4/S5), overwrite (S6), keyed MERGE upsert (S7,
``orders_bronze_to_silver.py:184-195`` et al.), existence probe (S9).

This environment has no delta-spark, so the default backend emulates
the semantics over plain parquet:

- ``merge`` = source-wins upsert: new table = source ∪ (current
  ⟕anti source on keys). Equivalent to Delta's
  ``whenMatchedUpdateAll().whenNotMatchedInsertAll()`` for sources
  that are unique per key (enforced).
- Writes go to a versioned subdirectory; a tiny ``_HEAD`` pointer file
  is atomically replaced (os.replace) to commit. Readers resolve HEAD
  then read one immutable snapshot dir — single-writer
  read-committed, the same commit-pointer idea as Delta's log, minus
  multi-writer coordination.

On a production cluster with delta-spark installed, ``HAVE_DELTA``
routes every operation to the real thing (ACID log, data skipping,
OPTIMIZE); the emulation keeps semantics testable anywhere.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.session import HAVE_DELTA

__all__ = ["ManagedTable"]

_HEAD = "_HEAD"


class ManagedTable:
    """A keyed, mutable table at a filesystem path."""

    #: which commit-protocol implementation this process runs:
    #: "delta" (real Delta protocol via delta-spark) or
    #: "head-pointer-parquet" (the emulation) — recorded so CI output
    #: states which backend the managed-table suite exercised.
    BACKEND = "delta" if HAVE_DELTA else "head-pointer-parquet"

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path.rstrip("/")
        self.keys = list(keys)

    # ------------------------------------------------------------ probes

    def exists(self) -> bool:
        """S9 existence probe (DeltaTable.isDeltaTable analogue)."""
        if HAVE_DELTA:
            from delta.tables import DeltaTable  # type: ignore

            return DeltaTable.isDeltaTable(self.spark, self.path)
        return os.path.exists(os.path.join(self.path, _HEAD))

    # ------------------------------------------------------------- reads

    def _head_dir(self) -> str:
        with open(os.path.join(self.path, _HEAD)) as f:
            return os.path.join(self.path, f.read().strip())

    def versions(self) -> list[str]:
        """Snapshot ids on disk, oldest→newest (≤2 under keep-last-2).

        Version names embed a monotone sequence number, so
        lexicographic order IS commit order — the flat-file analogue of
        Delta's version counter.
        """
        if not os.path.isdir(self.path):
            return []
        return sorted(d for d in os.listdir(self.path) if d.startswith("v-"))

    def read(self, version: str | None = None) -> DataFrame:
        """Read HEAD, or a retained snapshot by id (time travel).

        With delta-spark, ``version`` maps to ``versionAsOf``; the
        emulation resolves the retained snapshot dir (only the previous
        commit survives vacuum — a bounded, Delta-retention-like window).
        """
        if HAVE_DELTA:
            reader = self.spark.read.format("delta")
            if version is not None:
                reader = reader.option("versionAsOf", version)
            return reader.load(self.path)
        if version is None:
            return self.spark.read.parquet(self._head_dir())
        target = os.path.join(self.path, version)
        if not os.path.isdir(target):
            raise ValueError(
                f"version {version!r} not retained; available: {self.versions()}"
            )
        return self.spark.read.parquet(target)

    # ------------------------------------------------------------ writes

    def _next_version(self) -> str:
        """Monotone version id: ``v-{seq:08d}-{nonce}``. The sequence
        number comes from the current HEAD, so commit order is readable
        from the name alone (and `versions()` can just sort)."""
        seq = 0
        if self.exists():
            head = os.path.basename(self._head_dir())
            try:
                seq = int(head.split("-")[1]) + 1
            except (IndexError, ValueError):
                seq = 0
        return f"v-{seq:08d}-{uuid.uuid4().hex[:8]}"

    def _write_version(self, df: DataFrame, partition_by: list[str] | None) -> str:
        """Stage a new snapshot dir (the WRITE half of a commit).

        Runs the Spark action but does NOT move HEAD — readers still see
        the previous snapshot. Callers either :meth:`_activate` the
        returned version or :meth:`_abandon` it (staged two-phase
        publish; what lets DQ gates observed during the write abort
        before anything becomes visible).
        """
        version = self._next_version()
        target = os.path.join(self.path, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        return version

    def _activate(self, version: str) -> None:
        """Atomically swap HEAD to ``version`` (the COMMIT half)."""
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".head-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(version)
        old = self._head_dir() if self.exists() else None
        os.replace(tmp, os.path.join(self.path, _HEAD))  # atomic commit
        # Deferred vacuum (keep-last-2): retain the immediately-previous
        # snapshot so still-lazy DataFrames from an earlier read() (Spark
        # re-resolves files at action time) and readers that grabbed HEAD
        # just before the swap survive this commit; drop older ones.
        keep = {version}
        if old:
            keep.add(os.path.basename(old))
        for d in os.listdir(self.path):
            if d.startswith("v-") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _abandon(self, version: str) -> None:
        """Discard a staged, never-activated snapshot."""
        shutil.rmtree(os.path.join(self.path, version), ignore_errors=True)

    def _commit(self, df: DataFrame, partition_by: list[str] | None) -> None:
        self._activate(self._write_version(df, partition_by))

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """S6 initial/overwrite publish."""
        if HAVE_DELTA:
            w = df.write.format("delta").mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(self.path)
            return
        self._commit(df, partition_by)

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        evolve_schema: bool = False,
    ) -> None:
        """S4/S5 append-only sink (bronze, audit log).

        ``evolve_schema=True`` widens the table to the union of the
        current and incoming columns (new columns backfill NULL for
        existing rows — Delta ``mergeSchema`` semantics); without it a
        column mismatch fails loudly, which is the contract-enforcing
        default for pipeline sinks.
        """
        if HAVE_DELTA:
            w = df.write.format("delta").mode("append")
            if evolve_schema:
                w = w.option("mergeSchema", "true")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(self.path)
            return
        if not self.exists():
            self._commit(df, partition_by)
        else:
            current = self.read()
            self._commit(
                current.unionByName(df, allowMissingColumns=evolve_schema),
                partition_by,
            )

    def merge(
        self,
        source: DataFrame,
        delete_col: str | None = None,
        evolve_schema: bool = False,
    ) -> None:
        """S7 keyed upsert: update-all when matched, insert-all otherwise.

        Requires ``source`` unique per key (the reference guarantees
        this upstream via W1 dedup / snapshot grain; we enforce it —
        a non-unique source makes MERGE nondeterministic).

        ``delete_col`` names a boolean column in ``source`` marking CDC
        tombstones: matched target rows are DELETED instead of updated,
        and unmatched tombstones are ignored. The flag column itself
        never lands in the table.

        ``evolve_schema=True`` lets the source carry columns the table
        doesn't have yet; the table widens and existing rows backfill
        NULL (Delta ``autoMerge`` semantics).
        """
        dup = (
            source.groupBy(*self.keys).count().filter(F.col("count") > 1).limit(1)
        )
        if dup.count() > 0:
            raise ValueError(f"merge source not unique on keys {self.keys}")
        if delete_col is not None:
            upserts = source.filter(~F.col(delete_col)).drop(delete_col)
        else:
            upserts = source
        if not self.exists():
            self.overwrite(upserts)
            return
        if HAVE_DELTA:
            from delta.tables import DeltaTable  # type: ignore

            if evolve_schema:
                self.spark.conf.set(
                    "spark.databricks.delta.schema.autoMerge.enabled", "true"
                )
            cond = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
            tgt = DeltaTable.forPath(self.spark, self.path).alias("t")
            if delete_col is None:
                (
                    tgt.merge(source.alias("s"), cond)
                    .whenMatchedUpdateAll()
                    .whenNotMatchedInsertAll()
                    .execute()
                )
            else:
                data_cols = [c for c in source.columns if c != delete_col]
                sets = {c: f"s.{c}" for c in data_cols}
                (
                    tgt.merge(source.alias("s"), cond)
                    .whenMatchedDelete(condition=f"s.{delete_col} = true")
                    .whenMatchedUpdate(set=sets)
                    .whenNotMatchedInsert(
                        condition=f"s.{delete_col} = false", values=sets
                    )
                    .execute()
                )
            return
        current = self.read()
        # Deletes and upserts alike displace the current row for their
        # key; only upserts come back in.
        kept = current.join(source.select(*self.keys), on=self.keys, how="left_anti")
        if evolve_schema:
            merged = kept.unionByName(upserts, allowMissingColumns=True)
        else:
            extra = set(upserts.columns) - set(current.columns)
            if extra:
                raise ValueError(
                    f"merge source has columns not in table: {sorted(extra)}; "
                    "pass evolve_schema=True to widen the table"
                )
            merged = kept.unionByName(upserts.select(*current.columns))
        self._commit(merged, None)

    def merge_gated(self, source: DataFrame, checks: list[dict]) -> "DQReport":
        """Keyed MERGE with DQ gates observed DURING the publish write.

        The classic gate-then-publish (``run_checks`` + ``merge``) scans
        the source twice; here the row-predicate counts ride the staged
        snapshot write itself (``df.observe`` — executor-side
        accumulation, zero extra jobs) and the HEAD swap happens only if
        every critical check passes. On failure the staged snapshot is
        abandoned: readers never see it, exactly like a failed Delta
        transaction. Raises :class:`ValueError` listing the failures.

        Returns the :class:`DQReport` either way the gates pass.
        """
        from ecom_churn_lakehouse_spark.dq.checks import (
            observe_checks,
            report_from_observation,
            run_checks,
        )

        if HAVE_DELTA:
            # Delta MERGE is its own transaction; observation semantics
            # across the MERGE command aren't guaranteed, so gate first.
            report = run_checks(source, checks)
            if not report.ok:
                raise ValueError(
                    "merge_gated blocked: "
                    f"{[r.name for r in report.blocking_failures]}"
                )
            self.merge(source)
            return report

        dup = source.groupBy(*self.keys).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise ValueError(f"merge source not unique on keys {self.keys}")
        observed, obs = observe_checks(source, checks)
        if self.exists():
            current = self.read()
            kept = current.join(
                source.select(*self.keys), on=self.keys, how="left_anti"
            )
            frame = kept.unionByName(observed.select(*current.columns))
        else:
            frame = observed
        version = self._write_version(frame, None)
        report = report_from_observation(obs, checks)
        if not report.ok:
            self._abandon(version)
            raise ValueError(
                "merge_gated blocked: "
                f"{[r.name for r in report.blocking_failures]}"
            )
        self._activate(version)
        return report

    # ------------------------------------------------------- maintenance

    def compact(
        self,
        target_files: int | None = None,
        sort_by: list[str] | None = None,
        target_file_bytes: int = 128 << 20,
        zorder_by: list[str] | None = None,
    ) -> None:
        """Small-file compaction (Delta OPTIMIZE analogue).

        Streaming/incremental sinks accrete many small files; at scale
        the scan cost becomes file-open-bound, not byte-bound. With
        delta-spark this routes to the real ``OPTIMIZE`` (Z-order when
        ``sort_by`` given). The emulation rewrites the snapshot:

        - ``target_files`` defaults to snapshot-bytes / 128 MiB — the
          file size object stores and parquet readers want;
        - without ``sort_by``: ``coalesce`` (narrow — no shuffle, tasks
          just concatenate input splits);
        - with ``sort_by``: range-partition + sort-within-partitions,
          which clusters the sort keys so parquet row-group min/max
          stats give non-overlapping ranges per file — the flat-file
          form of data skipping (leading column only);
        - with ``zorder_by``: the same, but ordered by a Morton code
          over the given columns (sources/zorder.py), so file stats
          prune on EVERY listed dimension, not just the first.
        """
        if HAVE_DELTA:
            from delta.tables import DeltaTable  # type: ignore

            opt = DeltaTable.forPath(self.spark, self.path).optimize()
            if zorder_by:
                opt.executeZOrderBy(*zorder_by)
            elif sort_by:
                opt.executeZOrderBy(*sort_by)
            else:
                opt.executeCompaction()
            return
        head = self._head_dir()
        if target_files is None:
            total = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(head)
                for f in files
                if f.endswith(".parquet")
            )
            target_files = max(1, math.ceil(total / target_file_bytes))
        df = self.read()
        if zorder_by:
            # True multi-dimensional clustering: range-partition + sort
            # by the Morton code so every file's bounding box is small
            # in EVERY z-ordered dimension (sources/zorder.py) — the
            # flat-parquet analogue of Delta's OPTIMIZE ZORDER BY.
            from ecom_churn_lakehouse_spark.sources.zorder import (
                with_zorder_value,
            )

            zcol = "__zvalue"
            df = (
                with_zorder_value(df, zorder_by, out=zcol)
                .repartitionByRange(target_files, F.col(zcol))
                .sortWithinPartitions(zcol)
                .drop(zcol)
            )
        elif sort_by:
            df = df.repartitionByRange(
                target_files, *[F.col(c) for c in sort_by]
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(target_files)
        # Partition-dir layout is not preserved: a sorted compaction IS
        # the layout. Callers that need dir partitioning re-publish via
        # overwrite(partition_by=...).
        self._commit(df, None)

    def diff_versions(
        self, old: str, new: str | None = None
    ) -> DataFrame:
        """Row-level changes between two snapshots — the change-data-
        feed analogue over time travel: one row per key whose presence
        or payload differs, ``change_type`` ∈ {insert, update, delete}.

        The output is exactly the "delta keys" feed that
        ``pipelines.incremental.incremental_gold_update`` scopes its
        recompute to — derive it from retained snapshots instead of
        having the writer thread it through.

        Scale: both snapshots project to (keys, payload-struct) before
        ONE full-outer join co-partitioned on the table keys; payloads
        compare with a single null-safe struct equality (no per-column
        fan-out). With Delta's CDF enabled this would read the change
        log instead of two snapshots; the plan here is the general
        form. Payload comparison covers the non-key columns the two
        snapshots share — a column added by schema evolution flags
        rows only through the columns both sides have.
        """
        o = self.read(old)
        n = self.read(new)
        common = sorted(
            (set(o.columns) & set(n.columns)) - set(self.keys)
        )
        # keys-only table: presence is the whole payload — a constant
        # stand-in makes every matched pair compare equal (no updates).
        payload = [F.col(c) for c in common] or [F.lit(0).alias("__none")]
        o_side = o.select(
            *self.keys,
            F.struct(*payload).alias("__old"),
            F.lit(True).alias("__in_old"),
        )
        n_side = n.select(
            *self.keys,
            F.struct(*payload).alias("__new"),
            F.lit(True).alias("__in_new"),
        )
        j = o_side.join(n_side, on=self.keys, how="full_outer")
        change = (
            F.when(F.col("__in_old").isNull(), F.lit("insert"))
            .when(F.col("__in_new").isNull(), F.lit("delete"))
            .when(
                ~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update")
            )
        )
        return j.select(*self.keys, change.alias("change_type")).filter(
            F.col("change_type").isNotNull()
        )

    def file_count(self) -> int:
        """Data files in the current snapshot (compaction observability)."""
        if HAVE_DELTA:
            return len(
                self.spark.read.format("delta").load(self.path).inputFiles()
            )
        return len(self.read().inputFiles())
