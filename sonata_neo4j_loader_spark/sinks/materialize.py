"""Stage 6 — materialize node/edge tables with per-partition lineage + resume.

Replaces the reference's destructive Bolt write path (``clear_database`` +
chunked ``UNWIND``/``MERGE`` round-trips — ``circuit/circuit_loader.py:30``,
``:45-48``, ``neo4j_operations.py:323-420``) with an idempotent, resumable
distributed write:

* the output table is **hash-bucketed** into ``part=0..N-1`` Parquet
  partitions (bucket = ``pmod(xxhash64(key_cols), N)``) — deterministic, so
  the same input row always lands in the same partition regardless of
  cluster size or task scheduling;
* each committed partition gets a **lineage manifest row**
  ``(part, input_fingerprint, row_count, wall_ms, stage, run_id)`` stored
  under ``<table>/_manifest``.  The manifest is the commit record: data
  files without a manifest row are invisible to :func:`read_materialized`
  and are simply overwritten on retry — the same visibility rule an Iceberg
  snapshot provides (this sandbox has no Iceberg runtime jar, so
  bucketed-Parquet + manifest is the documented stand-in; swapping the
  physical writer for ``df.writeTo(...).append()`` keeps every other line
  unchanged);
* **resume** = recompute per-partition input fingerprints (one map-side
  combined aggregation) and skip every partition whose manifest row already
  carries the same fingerprint.  A killed job therefore never recomputes or
  rewrites finished partitions, and a *changed input* invalidates exactly
  the partitions it touches.

Scale posture: the fingerprint pass is a single ``groupBy(part)`` hash
aggregation (partial+final, no row explosion); the write is ONE Spark job
covering all pending partitions via dynamic partition overwrite — never a
driver-side loop of per-partition jobs.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PART_COL = "part"
MANIFEST_DIR = "_manifest"

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField(PART_COL, T.IntegerType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("committed_seq", T.LongType(), False),
    ]
)


@dataclass
class MaterializeReport:
    """Count audit ≙ the reference's ``log_entity_count`` decorator
    (neo4j_operations.py:10-57): entities before/after per write."""

    table_path: str
    stage: str
    run_id: str
    partitions_written: list[int]
    partitions_skipped: list[int]
    rows_written: int
    wall_ms: int
    # committed partitions the NEW input no longer populates at all:
    # manifest-tombstoned (row_count 0) so their stale files become
    # invisible to read_materialized — dynamic overwrite alone cannot
    # rewrite a partition it has zero rows for
    partitions_vacated: list[int] = field(default_factory=list)


def _fingerprint_col(df: DataFrame) -> F.Column:
    """Order-independent content hash of a row, stable across parallelism.

    Map columns can't be hashed by xxhash64 directly -> JSON-encode them
    (sorted map keys via to_json are deterministic for our small prop maps).
    Column order is pinned by name so schema-equal frames hash equally.
    """
    cols = []
    for field in sorted(df.schema.fields, key=lambda f: f.name):
        if field.name == PART_COL:
            continue
        c = F.col(field.name)
        if isinstance(field.dataType, T.MapType):
            # map key order is unspecified -> sort entries before hashing
            c = F.to_json(F.map_from_entries(F.array_sort(F.map_entries(c))))
        cols.append(c)
    return F.xxhash64(*cols)


def with_bucket(df: DataFrame, key_cols: list[str], num_buckets: int) -> DataFrame:
    """Deterministic hash bucket on the entity key (≙ the reference's
    uniqueness-constraint key, scripts/load_circuit.py:30-36)."""
    return df.withColumn(
        PART_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)).cast("int"),
    )


def partition_fingerprints(bucketed: DataFrame) -> DataFrame:
    """(part, input_fingerprint, row_count) — one partial+final hash agg.

    SUM of per-row xxhash64 (as decimal(38,0), overflow-free) is
    commutative, so the fingerprint is identical at local[8] and local[32]
    and under any shuffle order.
    """
    return bucketed.groupBy(PART_COL).agg(
        F.sum(_fingerprint_col(bucketed).cast("decimal(38,0)"))
        .cast("string")
        .alias("input_fingerprint"),
        F.count(F.lit(1)).alias("row_count"),
    )


def _manifest_path(table_path: str) -> str:
    return f"{table_path}/{MANIFEST_DIR}"


def read_manifest(spark: SparkSession, table_path: str) -> DataFrame | None:
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(_manifest_path(table_path))
    except Exception:
        return None


def committed_partitions(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Latest manifest row per partition (highest committed_seq wins —
    ≙ Iceberg's current-snapshot view of a partition)."""
    manifest = read_manifest(spark, table_path)
    if manifest is None:
        return None
    latest = manifest.groupBy(PART_COL).agg(F.max("committed_seq").alias("committed_seq"))
    return manifest.join(latest, [PART_COL, "committed_seq"], "inner")


def materialize(
    df: DataFrame,
    table_path: str,
    key_cols: list[str],
    num_buckets: int = 64,
    stage: str = "triples",
    limit_parts: int | None = None,
) -> MaterializeReport:
    """Write ``df`` bucketed by ``key_cols``; skip already-committed partitions.

    ``limit_parts`` is a fault-injection hook for the kill-and-resume test:
    commit at most that many pending partitions, then stop (simulating a
    job killed mid-write).
    """
    spark = df.sparkSession
    run_id = uuid.uuid4().hex[:12]
    t0 = time.monotonic()

    bucketed = with_bucket(df, key_cols, num_buckets)
    fresh = partition_fingerprints(bucketed)

    done = committed_partitions(spark, table_path)
    vacated_ids: list[int] = []
    if done is not None:
        # a partition is done iff its committed fingerprint matches the
        # fingerprint of *today's* input for that partition
        pending = (
            fresh.alias("f")
            .join(
                done.select(PART_COL, "input_fingerprint").alias("d"),
                [PART_COL, "input_fingerprint"],
                "left_anti",
            )
        )
        next_seq = (
            done.agg(F.max("committed_seq")).collect()[0][0] or 0
        ) + 1
        # committed partitions ABSENT from the new input: dynamic
        # overwrite can only replace partitions it has rows for, so an
        # emptied bucket keeps its stale files — tombstone it in the
        # manifest (row_count 0) instead; read_materialized and the audit
        # treat it as invisible, and a later input that repopulates the
        # bucket fingerprint-mismatches the tombstone and rewrites it.
        # row_count > 0 keeps re-runs idempotent (never re-tombstone).
        vacated_ids = sorted(
            r[PART_COL]
            for r in done.where(F.col("row_count") > 0)
            .join(fresh.select(PART_COL), PART_COL, "left_anti")
            .select(PART_COL)
            .collect()
        )
    else:
        pending = fresh
        next_seq = 1

    # pending partition ids: bounded by num_buckets (small), safe to collect
    pending_rows = pending.collect()
    pending_rows.sort(key=lambda r: r[PART_COL])
    if limit_parts is not None:
        pending_rows = pending_rows[:limit_parts]
    pending_ids = [r[PART_COL] for r in pending_rows]
    all_parts = [r[PART_COL] for r in fresh.select(PART_COL).collect()]
    skipped = sorted(set(all_parts) - set(pending_ids))

    rows_written = 0
    if pending_ids:
        to_write = bucketed.where(F.col(PART_COL).isin(pending_ids))
        # ONE job for every pending partition; dynamic overwrite replaces
        # only the partitions present in `to_write` (retry-safe: a partition
        # half-written by a killed run is fully replaced, never appended to)
        (
            to_write.write.option("partitionOverwriteMode", "dynamic")
            .partitionBy(PART_COL)
            .mode("overwrite")
            .parquet(table_path)
        )
        rows_written = sum(r["row_count"] for r in pending_rows)

    wall_ms = int((time.monotonic() - t0) * 1000)
    manifest_rows = [
        (
            int(r[PART_COL]),
            r["input_fingerprint"],
            int(r["row_count"]),
            wall_ms,
            stage,
            run_id,
            next_seq,
        )
        for r in pending_rows
    ] + [
        (int(p), "<vacated>", 0, wall_ms, stage, run_id, next_seq)
        for p in vacated_ids
    ]
    if manifest_rows:
        # the manifest append IS the commit point: written data only becomes
        # visible once its manifest rows land (and a vacated partition's
        # stale files only become INvisible once the tombstone lands)
        spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(_manifest_path(table_path))

    return MaterializeReport(
        table_path=table_path,
        stage=stage,
        run_id=run_id,
        partitions_written=pending_ids,
        partitions_skipped=skipped,
        rows_written=rows_written,
        wall_ms=int((time.monotonic() - t0) * 1000),
        partitions_vacated=vacated_ids,
    )


def visible_parts(spark: SparkSession, table_path: str) -> list[int]:
    """Partition ids a manifest-gated read may see — THE visibility rule.

    Committed partitions whose latest manifest row is not a tombstone
    (a vacated partition, row_count 0, still has stale files on disk —
    visibility is manifest-gated, so it is excluded). Shared by
    :func:`read_materialized` and every external consumer of a
    materialized table (e.g. the prebuilt IVF index), so the rule cannot
    silently diverge between readers.
    """
    done = committed_partitions(spark, table_path)
    if done is None:
        raise FileNotFoundError(f"no manifest at {table_path}")
    return sorted(
        r[PART_COL]
        for r in done.where(F.col("row_count") > 0)
        .select(PART_COL)
        .distinct()
        .collect()
    )


def read_materialized(spark: SparkSession, table_path: str) -> DataFrame:
    """Read only *committed* partitions (manifest-gated visibility).

    The partition filter is `part IN (...)` over the bucket column, which
    Spark prunes at the file-listing level — uncommitted partition dirs are
    never scanned.
    """
    parts = visible_parts(spark, table_path)
    df = spark.read.parquet(table_path)
    return df.where(F.col(PART_COL).isin(parts)).drop(PART_COL)


def verify_against_manifest(spark: SparkSession, table_path: str) -> DataFrame:
    """Audit: recount committed data per partition vs manifest row_count.

    Returns the partitions whose physical row count disagrees with the
    manifest (should always be empty; ≙ the reference's before/after
    count logging, neo4j_operations.py:10-57).
    """
    done = committed_partitions(spark, table_path)
    if done is None:
        raise FileNotFoundError(f"no manifest at {table_path}")
    actual = (
        spark.read.parquet(table_path)
        .groupBy(PART_COL)
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    # tombstoned partitions are not visible, so their (dead) on-disk files
    # are not drift — audit only the partitions a read would return
    return (
        done.where(F.col("row_count") > 0)
        .select(PART_COL, "row_count")
        .join(actual, PART_COL, "left")
        .where(
            F.col("actual_rows").isNull() | (F.col("actual_rows") != F.col("row_count"))
        )
    )
