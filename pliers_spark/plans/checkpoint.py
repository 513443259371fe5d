"""Resumable per-partition checkpoints with lineage + metrics.

North-rule requirement: runs are resumable from per-partition
checkpoints carrying lineage (input snapshot id, partition hash, row
counts) and metrics. The reference's seeds are its memoization cache
(``pliers/transformers/base.py:19,47-62`` — results keyed by
hash((transformer, stim))) and the TransformationLog provenance chain
(``pliers/stimuli/base.py:181-238``); here both generalize to a
manifest table.

Design (size-oblivious, idempotent):

- work is partitioned by a **deterministic partition key** (e.g.
  ``pmod(xxhash64(url), num_buckets)``) so the same rows land in the
  same logical partition across runs;
- each completed partition writes its output to
  ``<out>/part=<k>/`` (overwrite-by-partition = idempotent) and then
  appends a manifest row ``(stage_id, partition_key, input_snapshot_id,
  partition_hash, row_count, wall_ms, status)`` — output first,
  manifest last, so a crash mid-partition re-runs that partition;
- on resume, completed partition keys are read from the manifest and
  **anti-joined away** from the input before any compute;
- lineage columns ride on the manifest, not the data (no per-row cost).

The driver-side loop below iterates partition *groups* (buckets), not
rows; each group is one Spark job over a filtered slice, so a kill
between groups loses at most one group's work. At cluster scale the
same manifest protocol works with per-task commits via
``foreachPartition``; the bucket-loop form is chosen because it is
restart-safe under any failure mode (including driver loss) without a
custom commit protocol.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pliers_spark.operators.census import census_collect

MANIFEST_SCHEMA = (
    "stage_id string, partition_key int, input_snapshot_id string, "
    "partition_hash long, row_count long, wall_ms long, status string, run_id string"
)


@dataclass
class CheckpointedRun:
    stage_id: str
    out_dir: str
    num_buckets: int = 16

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "_manifest")

    def completed_keys(self, spark: SparkSession) -> set[int]:
        if not os.path.exists(self.manifest_dir):
            return set()
        m = spark.read.parquet(self.manifest_dir)
        rows = census_collect(
            m.where((F.col("stage_id") == self.stage_id) & (F.col("status") == "done"))
            .select("partition_key")
            .distinct(),
            self.num_buckets, "checkpoint manifest keys (bucket grain)",
        )
        return {r.partition_key for r in rows}

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        transform,
        bucket_expr,
        input_snapshot_id: str = "",
        fail_after: int | None = None,
    ) -> int:
        """Execute ``transform`` bucket-by-bucket with checkpointing.

        ``bucket_expr`` is a Column mapping each row to [0, num_buckets);
        ``transform(df_slice) -> DataFrame`` is the feature stage.
        ``fail_after`` (tests only) raises after K buckets to simulate a
        crash. Returns the number of buckets executed this run.
        """
        run_id = uuid.uuid4().hex[:12]
        done = self.completed_keys(spark)
        bucketed = df.withColumn("_bucket", bucket_expr)
        executed = 0
        for k in range(self.num_buckets):
            if k in done:
                continue
            if fail_after is not None and executed >= fail_after:
                raise RuntimeError(f"simulated failure after {executed} partitions")
            t0 = time.time()
            part = bucketed.where(F.col("_bucket") == k).drop("_bucket")
            out = transform(part)
            part_dir = os.path.join(self.out_dir, f"part={k}")
            out.write.mode("overwrite").parquet(part_dir)
            n = spark.read.parquet(part_dir).count()
            row_hash = F.xxhash64(*[F.col(c).cast("string") for c in out.columns])
            phash = (
                out.select(row_hash.alias("_h"))
                .agg(F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).alias("h"))
                .first()["h"]
            )
            manifest_row = [
                (self.stage_id, k, input_snapshot_id, int(phash), int(n),
                 int((time.time() - t0) * 1000), "done", run_id)
            ]
            spark.createDataFrame(manifest_row, MANIFEST_SCHEMA).write.mode("append").parquet(
                self.manifest_dir
            )
            executed += 1
        return executed

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "part=*"))

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage + metrics (row counts, wall time, hashes)."""
        return spark.read.parquet(self.manifest_dir).where(F.col("stage_id") == self.stage_id)
