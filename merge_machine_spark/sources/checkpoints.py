"""Stage checkpoints with per-partition lineage + metrics, and resume.

North rule: every stage checkpoints its table (candidate pairs, pair scores,
match edges, cluster assignments) so the pipeline resumes mid-run, with
per-partition lineage and match-count / score-distribution metrics.

Two storage layers behind one stage/manifest contract:

- ``table_format='parquet'`` (default): directory-per-stage parquet under
  ``root`` — what this sandbox can execute (no Iceberg runtime jars here).
- ``table_format='iceberg'``: stage tables written to a real Iceberg
  catalog via ``df.writeTo(f"{catalog}.{run_id}.{stage}").using("iceberg")``
  — the north rule's table format. Requires the cluster session to carry
  the iceberg-spark-runtime jars and a ``spark.sql.catalog.<catalog>``
  config; without them the write raises a RuntimeError naming exactly
  that (tested), never a silent parquet downgrade. The JSON manifest
  still goes to ``root`` through the Hadoop FS: Iceberg's own snapshot
  metadata tracks data files, while the manifest carries what the
  RESUME contract needs (completion marker, per-partition lineage +
  score metrics) independent of table format.

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
    # Iceberg catalog name (``table_format='iceberg'`` only); the session
    # must configure spark.sql.catalog.<catalog> = an Iceberg catalog impl
    catalog: str = "local"

    def __post_init__(self) -> None:
        if self.table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported table_format {self.table_format!r} (parquet|iceberg)")

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _table(self, stage: str) -> str:
        """Iceberg identifier catalog.namespace.table — run_id is the
        namespace, so one logical run's stage tables list together."""
        return f"{self.catalog}.{self.run_id}.{stage}"

    def _manifest(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_STAGE_MANIFEST.json")

    @staticmethod
    def _spark() -> SparkSession:
        s = SparkSession.getActiveSession()
        if s is None:  # pragma: no cover - sessions exist in every caller
            raise RuntimeError("StageStore needs an active SparkSession")
        return s

    @staticmethod
    def _fs(spark: SparkSession, path_str: str):
        """Hadoop FileSystem for ``path_str`` — manifest I/O must go through
        it, not local open(): checkpoint_dir may be s3://... on a cluster."""
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(spark._jsc.hadoopConfiguration()), path

    def exists(self, stage: str) -> bool:
        spark = self._spark()
        fs, path = self._fs(spark, self._manifest(stage))
        return bool(fs.exists(path))

    def write(self, df: DataFrame, stage: str, score_col: str | None = None, extra: dict | None = None) -> DataFrame:
        """Write stage data, then the manifest (ordering = atomicity); returns
        the re-read DataFrame so downstream lineage starts at the
        checkpoint, not at the original computation."""
        spark = df.sparkSession
        if self.table_format == "iceberg":
            name = self._table(stage)
            try:
                spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.run_id}")
                df.writeTo(name).using("iceberg").createOrReplace()
            except Exception as e:
                # only a missing-runtime failure gets the jar/catalog hint;
                # anything else (S3 flake, quota, AnalysisException from the
                # DataFrame itself) must surface as what it is — blanket
                # misattribution sends operators down a config-debugging
                # path for an unrelated error (code-review r5)
                msg = str(e)
                runtime_missing = any(
                    marker in msg
                    for marker in (
                        "ClassNotFoundException",
                        "NoClassDefFoundError",
                        "Cannot find catalog plugin",
                        "CATALOG_NOT_FOUND",
                        # an unconfigured catalog name falls through to
                        # spark_catalog, which rejects the 2-part namespace
                        # {catalog}.{run_id} with this error class
                        "REQUIRES_SINGLE_PART_NAMESPACE",
                        "is not a valid Spark SQL Data Source",
                        "Failed to find the data source: iceberg",
                        "DATA_SOURCE_NOT_FOUND",
                    )
                )
                if not runtime_missing:
                    raise
                raise RuntimeError(
                    f"Iceberg stage write failed for {name}. This session has no "
                    "usable Iceberg runtime: add the iceberg-spark-runtime jar and "
                    f"a spark.sql.catalog.{self.catalog} catalog config (or use "
                    "table_format='parquet')."
                ) from e
            out = spark.read.table(name)
        else:
            path = os.path.join(self._dir(stage), "data")
            df.write.mode("overwrite").parquet(path)
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
        blob = json.dumps(manifest, indent=1, default=str)
        # single-file JSON written through the Hadoop FS so any scheme the
        # cluster can write (s3a://, hdfs://, file:/) works for resume
        fs, mpath = self._fs(spark, self._manifest(stage))
        stream = fs.create(mpath, True)
        try:
            stream.write(blob.encode("utf-8"))
        finally:
            stream.close()
        return out

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.table_format == "iceberg":
            return spark.read.table(self._table(stage))
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def manifest(self, stage: str) -> dict:
        spark = self._spark()
        fs, mpath = self._fs(spark, self._manifest(stage))
        stream = fs.open(mpath)
        try:
            reader = spark._jvm.java.io.BufferedReader(spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
        finally:
            stream.close()
        return json.loads("\n".join(lines))

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute, score_col: str | None = None, resume: bool = True
    ) -> DataFrame:
        """Resume point: reuse the completed stage table if present,
        else compute -> checkpoint -> return the checkpointed table."""
        if resume and self.exists(stage):
            return self.read(spark, stage)
        return self.write(compute(), stage, score_col=score_col)
