"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set cluster-side via spark-submit:
AQE on (runtime re-plan + skew-join backstop), Arrow on (all scoring UDFs are
pandas/Arrow vectorized — no per-row Python anywhere), shuffle partitions
sized to cores rather than the 200 default, nested-schema pruning on so a
projection of ``spans.text`` never reads ``spans.media_ref`` bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "merge_machine_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` accepts an int (-> local[N]) or a full master string. On a real
    cluster this function is bypassed entirely — ``spark-submit`` provides the
    session and only ``configure()`` below is applied.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark://", "yarn")) else f"local[{cores}]"
    n_cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(str(cores).replace("local[", "").rstrip("]"))
        except ValueError:
            shuffle_partitions = n_cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §3.1/§9 (r6): allow shuffled-hash join instead of sort-merge
        # when a side fits a per-partition hash map — broadcast still wins
        # when a side is under autoBroadcastJoinThreshold, and genuinely
        # huge joins stay SMJ (spill-safe). The AQE threshold converts
        # planned SMJs at runtime from MEASURED partition sizes, so the
        # choice is scale-adaptive rather than stats-guessed; 256m per
        # partition is safe in this 48g-driver local mode and a reasonable
        # executor default (document/override for small-memory executors).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP", "256m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
