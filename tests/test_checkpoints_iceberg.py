"""StageStore table_format dispatch: the north rule's Iceberg stage tables
(sources/checkpoints.py). This sandbox ships no iceberg-spark-runtime jars,
so what CAN be pinned here is the contract around that absence: identifier
construction, format validation, and — critically — that a missing Iceberg
runtime raises a clear RuntimeError naming the fix instead of silently
downgrading to parquet (the warned-fallback discipline of multimodal/
similarity applied to storage, where a silent downgrade would be worse:
resume would read a different table than the cluster wrote)."""

import pytest

from merge_machine_spark.sources.checkpoints import StageStore


def test_table_format_validated_at_construction():
    with pytest.raises(ValueError, match="unsupported table_format"):
        StageStore("/tmp/x", table_format="delta")


def test_iceberg_identifier_is_catalog_namespace_stage():
    store = StageStore("/tmp/x", run_id="run7", table_format="iceberg", catalog="prod")
    assert store._table("pair_scores") == "prod.run7.pair_scores"


def test_iceberg_write_without_runtime_raises_clear_error(spark, tmp_path):
    store = StageStore(str(tmp_path), run_id="r", table_format="iceberg")
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        store.write(df, "candidate_pairs")
    # and nothing was half-written: the stage must not report complete
    assert not store.exists("candidate_pairs")


def test_parquet_path_unaffected_by_catalog_field(spark, tmp_path):
    store = StageStore(str(tmp_path), run_id="r", catalog="ignored")
    df = spark.range(4).withColumnRenamed("id", "doc_id")
    out = store.write(df, "stage_a")
    assert out.count() == 4
    assert store.exists("stage_a")
    assert store.manifest("stage_a")["rows"] == 4
