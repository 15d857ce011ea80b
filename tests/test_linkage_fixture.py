"""Reference-shape linkage flow (FIXTURES.md §4 + es_linker lifecycle):
dirty source x clean ref, auto-label on the hidden uai key, calibrate the
tier thresholds (L5), run the cascade link, measure accuracy against the
generator's ground truth."""

import pytest
from pyspark.sql import functions as F

from merge_machine_spark.plans.calibration import auto_label, calibrate_link_tiers, export_params, load_params
from merge_machine_spark.plans.pipeline import link
from merge_machine_spark.sources.synth import generate_linkage_fixture

TIERS = [
    {
        "proj_a": "school_names", "proj_b": "full_name", "channel": "french_estab",
        "weights": {"tfidf_cosine": 0.5, "jaro_winkler": 0.25, "token_jaccard": 0.25},
        "max_df": 128, "threshold": 0.5,
    },
    {
        "proj_a": "commune", "proj_b": "localite", "channel": "french",
        "weights": {"tfidf_cosine": 0.6, "jaro_winkler": 0.4},
        "max_df": 128, "threshold": 0.5,
    },
]


@pytest.fixture(scope="module")
def fixture(spark):
    src, ref = generate_linkage_fixture(spark, n_ref=620, n_src=300, seed=42)
    return src.cache(), ref.cache()


def test_auto_label_and_calibrated_link(spark, fixture):
    src, ref = fixture
    labels = auto_label(src, ref, "uai", "numero_uai").cache()
    n_labels = labels.count()
    assert n_labels > 100  # uai coverage ~60% of 300
    # labelled pairs agree with the generator's ground truth
    chk = labels.join(src.select(F.col("doc_id").alias("doc_id_a"), "ref_id"), "doc_id_a")
    bad = chk.filter(F.col("doc_id_b") != F.col("ref_id")).count()
    assert bad == 0

    cal = calibrate_link_tiers(spark, src.drop("ref_id"), ref, TIERS, labels)
    assert all(0 < t["threshold"] < 10 for t in cal), [t["threshold"] for t in cal]
    assert cal[0]["expected_precision"] >= 0.9

    out = link(spark, src.drop("ref_id"), ref, cal,
               exact_pairs=labels.select(F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b"))).cache()
    assert out.count() == src.count()
    # accuracy over matched rows vs generator truth
    j = out.filter(F.col("__IS_MATCH")).join(src.select("doc_id", "ref_id"), "doc_id")
    n_match = j.count()
    acc = j.agg(F.avg((F.col("__ID_REF") == F.col("ref_id")).cast("double"))).collect()[0][0]
    assert n_match >= 250  # most rows link (exact pairs + calibrated tiers)
    assert acc >= 0.95, f"link accuracy {acc} over {n_match} matches"


def test_params_roundtrip_runs_link(spark, fixture):
    """Learned params survive the JSON export/import cycle (L14) in the
    tier-config shape."""
    src, ref = fixture
    blob = export_params([], exact_pairs=[("s000000001", "r000000001")])
    _, cfg = load_params(blob)
    assert cfg["exact_pairs"] == [["s000000001", "r000000001"]]
