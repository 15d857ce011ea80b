"""Driver-contract tests: entry() smoke at sf0.001 and a sample of
queries() vs oracle_sql() through DuckDB (the full sweep runs in
scripts/check_oracle.py; here a fast representative subset keeps pytest
quick while still gating the contract)."""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]
SAMPLE = [
    "tokens_standard",
    "blocking_pairs",
    "pair_token_jaccard",
    "pair_jaro_winkler",
    "cascade_two_tier",
    "core_attach_clusters",
    "cluster_score_stats",
    "tpch_pricing_summary",
    "embedding_cosine_top5",
    "embedding_near_dup",
    "winnowing_fingerprints",
    "fp_near_dup_pairs",
    "media_stub_meta",
    "frame_sample_meta",
    "audio_window_meta",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "cluster_id", "cluster_size"}


def test_queries_have_oracles_or_are_documented():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 20


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    sdf = qs[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    cols = sorted(sdf.columns)
    a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = ddf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), f"{name} value mismatch"
