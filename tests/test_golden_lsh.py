"""Golden-parquet regression oracles for the two non-SQL-expressible
contract entries (r3 verdict next-round #2): ``minhash_lsh_pairs`` (xxhash64
family — no external engine replicates it) and ``ann_lsh_top3``
(xxhash64-derived hyperplanes). Technique proven on french_analyzer_tokens:
goldens generated once by scripts/gen_golden_lsh.py over the frozen sf0.001
fixtures, canonicalized (sorted rows, fixed row groups), byte-stable across
regenerations; these tests compare the LIVE Spark queries against them.

Any change to MinHash banding, bucket capping, hyperplane derivation,
multiprobe or tie-breaking shows up here as a mismatch instead of silently
shifting candidates.
"""

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__

    return __spark_entry__


def test_minhash_lsh_pairs_matches_golden(spark, entrymod):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "minhash_lsh_pairs_sf0001.parquet"))
    expected = sorted(zip(golden["id_a"].to_pylist(), golden["id_b"].to_pylist()))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["minhash_lsh_pairs"](spark, SF_DIR).collect()
    )
    assert len(got) == len(expected)
    assert got == expected


def test_ann_lsh_top3_matches_golden(spark, entrymod):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "ann_lsh_top3_sf0001.parquet"))
    expected = sorted(
        zip(
            golden["q_id"].to_pylist(),
            golden["rank"].to_pylist(),
            golden["c_id"].to_pylist(),
            golden["cos"].to_pylist(),
        )
    )
    got = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["cos"])
        for r in entrymod.queries()["ann_lsh_top3"](spark, SF_DIR).collect()
    )
    assert [(q, rk, c) for q, rk, c, _ in got] == [(q, rk, c) for q, rk, c, _ in expected]
    # cosine values: same fold order -> identical doubles; allow 1e-12 for
    # paranoia about JIT-level FP reassociation differences across sessions
    for (_, _, _, a), (_, _, _, b) in zip(got, expected):
        assert a == pytest.approx(b, abs=1e-12)
