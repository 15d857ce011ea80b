"""Golden-parquet regression oracles for the two non-SQL-expressible
contract entries (r3 verdict next-round #2): ``minhash_lsh_pairs`` (xxhash64
family — no external engine replicates it) and ``ann_lsh_top3``
(xxhash64-derived hyperplanes). Technique proven on french_analyzer_tokens:
goldens generated once by scripts/gen_golden_lsh.py over the frozen sf0.001
fixtures, canonicalized (sorted rows, fixed row groups), byte-stable across
regenerations; these tests compare the LIVE Spark queries against them.

Any change to MinHash banding, bucket capping, hyperplane derivation,
multiprobe or tie-breaking shows up here as a mismatch instead of silently
shifting candidates. Three layers since r5:

- value comparison (live query vs golden rows);
- generator-source fingerprint (parquet metadata vs live
  ``inspect.getsource`` hash) — an algorithm edit fails FIRST with an
  explicit "regenerate consciously" message, not a confusing value diff
  (r4 verdict next-round #6);
- in-session regeneration byte-stability: rebuild both goldens with the
  live session and assert sha256 equality with the checked-in files,
  converting the generator docstring's "run 3x" claim into CI
  (r4 verdict next-round #3).
"""

import hashlib
import os
import sys

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import gen_golden_lsh as G  # noqa: E402


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__

    return __spark_entry__


def _stored_fingerprint(golden) -> str:
    meta = golden.schema.metadata or {}
    return meta.get(G.SOURCE_META_KEY, b"").decode()


def test_minhash_lsh_pairs_matches_golden(spark, entrymod):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "minhash_lsh_pairs_sf0001.parquet"))
    assert _stored_fingerprint(golden) == G.minhash_fingerprint(), (
        "MinHash/LSH generator source changed since the golden was written — "
        "if the algorithm change is intended, regenerate consciously with "
        "scripts/gen_golden_lsh.py and review the candidate-set diff"
    )
    expected = sorted(zip(golden["id_a"].to_pylist(), golden["id_b"].to_pylist()))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["minhash_lsh_pairs"](spark, SF_DIR).collect()
    )
    assert len(got) == len(expected)
    assert got == expected


def test_ann_lsh_top3_matches_golden(spark, entrymod):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "ann_lsh_top3_sf0001.parquet"))
    assert _stored_fingerprint(golden) == G.ann_fingerprint(), (
        "ANN-LSH generator source changed since the golden was written — "
        "if the algorithm change is intended, regenerate consciously with "
        "scripts/gen_golden_lsh.py and review the top-k diff"
    )
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


def test_ann_ivf_top3_matches_golden(spark, entrymod):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "ann_ivf_top3_sf0001.parquet"))
    assert _stored_fingerprint(golden) == G.ivf_fingerprint(), (
        "ANN-IVF generator source changed since the golden was written — "
        "if the algorithm change is intended, regenerate consciously with "
        "scripts/gen_golden_lsh.py and review the top-k diff"
    )
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
        for r in entrymod.queries()["ann_ivf_top3"](spark, SF_DIR).collect()
    )
    assert [(q, rk, c) for q, rk, c, _ in got] == [(q, rk, c) for q, rk, c, _ in expected]
    for (_, _, _, a), (_, _, _, b) in zip(got, expected):
        assert a == pytest.approx(b, abs=1e-12)


def test_golden_regeneration_byte_stable(spark, tmp_path):
    """Regenerate BOTH goldens in-session through the checked-in generator
    (same build + writer code paths) and require byte equality with the
    committed files — catches any nondeterminism a Spark/Arrow version
    drift might introduce into xxhash64, the cosine fold order, sort
    tie-breaking, or the parquet encoding itself."""
    for build, fname in [
        (G.build_minhash_table, "minhash_lsh_pairs_sf0001.parquet"),
        (G.build_ann_table, "ann_lsh_top3_sf0001.parquet"),
        (G.build_ivf_table, "ann_ivf_top3_sf0001.parquet"),
    ]:
        out = tmp_path / fname
        G.write_golden(build(spark), str(out))
        regen = hashlib.sha256(out.read_bytes()).hexdigest()
        checked_in = G.sha256_file(os.path.join(GOLDEN_DIR, fname))
        assert regen == checked_in, f"{fname}: regeneration not byte-stable vs checked-in golden"
