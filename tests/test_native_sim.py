"""Exact-equivalence pins for the native (C) pair-plane kernels (r6).

The optimization contract: ``native_sim.lev_batch`` must equal Spark's
built-in ``levenshtein`` (code-point units) on arbitrary unicode, the Myers
bit-parallel path must equal the plain DP across word boundaries (64/128),
and ``jw_batch`` must be bit-identical to ``jaro_winkler_py`` (itself
DuckDB-parity-verified). The Spark-level test pins the rewritten
``pair_levenshtein_top1`` query against the r5 JVM formulation on real
fixture data.
"""

from __future__ import annotations

import random

import pytest

from merge_machine_spark.functions import native_sim

pytestmark = pytest.mark.skipif(
    not native_sim.have_native(), reason="no C compiler — JVM/DuckDB fallbacks in effect"
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, row[0] = row[0], i
        for j in range(1, lb + 1):
            cur = row[j]
            row[j] = min(prev + (a[i - 1] != b[j - 1]), row[j] + 1, row[j - 1] + 1)
            prev = cur
    return row[lb]


def _cases(rng: random.Random, alphabet: str, n: int) -> list[tuple[str, str]]:
    lens = [0, 1, 2, 3, 5, 17, 31, 32, 33, 63, 64, 65, 100, 127, 128, 129, 200, 300, 600]
    out = []
    for _ in range(n):
        a = "".join(rng.choice(alphabet) for _ in range(rng.choice(lens)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.choice(lens)))
        out.append((a, b))
        if len(a) > 10:  # near-dup variant: exercises prefix/suffix trimming
            mut = list(a)
            for _ in range(rng.randint(0, 5)):
                mut[rng.randrange(len(mut))] = rng.choice(alphabet)
            out.append((a, "".join(mut)))
    return out


def test_lev_batch_ascii_matches_reference_dp():
    rng = random.Random(7)
    cases = _cases(rng, "abcdefgh 0123", 300)
    got = native_sim.lev_batch([a for a, _ in cases], [b for _, b in cases])
    for (a, b), g in zip(cases, got):
        assert g == _ref_lev(a, b), (a[:40], b[:40])


def test_lev_batch_unicode_matches_reference_dp():
    rng = random.Random(8)
    cases = _cases(rng, "abéèüœ日本 x", 120)
    got = native_sim.lev_batch([a for a, _ in cases], [b for _, b in cases])
    for (a, b), g in zip(cases, got):
        assert g == _ref_lev(a, b)


def test_jw_batch_bit_identical_to_python_reference():
    from merge_machine_spark.functions.similarity import jaro_winkler_py

    rng = random.Random(9)
    cases = _cases(rng, "abcdefgh éü ", 200)
    got = native_sim.jw_batch([a for a, _ in cases], [b for _, b in cases])
    for (a, b), g in zip(cases, got):
        assert g == jaro_winkler_py(a, b)


def test_lev_map_arrow_null_semantics():
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3], type=pa.int64()),
            pa.array([10, 20, 30], type=pa.int64()),
            pa.array(["abc", None, "xyz"]),
            pa.array(["abd", "q", None]),
        ],
        names=["id_a", "id_b", "ta", "tb"],
    )
    (out,) = list(native_sim.lev_pairs_map_arrow(iter([batch])))
    assert out.column("lev").to_pylist() == [1, None, None]
    assert out.column("id_a").to_pylist() == [1, 2, 3]


def test_pair_levenshtein_top1_query_matches_jvm_formulation(spark):
    """The rewritten headline query (mapInArrow native kernel) returns
    exactly the r5 JVM rows on the sf0.001 fixture."""
    import __spark_entry__ as entrymod
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = sorted(
        tuple(r) for r in entrymod.queries()["pair_levenshtein_top1"](spark, SF_DIR).collect()
    )

    pairs = entrymod._block_pairs(spark, SF_DIR).select("id_a", "id_b")
    docs = entrymod._t(spark, SF_DIR, "documents").select("doc_id", "text")
    j = (
        pairs.join(docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb")), "id_b")
        .select("id_a", "id_b", F.levenshtein("ta", "tb").alias("lev"))
    )
    w = Window.partitionBy("id_a").orderBy(F.asc("lev"), F.asc("id_b"))
    exp = sorted(
        tuple(r)
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id_a", "id_b", "lev")
        .collect()
    )
    assert got == exp and len(got) > 0


def test_jw_arrow_udf_matches_pandas_udf(spark):
    """The Arrow-native JW path (r6 primary) is bit-identical to the
    pandas_udf path on mixed-length unicode incl. nulls and empties —
    same DuckDB kernel, no pandas step."""
    import random

    from pyspark.sql import functions as F

    from merge_machine_spark.functions import similarity as S

    if S.jaro_winkler_arrow is None:
        import pytest

        pytest.skip("Spark without arrow_udf")
    rng = random.Random(7)
    rows = _cases(rng, "abcé日本語 xyz", 120)
    rows += [(None, "abc"), ("abc", None), (None, None), ("", ""), ("", "x")]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = [
        r["jw"]
        for r in df.select(S.jaro_winkler_arrow(F.col("a"), F.col("b")).alias("jw"))
        .collect()
    ]
    exp = [
        r["jw"]
        for r in df.select(S.jaro_winkler_udf(F.col("a"), F.col("b")).alias("jw"))
        .collect()
    ]
    assert got == exp and len(got) == len(rows)
