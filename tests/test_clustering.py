"""Connected-components property tests (SURVEY.md §5.2 item 5): parity with
a union-find oracle on seeded random graphs, symmetry/permutation
invariance, partition-count invariance, singleton handling."""

import random

from pyspark.sql import functions as F

from merge_machine_spark.operators.clustering import (
    assignments_with_singletons,
    connected_components,
    pairwise_f1,
)


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, label = min member
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _random_edges(seed, n_nodes=60, n_edges=70):
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n_nodes):03d}", f"n{rng.randrange(n_nodes):03d}")
        for _ in range(n_edges)
    ]


def test_cc_matches_union_find_oracle(spark):
    for seed in (1, 2, 3):
        edges = _random_edges(seed)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
        oracle = _union_find_oracle([(a, b) for a, b in edges if a != b])
        assert got == oracle, f"seed {seed}"


def test_cc_direction_invariance(spark):
    edges = _random_edges(7)
    fwd = spark.createDataFrame(edges, ["id_a", "id_b"])
    rev = spark.createDataFrame([(b, a) for a, b in edges], ["id_a", "id_b"])
    a = sorted(map(tuple, connected_components(fwd).collect()))
    b = sorted(map(tuple, connected_components(rev).collect()))
    assert a == b


def test_cc_partition_invariance(spark):
    edges = _random_edges(11)
    d1 = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(1)
    d16 = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(16)
    assert sorted(map(tuple, connected_components(d1).collect())) == sorted(
        map(tuple, connected_components(d16).collect())
    )


def test_cc_long_chain(spark):
    """A path graph needs the full O(log n) iteration count — exercises
    convergence, not just one round."""
    n = 64
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert set(got.values()) == {"c000"} and len(got) == n


def test_singletons_rejoin(spark):
    docs = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], ["doc_id"])
    edges = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    assign = assignments_with_singletons(docs, connected_components(edges))
    got = {r["doc_id"]: r["cluster_id"] for r in assign.collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "z": "z"}


def test_cc_hub_star_skew(spark):
    """One hub with 1e5 neighbors (VERDICT r2 #2): the min+join-back
    formulation must handle a degree-10^5 node without materializing its
    neighborhood as a single array row. Built with spark.range so the edge
    list never lives on the driver."""
    n = 100_000
    edges = spark.range(n).select(
        F.lit("zhub").alias("id_a"),
        F.format_string("a%06d", F.col("id")).alias("id_b"),
    )
    got = connected_components(edges)
    assert got.filter(F.col("cluster_id") != "a000000").count() == 0
    assert got.count() == n + 1


def test_pairwise_f1_perfect_and_split(spark):
    truth = spark.createDataFrame(
        [("a", "e1"), ("b", "e1"), ("c", "e1"), ("x", "e2")], ["doc_id", "entity_id"]
    )
    perfect = truth.select("doc_id", F.col("entity_id").alias("cluster_id"))
    m = pairwise_f1(perfect, truth)
    assert m["f1"] == 1.0
    split = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2"), ("x", "k3")], ["doc_id", "cluster_id"]
    )
    m2 = pairwise_f1(split, truth)
    assert m2["precision"] == 1.0 and m2["recall"] < 1.0


def test_cc_assume_canonical_matches_default(spark):
    """assume_canonical=True (r6: skips the initial dedup exchange) returns
    the same assignments as the default path on a genuinely canonical edge
    set, and stays CORRECT (just slower) when the promise is false — dup
    edges, reversed order, self-loops are all absorbed by the first
    iteration's trailing distinct."""
    edges = [(a, b) for a, b in _random_edges(23) if a < b]
    canon = sorted(set(edges))
    df_canon = spark.createDataFrame(canon, ["id_a", "id_b"])
    base = sorted(map(tuple, connected_components(df_canon).collect()))
    fast = sorted(map(tuple, connected_components(df_canon, assume_canonical=True).collect()))
    assert fast == base
    dirty = canon + [(b, a) for a, b in canon[:10]] + canon[:5] + [("zz", "zz")]
    df_dirty = spark.createDataFrame(dirty, ["id_a", "id_b"])
    lied = sorted(map(tuple, connected_components(df_dirty, assume_canonical=True).collect()))
    assert lied == base


def test_cc_star_forest_input_converges_without_iterating(spark):
    """An input that is already a star forest (the fixpoint form) must be
    returned as-is by the direct star-forest convergence test (r6)."""
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("m", "n")]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "m": "m", "n": "m"}
