"""core_attach_clusters: chain-safe two-tier clustering semantics, plus the
two-threshold calibration loop hitting the F1 gate end-to-end."""

from pyspark.sql import functions as F

from merge_machine_spark.operators.clustering import (
    assignments_with_singletons, connected_components, core_attach_clusters)


def _scores(spark, rows):
    return spark.createDataFrame(rows, "id_a string, id_b string, score double")


def _clusters(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    return set(frozenset(v) for v in out.values())


def test_weak_bridge_cannot_merge_two_core_clusters(spark):
    s = _scores(spark, [
        ("a1", "a2", 0.9),
        ("b1", "b2", 0.9),
        ("a2", "b1", 0.45),  # borderline cross-entity pair
    ])
    got = _clusters(core_attach_clusters(s, core_threshold=0.6, attach_threshold=0.4))
    assert got == {frozenset({"a1", "a2"}), frozenset({"b1", "b2"})}
    # contrast: plain CC at the attach threshold merges everything
    cc = connected_components(s.filter(F.col("score") >= 0.4).select("id_a", "id_b"))
    assert _clusters(cc) == {frozenset({"a1", "a2", "b1", "b2"})}


def test_weak_edge_attaches_leaf_to_best_core_cluster(spark):
    s = _scores(spark, [
        ("a1", "a2", 0.9),
        ("b1", "b2", 0.9),
        ("a2", "x9", 0.55),  # x9's best core neighbor: cluster a1
        ("b2", "x9", 0.50),
    ])
    got = _clusters(core_attach_clusters(s, 0.6, 0.4))
    assert got == {frozenset({"a1", "a2", "x9"}), frozenset({"b1", "b2"})}


def test_attach_tie_breaks_to_smallest_neighbor_id(spark):
    s = _scores(spark, [
        ("a1", "a2", 0.9),
        ("b1", "b2", 0.9),
        ("a2", "x9", 0.55),
        ("b1", "x9", 0.55),  # same score — deterministic pick: dst a2 < b1
    ])
    got = _clusters(core_attach_clusters(s, 0.6, 0.4))
    assert frozenset({"a1", "a2", "x9"}) in got


def test_attached_leaf_does_not_transfer_connectivity(spark):
    # y attaches to x's cluster? No: x itself is only attached (not core),
    # so y can reach no core cluster through x and pairs mutually instead.
    s = _scores(spark, [
        ("a1", "a2", 0.9),
        ("a2", "x5", 0.55),
        ("x5", "y7", 0.58),
        ("y7", "z9", 0.57),
    ])
    got = _clusters(core_attach_clusters(s, 0.6, 0.4))
    # x5 attaches to {a1,a2}; y7 and z9 are left floating; y7's best
    # floating neighbor is z9 (x5 is attached, excluded) and vice versa
    assert got == {frozenset({"a1", "a2", "x5"}), frozenset({"y7", "z9"})}


def test_mutual_best_pairs_only(spark):
    # chain of weak edges: y-z (0.5), z-w (0.55). best(z)=w, best(w)=z ->
    # {z,w}; y's best is z but not mutual -> y unclustered (singleton later)
    s = _scores(spark, [
        ("y1", "z2", 0.50),
        ("z2", "w3", 0.55),
    ])
    got = _clusters(core_attach_clusters(s, 0.9, 0.4))
    assert got == {frozenset({"z2", "w3"})}
    docs = spark.createDataFrame([("y1",), ("z2",), ("w3",)], "doc_id string")
    with_singles = assignments_with_singletons(
        docs, core_attach_clusters(s, 0.9, 0.4))
    assert _clusters(with_singles) == {frozenset({"z2", "w3"}), frozenset({"y1"})}


def test_no_weak_edges_degenerates_to_plain_cc(spark):
    s = _scores(spark, [("a1", "a2", 0.9), ("a2", "a3", 0.8)])
    got = _clusters(core_attach_clusters(s, 0.6, 0.4))
    assert got == {frozenset({"a1", "a2", "a3"})}


def test_cluster_score_stats(spark):
    from merge_machine_spark.operators.clustering import cluster_score_stats

    s = _scores(spark, [
        ("a1", "a2", 0.9),
        ("a2", "a3", 0.8),
        ("a1", "a3", 0.7),
        ("b1", "b2", 0.6),
        ("a3", "b1", 0.5),  # inter-cluster: must NOT count anywhere
    ])
    assign = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1"), ("b1", "b1"), ("b2", "b1")],
        "doc_id string, cluster_id string",
    )
    rows = {r["cluster_id"]: r for r in cluster_score_stats(s, assign).collect()}
    assert rows["a1"]["n_members"] == 3 and rows["a1"]["n_intra_pairs"] == 3
    assert rows["a1"]["min_score"] == 0.7 and rows["a1"]["max_score"] == 0.9
    assert abs(rows["a1"]["sum_score"] - 2.4) < 1e-9
    assert rows["b1"]["n_members"] == 2 and rows["b1"]["n_intra_pairs"] == 1
    assert rows["b1"]["sum_score"] == 0.6
    # cluster with members but no surviving intra pair
    assign2 = assign.union(spark.createDataFrame([("c1", "c1"), ("c2", "c1")], assign.schema))
    rows2 = {r["cluster_id"]: r for r in cluster_score_stats(s, assign2).collect()}
    assert rows2["c1"]["n_intra_pairs"] == 0 and rows2["c1"]["min_score"] is None


def test_inverted_thresholds_raise(spark):
    import pytest

    s = _scores(spark, [("a1", "a2", 0.9)])
    with pytest.raises(ValueError, match="attach_threshold"):
        core_attach_clusters(s, core_threshold=0.4, attach_threshold=0.5)


def test_two_tier_resume_byte_identical(spark):
    """Kill-after-stage-k resume (SURVEY §5.2 item 6) with chain-safe
    clustering configured: identical final cluster table on relaunch."""
    import os
    import shutil
    import tempfile

    from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
    from merge_machine_spark.sources.synth import generate_documents

    docs = generate_documents(spark, 60, seed=9).select("doc_id", "spans")
    cfg = ResolveConfig()
    cfg.threshold = 0.35
    cfg.core_threshold = 0.5
    ckdir = tempfile.mkdtemp(prefix="ck_twotier_")
    try:
        r1 = resolve(spark, docs, cfg, checkpoint_dir=ckdir, run_id="t")
        c1 = sorted(map(tuple, r1["cluster_assignments"].collect()))
        os.remove(f"{ckdir}/t/cluster_assignments/_STAGE_MANIFEST.json")
        r2 = resolve(spark, docs, cfg, checkpoint_dir=ckdir, run_id="t")
        c2 = sorted(map(tuple, r2["cluster_assignments"].collect()))
        assert c1 == c2
        assert len(c1) > 0
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)


def _model_core_attach(edges, core_t, attach_t):
    """Pure-Python reference of core_attach_clusters semantics: min-root
    union-find over core edges, best-core-neighbor attachment with the
    (-score, dst) tie-break, mutual-best pairing for the rest."""
    canon = {}
    for u, v, s in edges:
        a, b = (u, v) if u < v else (v, u)
        if a != b:
            canon[(a, b)] = s
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), s in canon.items():
        if s >= core_t:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    core_assign = {x: find(x) for x in list(parent)}
    weak = [(a, b, s) for (a, b), s in canon.items() if attach_t <= s < core_t]
    directed = weak + [(b, a, s) for a, b, s in weak]
    uncored = [(src, dst, s) for src, dst, s in directed if src not in core_assign]
    pick = {}
    for src, dst, s in uncored:
        if dst in core_assign:
            key = (-s, dst)
            if src not in pick or key < pick[src][0]:
                pick[src] = (key, core_assign[dst])
    attached = {src: cid for src, (_, cid) in pick.items()}
    floating = [
        (src, dst, s) for src, dst, s in uncored
        if src not in attached and dst not in attached and dst not in core_assign
    ]
    bestd = {}
    for src, dst, s in floating:
        key = (-s, dst)
        if src not in bestd or key < bestd[src][0]:
            bestd[src] = (key, dst)
    bestd = {src: dst for src, (_, dst) in bestd.items()}
    out = dict(core_assign)
    out.update(attached)
    for src, dst in bestd.items():
        if bestd.get(dst) == src and src < dst:
            out[src] = src
            out[dst] = src
    return out


def test_random_graphs_match_pure_python_model(spark):
    """Model-based check: 12 seeded random weighted graphs (discrete score
    levels to provoke ties), Spark operator output must equal the pure-
    Python reference exactly — covers arbitrary interleavings of core
    components, attachment competition, and mutual-best pairing that the
    hand-built cases can't."""
    import random

    levels = [0.2, 0.35, 0.5, 0.65, 0.8]
    for seed in range(12):
        rng = random.Random(seed)
        n = rng.randint(8, 14)
        nodes = [f"n{i:02d}" for i in range(n)]
        edges = [
            (a, b, rng.choice(levels))
            for i, a in enumerate(nodes)
            for b in nodes[i + 1:]
            if rng.random() < 0.2
        ]
        if not edges:
            continue
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in core_attach_clusters(_scores(spark, edges), 0.6, 0.3).collect()
        }
        want = _model_core_attach(edges, 0.6, 0.3)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_two_tier_calibrated_resolve_hits_f1_gate(spark, docs300):
    """Close the loop: learn (attach, core) from labelled pairs, resolve
    with chain-safe clustering, labeled-pair F1 >= 0.99."""
    from merge_machine_spark.plans.calibration import learn_resolve_thresholds
    from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
    from merge_machine_spark.sources.synth import generate_labels

    labels = generate_labels(docs300, n_pos=400, n_neg=400).cache()
    attach, core, metrics = learn_resolve_thresholds(
        spark, docs300.select("doc_id", "spans"), labels)
    assert 0.2 < attach <= core < 0.9, (attach, core, metrics)
    assert metrics["core_recall_of_positives"] >= 0.88

    cfg = ResolveConfig()
    cfg.threshold = float(attach)
    cfg.core_threshold = float(core)
    res = resolve(spark, docs300.select("doc_id", "spans"), cfg)
    assign = res["cluster_assignments"].cache()
    ca = assign.select(F.col("doc_id").alias("doc_id_a"), F.col("cluster_id").alias("ca"))
    cb = assign.select(F.col("doc_id").alias("doc_id_b"), F.col("cluster_id").alias("cb"))
    j = (
        labels.join(ca, "doc_id_a").join(cb, "doc_id_b")
        .withColumn("pred", F.col("ca") == F.col("cb"))
        .withColumn("gold", F.col("label") == "y")
    )
    agg = j.agg(
        F.sum(F.when(F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("gold"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    prec = agg["tp"] / max(agg["tp"] + agg["fp"], 1)
    rec = agg["tp"] / max(agg["tp"] + agg["fn"], 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.99, f"two-tier calibrated F1 {f1:.4f} (attach={attach:.3f} core={core:.3f})"
