"""Extra benchmarks and per-stage profiling (NOT part of the driver contract).

``bench.py`` is frozen for measurement; this file holds the noop-sink
isolation runs (spark_optimization_guide.md §1.4) whose numbers are cited in
OPTIMIZATION_r06.md:

  * ``headline`` — each headline query timed best-of-N through the noop sink
    with job descriptions, at $SPARK_GRAFT_SF_DIR;
  * ``er [n_entities]`` — the flagship resolve() decomposed into its stages
    (analyzer, token explode + TF-IDF pair join, payload feature join),
    each materialized separately so the expensive stage is identifiable.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py headline
  python bench_extra.py er 200000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def headline(spark, sf_dir: str, repeats: int = 2) -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "tokens_standard", "token_doc_frequency", "blocking_pairs",
        "pair_token_jaccard", "pair_jaro_winkler", "pair_levenshtein_top1",
        "minhash_lsh_pairs", "embedding_cosine_top5", "tpch_pricing_summary",
        "tpch_top_orders", "events_hourly_rollup", "doc_fingerprint",
    ]
    _noop(qs[names[0]](spark, sf_dir))  # warm-up (JVM/codegen/Arrow start-up)
    out = {}
    for name in names:
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"headline:{name}#{i}")
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"{name}: {runs}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries_min": {k: min(v) for k, v in out.items()},
                      "queries_runs": out}), flush=True)


def er_stages(spark, n_entities: int) -> None:
    from pyspark.sql import functions as F

    from merge_machine_spark.caching import release_tracked
    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.functions.textproj import project_documents
    from merge_machine_spark.operators.blocking import explode_tokens
    from merge_machine_spark.operators.scoring import tfidf_cosine_pairs
    from merge_machine_spark.plans.pipeline import ResolveConfig, _pair_scores
    from merge_machine_spark.sources.synth import generate_documents

    cfg = ResolveConfig(threshold=0.45)
    docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans").persist()
    n_raw = docs.count()
    out = {"n_docs": n_raw}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(f"er:{name}")
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}s", flush=True)
        return r

    # stage 1: projection + analyzer (the per-doc pandas UDF)
    proj = project_documents(docs, cfg.projections).cache()
    n_docs = proj.count()
    analyzed_cols = [
        F.col("doc_id"),
        A.analyze(cfg.block_proj, cfg.block_channel).alias("_rawtok"),
        F.substring(F.col(cfg.block_proj), 1, cfg.jw_prefix).alias("_txt"),
        F.array_distinct(A.analyze(cfg.block_proj, "integers")).alias("_toki"),
    ]
    analyzed = proj.select(*analyzed_cols).persist()
    stage("analyze", lambda: analyzed.count())

    # stage 2: token explode + tf
    tok = explode_tokens(analyzed, "doc_id", F.col("_rawtok"), with_tf=True)
    stage("explode_tf", lambda: _noop(tok))

    # stage 3: TF-IDF scored self-join (candidate generation) + prefilter
    pairs = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs)
    pairs = pairs.filter(F.col("tfidf_cosine") >= F.lit(cfg.prefilter_tfidf))
    stage("tfidf_pairs", lambda: _noop(pairs))
    release_tracked()

    # stage 4: the full pair-scores DAG (analyzer cached from stage 1)
    scores = _pair_scores(proj, cfg, n_docs)
    stage("full_pair_scores", lambda: _noop(scores))
    release_tracked()

    # end-to-end cold (bench.py's timed shape: fresh cache, count())
    spark.catalog.clearCache()
    docs.persist().count()

    def cold():
        s = _pair_scores(project_documents(docs, cfg.projections).cache(),
                         cfg, n_docs)
        s = s.persist()
        n = s.count()
        release_tracked()
        s.unpersist()
        return n

    out["pairs_scored"] = stage("cold_end_to_end", cold)
    print(json.dumps(out), flush=True)


def er_analyze_breakdown(spark, n_entities: int) -> None:
    """Which piece of the ER DAG is expensive: per-channel analyzer costs,
    token-join cardinalities, payload-feature costs — each noop-isolated."""
    import time

    from pyspark.sql import functions as F

    from merge_machine_spark.caching import release_tracked
    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.functions.textproj import project_documents
    from merge_machine_spark.operators.blocking import explode_tokens
    from merge_machine_spark.operators.scoring import payload_pair_features, tfidf_cosine_pairs
    from merge_machine_spark.plans.pipeline import ResolveConfig
    from merge_machine_spark.sources.synth import generate_documents

    cfg = ResolveConfig(threshold=0.45)
    docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans").persist()
    docs.count()
    proj = project_documents(docs, cfg.projections).cache()
    n_docs = proj.count()
    out = {"n_docs": n_docs}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(f"er2:{name}")
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}s", flush=True)
        return r

    stage("proj_only", lambda: _noop(proj.select("doc_id", "full_text")))
    stage("french_estab", lambda: _noop(proj.select("doc_id", A.analyze("full_text", "french_estab"))))
    stage("french_estab_2nd", lambda: _noop(proj.select("doc_id", A.analyze("full_text", "french_estab"))))
    stage("integers", lambda: _noop(proj.select("doc_id", F.array_distinct(A.analyze("full_text", "integers")))))
    stage("substr96", lambda: _noop(proj.select("doc_id", F.substring("full_text", 1, 96))))

    analyzed = proj.select(
        F.col("doc_id"),
        A.analyze("full_text", cfg.block_channel).alias("_rawtok"),
        F.substring(F.col("full_text"), 1, cfg.jw_prefix).alias("_txt"),
        F.array_distinct(A.analyze("full_text", "integers")).alias("_toki"),
    ).persist()
    stage("analyzed_all", lambda: analyzed.count())

    tok = explode_tokens(analyzed, "doc_id", F.col("_rawtok"), with_tf=True)
    stage("tok_rows", lambda: print("  tok rows:", tok.count()))
    pairs = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs)
    stage("tfidf_pairs_all", lambda: _noop(pairs))
    release_tracked()
    pairs2 = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs)
    stage("tfidf_pairs_count", lambda: print("  pair rows:", pairs2.count()))
    release_tracked()

    pairs3 = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs).filter(
        F.col("tfidf_cosine") >= F.lit(cfg.prefilter_tfidf)
    ).persist()
    stage("tfidf_prefiltered_persist", lambda: print("  kept pairs:", pairs3.count()))

    payload = analyzed.select(
        F.col("doc_id"), F.col("_txt"), F.array_distinct(F.col("_rawtok")).alias("_tok"), F.col("_toki")
    )
    feat = payload_pair_features(pairs3, payload, payload, cfg.weights, broadcast_sides=False)
    stage("payload_features", lambda: _noop(feat))
    jw_only = payload_pair_features(pairs3, payload, payload, {"jaro_winkler": 0.2}, broadcast_sides=False)
    stage("payload_jw_only", lambda: _noop(jw_only))
    nojw = payload_pair_features(
        pairs3, payload, payload, {k: v for k, v in cfg.weights.items() if k != "jaro_winkler"},
        broadcast_sides=False,
    )
    stage("payload_no_jw", lambda: _noop(nojw))
    release_tracked()
    import json as _json

    print(_json.dumps(out), flush=True)


def er_join_isolation(spark, n_entities: int) -> None:
    """Payload join cost vs feature-compute cost; token-join cardinality."""
    import time

    from pyspark.sql import functions as F

    from merge_machine_spark.caching import release_tracked
    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.functions.similarity import token_jaccard
    from merge_machine_spark.functions.textproj import project_documents
    from merge_machine_spark.operators.blocking import explode_tokens
    from merge_machine_spark.operators.scoring import tfidf_cosine_pairs
    from merge_machine_spark.plans.pipeline import ResolveConfig
    from merge_machine_spark.sources.synth import generate_documents

    cfg = ResolveConfig(threshold=0.45)
    docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans").persist()
    docs.count()
    proj = project_documents(docs, cfg.projections).cache()
    n_docs = proj.count()
    out = {"n_docs": n_docs}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(f"er3:{name}")
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}s", flush=True)

    analyzed = proj.select(
        F.col("doc_id"),
        A.analyze("full_text", cfg.block_channel).alias("_rawtok"),
        F.substring(F.col("full_text"), 1, cfg.jw_prefix).alias("_txt"),
        F.array_distinct(A.analyze("full_text", "integers")).alias("_toki"),
    ).persist()
    analyzed.count()
    tok = explode_tokens(analyzed, "doc_id", F.col("_rawtok"), with_tf=True).persist()
    print("tok rows:", tok.count(), flush=True)
    dfreq = tok.groupBy("token").agg(F.countDistinct("id").alias("df"))
    print("vocab:", dfreq.count(), flush=True)
    print("capped join fanout sum(df^2):",
          dfreq.filter(F.col("df") <= 256).agg(F.sum(F.col("df") * F.col("df"))).collect()[0][0],
          flush=True)

    pairs3 = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs).filter(
        F.col("tfidf_cosine") >= F.lit(cfg.prefilter_tfidf)
    ).persist()
    print("kept pairs:", pairs3.count(), flush=True)
    release_tracked()

    payload = analyzed.select(
        F.col("doc_id"), F.col("_txt"), F.array_distinct(F.col("_rawtok")).alias("_tok"), F.col("_toki")
    )
    a = payload.select(F.col("doc_id").alias("id_a"), F.col("_txt").alias("_txt_a"),
                       F.col("_tok").alias("_tok_a"), F.col("_toki").alias("_toki_a"))
    b = payload.select(F.col("doc_id").alias("id_b"), F.col("_txt").alias("_txt_b"),
                       F.col("_tok").alias("_tok_b"), F.col("_toki").alias("_toki_b"))
    joined = pairs3.join(a, "id_a").join(b, "id_b")
    stage("join_only_full_payload", lambda: _noop(joined.select("id_a", "id_b", F.length("_txt_a") + F.length("_txt_b"))))
    stage("join_plus_tok_jaccard", lambda: _noop(
        pairs3.join(a.select("id_a", "_tok_a"), "id_a").join(b.select("id_b", "_tok_b"), "id_b")
        .select("id_a", "id_b", token_jaccard(F.col("_tok_a"), F.col("_tok_b")).alias("tj"))))
    stage("join_plus_int_jaccard", lambda: _noop(
        pairs3.join(a.select("id_a", "_toki_a"), "id_a").join(b.select("id_b", "_toki_b"), "id_b")
        .select("id_a", "id_b", token_jaccard(F.col("_toki_a"), F.col("_toki_b")).alias("ij"))))
    stage("join_ids_only", lambda: _noop(
        pairs3.join(a.select("id_a"), "id_a").join(b.select("id_b"), "id_b")))
    import json as _json

    print(_json.dumps(out), flush=True)


def cc_isolation(spark, n_entities: int) -> None:
    """connected_components cost in isolation, at the bench's edge scale:
    generate docs -> pair scores -> threshold edges (persisted, OUTSIDE the
    timed window) -> time CC end-to-end, repeated."""
    import time

    from pyspark.sql import functions as F

    from merge_machine_spark.caching import release_tracked
    from merge_machine_spark.functions.textproj import project_documents
    from merge_machine_spark.operators.clustering import connected_components
    from merge_machine_spark.plans.pipeline import ResolveConfig, _pair_scores
    from merge_machine_spark.sources.synth import generate_documents

    cfg = ResolveConfig(threshold=0.45)
    docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans").persist()
    docs.count()
    proj = project_documents(docs, cfg.projections).cache()
    n_docs = proj.count()
    scores = _pair_scores(proj, cfg, n_docs)
    edges = scores.filter(F.col("score") >= F.lit(cfg.threshold)).select("id_a", "id_b").persist()
    n_edges = edges.count()
    release_tracked()
    out = {"n_docs": n_docs, "n_edges": n_edges, "cc_runs": []}
    for i in range(3):
        spark.sparkContext.setJobDescription(f"cc:run{i}")
        t0 = time.time()
        assign = connected_components(edges)
        n_clusters = assign.select("cluster_id").distinct().count()
        out["cc_runs"].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"cc run {i}: {out['cc_runs'][-1]}s clusters={n_clusters}", flush=True)
    out["n_clusters"] = n_clusters
    print(json.dumps(out), flush=True)


def er_shuffle_stages(spark, n_entities: int) -> None:
    """Noise-immune plan evidence: materialize the full pair-scores DAG and
    dump per-stage shuffle write totals via the UI REST API (the byte/record
    totals are deterministic even when walls are stolen). Requires the
    session to be built with spark.ui.enabled=true (this mode rebuilds it)."""
    import json as _json
    import time
    import urllib.request

    from pyspark.sql import functions as F

    from merge_machine_spark.caching import release_tracked
    from merge_machine_spark.functions.textproj import project_documents
    from merge_machine_spark.plans.pipeline import ResolveConfig, _pair_scores
    from merge_machine_spark.sources.session import get_spark
    from merge_machine_spark.sources.synth import generate_documents

    spark.stop()
    spark = get_spark("bench_extra_shuffle", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4077"})
    cfg = ResolveConfig(threshold=0.45)
    docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans").persist()
    docs.count()
    proj = project_documents(docs, cfg.projections).cache()
    n_docs = proj.count()
    t0 = time.time()
    spark.sparkContext.setJobDescription("shuffle:full_pair_scores")
    _noop(_pair_scores(proj, cfg, n_docs))
    print(f"full_pair_scores wall: {time.time()-t0:.2f}s", flush=True)
    release_tracked()
    app = _json.load(urllib.request.urlopen("http://localhost:4077/api/v1/applications"))[0]["id"]
    stages = _json.load(urllib.request.urlopen(
        f"http://localhost:4077/api/v1/applications/{app}/stages?status=complete"))
    tot_w = sum(s["shuffleWriteRecords"] for s in stages)
    tot_b = sum(s["shuffleWriteBytes"] for s in stages)
    print(f"TOTAL shuffle write: {tot_w} records, {tot_b/1e6:.1f} MB over {len(stages)} stages", flush=True)
    for s in sorted(stages, key=lambda s: -s["shuffleWriteRecords"])[:14]:
        print(f"  stage {s['stageId']:>3} w_rec={s['shuffleWriteRecords']:>9} "
              f"w_mb={s['shuffleWriteBytes']/1e6:8.1f} r_rec={s['shuffleReadRecords']:>9} "
              f"t={s.get('executorRunTime', 0)/1000:7.1f}s", flush=True)


def main() -> None:
    from merge_machine_spark.sources.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    spark = get_spark("bench_extra", cores=cores)
    if mode == "headline":
        headline(spark, sf_dir, repeats=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif mode == "er":
        er_stages(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif mode == "er2":
        er_analyze_breakdown(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif mode == "er3":
        er_join_isolation(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif mode == "cc":
        cc_isolation(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif mode == "shuffle":
        er_shuffle_stages(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
