"""Cache lifecycle (VERDICT r2 what's-wrong #4): repeated resolve()/link()
calls in one long-lived session must not accumulate persisted intermediates
(the analyzed payload, the TF-IDF self-join subtree, per-tier scored tables).

Two layers of assertion:
  1. deterministic — the `caching` registry is fully drained by each entry
     point (every track()'d persist got its unpersist);
  2. bounded growth — the session's persistent-RDD count over three
     resolve() runs plus a link() stays within a small constant of the
     first run's level. connected_components leaves a handful of
     localCheckpoint blocks per run that only Spark's ContextCleaner can
     reclaim (asynchronously, on GC), so exact equality is not testable in
     a shared session; pre-fix behavior grew by 4 never-released explicit
     caches per call and fails these bounds by a wide margin."""

import gc
import time

from pyspark.sql import functions as F

from merge_machine_spark.caching import release, tracked_count
from merge_machine_spark.plans.pipeline import ResolveConfig, link, resolve


def _cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _settle(spark, tries: int = 30) -> int:
    """GC-nudge until the persistent-RDD count stops shrinking."""
    n = _cached_rdds(spark)
    stable = 0
    for _ in range(tries):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        m = _cached_rdds(spark)
        stable = stable + 1 if m == n else 0
        n = m
        if stable >= 3:
            break
    return n


def test_resolve_and_link_do_not_accumulate_caches(spark, docs300):
    docs = docs300.select("doc_id", "spans")
    cfg = ResolveConfig(threshold=0.45)

    counts = []
    for _ in range(3):
        res = resolve(spark, docs, cfg)
        assert res["pair_scores"].count() > 0
        # deterministic: every tracked persist was released by resolve()
        assert tracked_count() == 0
        release(res)
        counts.append(_settle(spark))

    src = docs300.limit(40).select(
        "doc_id", F.element_at("spans", 1)["text"].alias("full_text")
    )
    out = link(
        spark,
        src,
        src,
        tiers=[{
            "proj_a": "full_text", "proj_b": "full_text", "channel": "standard",
            "weights": {"tfidf_cosine": 1.0}, "threshold": 0.2,
        }],
    )
    assert out.count() > 0
    assert tracked_count() == 0
    n_link = _settle(spark)

    # bounded, sub-linear: pre-fix each resolve() leaked 4 explicit caches
    # (analyzed, wa, scores, proj) -> 3 runs would sit ~8+ above run 1.
    assert counts[2] <= counts[0] + 5, f"cache grew across resolves: {counts}"
    assert n_link <= counts[2] + 5, f"link grew the cache: {counts} -> {n_link}"
