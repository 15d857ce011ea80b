"""Cache lifecycle (VERDICT r2 what's-wrong #4): repeated resolve()/link()
calls in one long-lived session must not accumulate persisted intermediates
(the analyzed payload, the TF-IDF self-join subtree, per-tier scored tables).

localCheckpoint blocks are reclaimed by Spark's ContextCleaner on GC, so the
assertions poll with a GC nudge rather than demanding an instant zero."""

import time

from pyspark.sql import functions as F

from merge_machine_spark.caching import release
from merge_machine_spark.plans.pipeline import ResolveConfig, link, resolve


def _cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _settle(spark, target: int, tries: int = 20) -> int:
    """GC-nudge until the persistent-RDD count drops to <= target (or give
    up and return the last observed count)."""
    n = _cached_rdds(spark)
    for _ in range(tries):
        if n <= target:
            return n
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        n = _cached_rdds(spark)
    return n


def test_resolve_twice_and_link_do_not_accumulate_caches(spark, docs300):
    docs = docs300.select("doc_id", "spans")
    cfg = ResolveConfig(threshold=0.45)
    base = _cached_rdds(spark)

    def one_resolve():
        res = resolve(spark, docs, cfg)
        assert res["pair_scores"].count() > 0
        release(res)

    one_resolve()
    n1 = _settle(spark, base)
    one_resolve()
    n2 = _settle(spark, n1)

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
    n3 = _settle(spark, n2)

    # not monotonic growth: each extra run settles back to the prior level
    # (small slack for the session-scoped fixtures / final CC checkpoint
    # pending GC)
    assert n2 <= n1 + 1, f"resolve #2 grew the cache: {n1} -> {n2} (base {base})"
    assert n3 <= n2 + 1, f"link grew the cache: {n2} -> {n3} (base {base})"
