"""Dump .explain('formatted') for headline queries to plans/r06/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py before|after [query ...]
Driver-only (no jobs run); safe to run alongside other work.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "tokens_standard",
    "token_doc_frequency",
    "blocking_pairs",
    "pair_token_jaccard",
    "pair_jaro_winkler",
    "pair_levenshtein_top1",
    "minhash_lsh_pairs",
    "embedding_cosine_top5",
    "tpch_pricing_summary",
    "tpch_top_orders",
    "events_hourly_rollup",
    "doc_fingerprint",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

    import __spark_entry__ as entrymod
    from merge_machine_spark.sources.session import get_spark

    spark = get_spark("dump_plans", cores=4)
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
