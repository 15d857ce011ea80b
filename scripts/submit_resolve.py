#!/usr/bin/env python3
"""spark-submit entrypoint for the resolve pipeline (north rule launch path).

Cluster usage (the session comes from spark-submit; get_spark is bypassed):

    zip -r mms.zip merge_machine_spark
    spark-submit --py-files mms.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        scripts/submit_resolve.py \
        --input  s3://bucket/documents \
        --output s3://bucket/er_out \
        --checkpoint-dir s3://bucket/er_ckpt --run-id run42 \
        --threshold 0.45

Local sandbox check:

    PYTHONPATH=. python scripts/submit_resolve.py --synth 2000 \
        --output /tmp/er_out --checkpoint-dir /tmp/er_ckpt
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="documents table path (doc_id, spans)")
    p.add_argument("--synth", type=int, help="generate N synthetic entities instead of --input")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--run-id", default="run")
    p.add_argument("--threshold", type=float, default=0.45)
    p.add_argument("--core-threshold", type=float, default=None,
                   help="enable chain-safe two-tier clustering: edges >= this merge "
                        "clusters, [threshold, this) only attach leaves")
    p.add_argument("--two-tier", action="store_true",
                   help="with --labels: learn BOTH thresholds (attach precision-"
                        "targeted, core recall-anchored) instead of one")
    p.add_argument("--labels", help="optional labelled pairs parquet -> learn threshold (L5)")
    p.add_argument("--text-only-scan", action="store_true",
                   help="read spans without media_ref (text-plane subset schema)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("merge_machine_spark.resolve").getOrCreate()
    from merge_machine_spark.functions.textproj import read_documents_text_only
    from merge_machine_spark.plans.calibration import learn_resolve_threshold
    from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
    from merge_machine_spark.sources.synth import generate_documents

    if args.synth:
        docs = generate_documents(spark, args.synth, seed=42).select("doc_id", "spans")
    elif args.input:
        docs = (
            read_documents_text_only(spark, args.input)
            if args.text_only_scan
            else spark.read.parquet(args.input)
        )
    else:
        p.error("one of --input / --synth is required")

    cfg = ResolveConfig(threshold=args.threshold)
    cfg.core_threshold = args.core_threshold
    if args.labels:
        labels = spark.read.parquet(args.labels)
        if args.two_tier:
            from merge_machine_spark.plans.calibration import learn_resolve_thresholds

            attach, core, metrics = learn_resolve_thresholds(spark, docs, labels, cfg)
            cfg.threshold = float(attach)
            cfg.core_threshold = float(core)
            print(json.dumps({"learned_threshold": attach, "learned_core_threshold": core,
                              **metrics}), file=sys.stderr)
        else:
            th, metrics = learn_resolve_threshold(spark, docs, labels, cfg)
            cfg.threshold = float(th)
            print(json.dumps({"learned_threshold": th, **metrics}), file=sys.stderr)

    t0 = time.time()
    res = resolve(spark, docs, cfg, checkpoint_dir=args.checkpoint_dir, run_id=args.run_id)
    res["cluster_assignments"].write.mode("overwrite").parquet(f"{args.output}/cluster_assignments")
    n = spark.read.parquet(f"{args.output}/cluster_assignments").count()
    print(json.dumps({"rows": n, "wall_sec": round(time.time() - t0, 1),
                      "threshold": cfg.threshold, "core_threshold": cfg.core_threshold}))
    spark.stop()


if __name__ == "__main__":
    main()
