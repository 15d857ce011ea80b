"""Generate checked-in golden tables for the two remaining rows-only
contract entries (r3 verdict next-round #2): ``minhash_lsh_pairs`` and
``ann_lsh_top3`` — the gen_golden_french.py technique (generate once,
sha256-pin, compare in pytest) applied to the xxhash64-family queries no
external SQL engine can replicate.

Unlike the French golden (independent pure-Python reimplementation), these
goldens are REGRESSION pins: the values come from the Spark queries
themselves over the frozen sf0.001 fixtures, canonicalized (sorted rows,
fixed row groups, no timestamps) so regeneration is byte-stable — run this
script 3x and the sha256 must not move. Both queries are fully
deterministic: xxhash64 is a pure function, the cosine fold in
``F.aggregate`` is sequential per row, ranks tie-break on c_id, and bucket
caps compare exact counts. What the pin buys: any change to the MinHash
banding, bucket capping, hyperplane derivation or multiprobe logic shows up
as a hash mismatch in pytest instead of silently shifting candidates.

Usage: python scripts/gen_golden_lsh.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def sha256(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main() -> None:
    import __spark_entry__ as entrymod
    from merge_machine_spark.sources.session import get_spark

    spark = get_spark("gen_golden_lsh", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    # -- minhash_lsh_pairs: (id_a, id_b) candidate set --------------------
    rows = sorted(
        (r["id_a"], r["id_b"]) for r in qs["minhash_lsh_pairs"](spark, SF_DIR).collect()
    )
    mh = pa.table({
        "id_a": pa.array([a for a, _ in rows], pa.string()),
        "id_b": pa.array([b for _, b in rows], pa.string()),
    })
    mh_path = os.path.join(GOLDEN_DIR, "minhash_lsh_pairs_sf0001.parquet")
    pq.write_table(mh, mh_path, compression="snappy", row_group_size=65536)
    print(f"minhash_lsh_pairs: {mh.num_rows} rows sha256={sha256(mh_path)}")

    # -- ann_lsh_top3: (q_id, rank) -> c_id, cos --------------------------
    arows = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["cos"])
        for r in qs["ann_lsh_top3"](spark, SF_DIR).collect()
    )
    ann = pa.table({
        "q_id": pa.array([r[0] for r in arows], pa.int64()),
        "rank": pa.array([r[1] for r in arows], pa.int32()),
        "c_id": pa.array([r[2] for r in arows], pa.int64()),
        "cos": pa.array([r[3] for r in arows], pa.float64()),
    })
    ann_path = os.path.join(GOLDEN_DIR, "ann_lsh_top3_sf0001.parquet")
    pq.write_table(ann, ann_path, compression="snappy", row_group_size=65536)
    print(f"ann_lsh_top3: {ann.num_rows} rows sha256={sha256(ann_path)}")
    spark.stop()


if __name__ == "__main__":
    main()
