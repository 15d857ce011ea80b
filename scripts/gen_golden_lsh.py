"""Generate checked-in golden tables for the two remaining rows-only
contract entries (r3 verdict next-round #2): ``minhash_lsh_pairs`` and
``ann_lsh_top3`` — the gen_golden_french.py technique (generate once,
sha256-pin, compare in pytest) applied to the xxhash64-family queries no
external SQL engine can replicate.

Unlike the French golden (independent pure-Python reimplementation), these
goldens are REGRESSION pins: the values come from the Spark queries
themselves over the frozen sf0.001 fixtures, canonicalized (sorted rows,
fixed row groups, no timestamps) so regeneration is byte-stable — proven in
CI by ``tests/test_golden_lsh.py::test_golden_regeneration_byte_stable``,
which rebuilds both tables in-session and asserts sha256 equality with the
checked-in files (r4 verdict next-round #3). Both queries are fully
deterministic: xxhash64 is a pure function, the cosine fold in
``F.aggregate`` is sequential per row, ranks tie-break on c_id, and bucket
caps compare exact counts. What the pin buys: any change to the MinHash
banding, bucket capping, hyperplane derivation or multiprobe logic shows up
as a hash mismatch in pytest instead of silently shifting candidates.

Each golden additionally carries a ``generator_source_sha256`` in its
parquet schema metadata — a fingerprint over ``inspect.getsource`` of the
exact functions that generate it (the entry wrapper plus the operator-level
algorithm functions it calls). ``test_golden_lsh.py`` asserts the stored
fingerprint equals the live one, so a legitimate algorithm change forces a
CONSCIOUS regeneration with this script rather than surfacing as a
confusing value mismatch (r4 verdict next-round #6, the versioned
scaling-input-cache pattern from r3 ADVICE). The fingerprint hashes raw
source, so comment-only edits to those functions also force a regeneration
— accepted: the functions are small and regeneration is seconds.

Usage: python scripts/gen_golden_lsh.py
"""

from __future__ import annotations

import hashlib
import inspect
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
SOURCE_META_KEY = b"generator_source_sha256"


def sha256_file(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _source_fingerprint(funcs) -> str:
    """sha256 over the concatenated ``inspect.getsource`` of the functions
    that generate a golden, in a fixed order — the golden's version tag.
    Plain strings pass through verbatim: value-affecting module CONSTANTS
    (e.g. the IVF fixed-point scale) live outside any function's source and
    must be versioned explicitly or editing them would skip the
    regenerate-consciously guard and surface as a raw value mismatch."""
    blob = "\n".join(f if isinstance(f, str) else inspect.getsource(f) for f in funcs)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def minhash_fingerprint() -> str:
    import __spark_entry__ as entrymod
    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.operators import blocking as B

    return _source_fingerprint(
        [
            entrymod.q_minhash_lsh_pairs,
            B.lsh_candidate_pairs,
            B.lsh_band_table,
            B.lsh_bands,
            B.minhash_signature,
            A.n_grams,
            A.n_grams_fast,
        ]
    )


def ann_fingerprint() -> str:
    import __spark_entry__ as entrymod
    from merge_machine_spark.operators import ann as ANN

    return _source_fingerprint(
        [
            entrymod.q_ann_lsh_top3,
            ANN.lsh_topk,
            ANN.hyperplane_bucket,
            ANN._hyperplane_sign,
            ANN.cosine_embeddings,
        ]
    )


def ivf_fingerprint() -> str:
    import __spark_entry__ as entrymod
    from merge_machine_spark.operators import ann as ANN

    return _source_fingerprint(
        [
            entrymod.q_ann_ivf_top3,
            ANN.ivf_topk,
            ANN.ivf_train_centroids,
            ANN._nearest_cells,
            ANN.cosine_embeddings,
            f"_IVF_FIXED_POINT={ANN._IVF_FIXED_POINT!r}",
        ]
    )


def build_minhash_table(spark) -> pa.Table:
    """Run the live minhash_lsh_pairs query at sf0.001 and canonicalize to
    the golden layout: (id_a, id_b) sorted, source fingerprint in metadata."""
    import __spark_entry__ as entrymod

    rows = sorted(
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["minhash_lsh_pairs"](spark, SF_DIR).collect()
    )
    table = pa.table({
        "id_a": pa.array([a for a, _ in rows], pa.string()),
        "id_b": pa.array([b for _, b in rows], pa.string()),
    })
    return table.replace_schema_metadata({SOURCE_META_KEY: minhash_fingerprint().encode()})


def build_ann_table(spark) -> pa.Table:
    """Run the live ann_lsh_top3 query at sf0.001 and canonicalize to the
    golden layout: (q_id, rank, c_id, cos) sorted, fingerprint in metadata."""
    import __spark_entry__ as entrymod

    arows = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["cos"])
        for r in entrymod.queries()["ann_lsh_top3"](spark, SF_DIR).collect()
    )
    table = pa.table({
        "q_id": pa.array([r[0] for r in arows], pa.int64()),
        "rank": pa.array([r[1] for r in arows], pa.int32()),
        "c_id": pa.array([r[2] for r in arows], pa.int64()),
        "cos": pa.array([r[3] for r in arows], pa.float64()),
    })
    return table.replace_schema_metadata({SOURCE_META_KEY: ann_fingerprint().encode()})


def build_ivf_table(spark) -> pa.Table:
    """Run the live ann_ivf_top3 query at sf0.001 and canonicalize to the
    golden layout: (q_id, rank, c_id, cos) sorted, fingerprint in metadata.
    Byte-stability rests on the quantizer's determinism: xxhash64-seeded
    centroids, fixed-point long Lloyd sums (associative regardless of
    shuffle combine order), tie-broken windows."""
    import __spark_entry__ as entrymod

    arows = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["cos"])
        for r in entrymod.queries()["ann_ivf_top3"](spark, SF_DIR).collect()
    )
    table = pa.table({
        "q_id": pa.array([r[0] for r in arows], pa.int64()),
        "rank": pa.array([r[1] for r in arows], pa.int32()),
        "c_id": pa.array([r[2] for r in arows], pa.int64()),
        "cos": pa.array([r[3] for r in arows], pa.float64()),
    })
    return table.replace_schema_metadata({SOURCE_META_KEY: ivf_fingerprint().encode()})


def write_golden(table: pa.Table, path: str) -> None:
    """Fixed writer settings — any byte drift between regenerations must come
    from the data or the fingerprint, never the container encoding."""
    pq.write_table(table, path, compression="snappy", row_group_size=65536)


def main() -> None:
    from merge_machine_spark.sources.session import get_spark

    spark = get_spark("gen_golden_lsh", cores=8, shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    mh = build_minhash_table(spark)
    mh_path = os.path.join(GOLDEN_DIR, "minhash_lsh_pairs_sf0001.parquet")
    write_golden(mh, mh_path)
    print(f"minhash_lsh_pairs: {mh.num_rows} rows sha256={sha256_file(mh_path)}")

    ann = build_ann_table(spark)
    ann_path = os.path.join(GOLDEN_DIR, "ann_lsh_top3_sf0001.parquet")
    write_golden(ann, ann_path)
    print(f"ann_lsh_top3: {ann.num_rows} rows sha256={sha256_file(ann_path)}")

    ivf = build_ivf_table(spark)
    ivf_path = os.path.join(GOLDEN_DIR, "ann_ivf_top3_sf0001.parquet")
    write_golden(ivf, ivf_path)
    print(f"ann_ivf_top3: {ivf.num_rows} rows sha256={sha256_file(ivf_path)}")
    spark.stop()


if __name__ == "__main__":
    main()
