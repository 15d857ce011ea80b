"""Deterministic hash-based sampling and split assignment.

Training-data pipelines need splits and samples that are (a) reproducible
across runs and engines, (b) stable under re-partitioning and insertion
order, and (c) computable without any shuffle. All three rule out
``df.sample()`` / ``rand()``: this module keys every decision on a salted
md5 of the row's stable id, so the same row lands in the same bucket on
any engine that can compute md5 (the DuckDB oracles recompute it exactly).

Scale: the bucket expression is a pure projection inside WholeStageCodegen —
no shuffle, no state, no Python; a filter on it prunes before any join. Two
hash backends: md5 (engine-portable, used by the contract oracles) and
xxhash64 (JVM-native fast path — md5/sha go through a synchronized
java.security.Provider lookup that serializes thread-parallel executors, so
prefer xxhash64 when the assignment doesn't need cross-engine replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 100


def hash_bucket(
    id_col: Column | str, salt: str, n_buckets: int = N_BUCKETS, algo: str = "md5"
) -> Column:
    """Deterministic bucket in [0, n_buckets).

    ``algo='md5'`` (default): first 8 hex digits of md5(salt || ':' || id)
    as an integer, mod n_buckets — reproducible bit-for-bit on any ANSI
    engine (the DuckDB oracles recompute it), the right choice for split
    assignments that must survive an engine migration.

    ``algo='xxhash64'``: JVM-native, an order of magnitude faster and free
    of the java.security.Provider synchronization that makes md5/sha a
    thread-parallel bottleneck — the right choice for hot-path sampling at
    scale when cross-engine replay isn't required. Same determinism
    guarantees (salted, id-keyed, partition-order-free); different bucket
    assignment than md5."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if algo == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), c.cast("string")), F.lit(n_buckets))
    if algo != "md5":
        raise ValueError(f"unknown hash_bucket algo: {algo!r}")
    h = F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_buckets))


def train_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    salt: str = "split",
) -> DataFrame:
    """Adds ``bucket`` (0-99) and ``split`` ('train'/'test'). Buckets below
    ``train_pct`` are train — so the split is monotone in train_pct: growing
    the train share never moves a row OUT of train (stable curricula)."""
    b = hash_bucket(id_col, salt)
    return df.withColumn("bucket", b).withColumn(
        "split", F.when(F.col("bucket") < F.lit(train_pct), F.lit("train")).otherwise(F.lit("test"))
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff its hash bucket falls below its stratum's rate
    (percent). Deterministic per-stratum downsampling — e.g. rebalance a
    language mix without a shuffle or a count pass. Unknown strata fall
    back to ``default_pct``."""
    rate = F.lit(default_pct)
    for k, v in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(rate)
    return df.filter(hash_bucket(id_col, salt) < rate)
