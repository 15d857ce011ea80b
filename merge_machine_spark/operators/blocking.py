"""Candidate generation (blocking) — the DataFrame-native replacement for the
reference's Elasticsearch inverted-index retrieval.

In the reference, a ``match`` clause retrieves every ref doc sharing >=1
analyzed token with the query text (/root/reference/merge_machine/helpers.py:117-127,
executed inside ES). Here that is literally an equi-join of exploded token
tables: ``explode(tokens)`` both sides -> hash join on token -> distinct
(id_a, id_b).

Scale levers (north rule: partitioning / shuffle / skew handled explicitly):

* **df-cap**: tokens with document frequency above ``max_df`` are dropped
  before the join (a token shared by millions of docs generates a quadratic
  pair blow-up while carrying ~zero IDF signal — this mirrors what BM25's IDF
  does to stopword-like terms, except we refuse to *generate* the pairs at
  all). Dropped mass is reported, never silent.
* **salting**: surviving hot keys are split into ``n_salt`` sub-keys
  (replicate the smaller side per salt) so no single join partition holds a
  mega-block. AQE skew-join remains on as a backstop.
* **self-join canonicalization**: symmetric dedup blocks emit each pair once
  (``id_a < id_b``), halving work.
* **MinHash/LSH**: banded min-hash over token/3-gram sets as an additional
  candidate channel — pure SQL (``xxhash64`` per seed), no UDF, no mllib.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# token tables
# ---------------------------------------------------------------------------
def explode_tokens(df: DataFrame, id_col: str, tokens: Column, with_tf: bool = False) -> DataFrame:
    """(id, tokens array) -> long table (id, token[, tf]).

    ``with_tf`` keeps the within-document term frequency (needed for TF-IDF
    cosine); blocking proper only needs distinct (id, token).
    """
    out = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("token"))
    if with_tf:
        return out.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    return out.distinct()


def document_frequency(tokens: DataFrame) -> DataFrame:
    """(id, token) -> (token, df). One shuffle on token; partial aggregation
    is map-side (Spark hash aggregate) so hot tokens don't skew this step."""
    return tokens.groupBy("token").agg(F.countDistinct("id").alias("df"))


@dataclass
class BlockingReport:
    """What the df-cap dropped — per north rule, capping is never silent."""

    channel: str = ""
    max_df: int | None = None
    n_tokens_dropped: int = 0
    dropped_mass: int = 0  # sum of df over dropped tokens (≈ rows not joined)
    hot_tokens_salted: int = 0
    extras: dict = field(default_factory=dict)


def cap_document_frequency(
    tokens: DataFrame, max_df: int, report: BlockingReport | None = None, df_table: DataFrame | None = None
) -> DataFrame:
    """Drop tokens whose document frequency exceeds ``max_df``."""
    dfreq = df_table if df_table is not None else document_frequency(tokens)
    keep = dfreq.filter(F.col("df") <= F.lit(max_df))
    if report is not None:
        dropped = dfreq.filter(F.col("df") > F.lit(max_df)).agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("df"), F.lit(0)).alias("mass")
        ).collect()[0]
        report.max_df = max_df
        report.n_tokens_dropped = int(dropped["n"])
        report.dropped_mass = int(dropped["mass"])
    # broadcast-join when the surviving vocabulary is small is Catalyst's
    # call (AQE); we only express the semi-join.
    return tokens.join(keep.select("token"), "token", "left_semi")


def salted_token_join(
    left: DataFrame,
    right: DataFrame,
    n_salt: int = 8,
    hot_df_threshold: int = 1024,
    df_table: DataFrame | None = None,
    report: BlockingReport | None = None,
) -> DataFrame:
    """Equi-join (token) -> (id_a, id_b), with explicit salting of hot keys.

    Keys with df > ``hot_df_threshold`` (on the right side) are split: the
    left row picks one of ``n_salt`` sub-keys deterministically from its id
    hash; every right row is replicated across all sub-keys. Cold keys join
    plainly. Result partitions are bounded by max(df)/n_salt.
    """
    dfreq = df_table if df_table is not None else document_frequency(right)
    hot = dfreq.filter(F.col("df") > F.lit(hot_df_threshold)).select("token")
    if report is not None:
        report.hot_tokens_salted = hot.count()
    left_h = left.join(F.broadcast(hot), "token", "left_semi")
    left_c = left.join(F.broadcast(hot), "token", "left_anti")
    right_h = right.join(F.broadcast(hot), "token", "left_semi")
    right_c = right.join(F.broadcast(hot), "token", "left_anti")

    cold = left_c.alias("a").join(right_c.alias("b"), "token")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    right_rep = right_h.withColumn("salt", salts)
    left_salted = left_h.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(n_salt)).cast("int"))
    hot_joined = left_salted.alias("a").join(right_rep.alias("b"), ["token", "salt"]).drop("salt")
    pick = lambda j: j.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "token")
    return pick(cold).unionByName(pick(hot_joined))


# ---------------------------------------------------------------------------
# candidate pairs
# ---------------------------------------------------------------------------
def candidate_pairs(
    tokens_a: DataFrame,
    tokens_b: DataFrame | None = None,
    max_df: int | None = 256,
    n_salt: int = 8,
    hot_df_threshold: int = 1024,
    report: BlockingReport | None = None,
) -> DataFrame:
    """Blocking join: docs sharing >=1 surviving token become a candidate pair.

    ``tokens_b=None`` -> symmetric self-join (dedup/clustering mode): pairs
    canonicalized ``id_a < id_b``. Otherwise asymmetric linkage mode
    (source -> ref), all (source id, ref id) pairs.
    Output: (id_a, id_b, n_shared) — n_shared = number of shared tokens,
    a free by-product useful as a crude score / prefilter.
    """
    self_join = tokens_b is None
    dfreq = document_frequency(tokens_a if self_join else tokens_a.unionByName(tokens_b))
    ta = tokens_a
    tb = tokens_a if self_join else tokens_b
    if max_df is not None:
        ta = cap_document_frequency(ta, max_df, report=report, df_table=dfreq)
        tb = ta if self_join else cap_document_frequency(tb, max_df, df_table=dfreq)
    if max_df is not None and hot_df_threshold > max_df:
        # cap-then-salt is mutually exclusive here: every surviving token has
        # df <= max_df < hot_df_threshold, so the salted path could never
        # trigger — join plainly instead of paying its dead semi/anti stages.
        # Salting is the skew defense for UNCAPPED joins (max_df=None).
        joined = (
            ta.alias("a").join(tb.alias("b"), "token")
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "token")
        )
    else:
        joined = salted_token_join(
            ta, tb, n_salt=n_salt, hot_df_threshold=hot_df_threshold, df_table=dfreq, report=report
        )
    if self_join:
        joined = joined.filter(F.col("id_a") < F.col("id_b"))
    return joined.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared"))


# ---------------------------------------------------------------------------
# MinHash / LSH channel
# ---------------------------------------------------------------------------
def minhash_signature(tokens: Column, num_hashes: int) -> Column:
    """array<string> -> array<bigint> min-hash signature.

    Hash family i (i in 0..num_hashes-1) is ``xxhash64(token, i)`` — pure SQL,
    JVM-side, no UDF (SURVEY.md §2.11). Empty token sets get an empty
    signature (no LSH candidates), not nulls.
    """
    return F.when(F.size(tokens) > 0, F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(tokens, lambda t: F.xxhash64(t, i))),
    )).otherwise(F.array().cast("array<bigint>"))


def lsh_bands(df: DataFrame, id_col: str, sig_col: str, bands: int, rows: int) -> DataFrame:
    """Signature -> (id, band, band_hash): one row per band, band_hash =
    xxhash64 of the band's slice. Candidates = docs equal on any band."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.transform(
                    F.slice(F.col(sig_col), b * rows + 1, rows), lambda v: v.cast("string")
                ))),
            )
        ).alias("band", "band_hash"),
    )


def lsh_band_table(df: DataFrame, id_col: str, tokens: Column, bands: int, rows: int) -> DataFrame:
    """(id, band, band_hash) built from the exploded token table.

    Equivalent bucketing to :func:`minhash_signature` + :func:`lsh_bands`
    (two docs collide iff their per-band min-hash slices are equal) but
    computed as ONE hash-aggregate over (id, token) with ``bands*rows``
    ``min(xxhash64(token, i))`` aggregates — Catalyst codegens that into a
    tight loop, where the nested-HOF signature expression cost ~seconds of
    analysis per query and re-hashed every token ``bands*rows`` times inside
    a per-row lambda. Docs with zero tokens vanish at the explode (no
    all-empty collision bucket).

    No per-(id, token) ``distinct`` before the aggregate (r6, guide §2.4):
    ``min`` is insensitive to duplicate tokens, so deduping first only added
    a full exchange + two aggregate passes over the exploded table (~15M
    rows at sf1.0) for bit-identical signatures. The groupBy(id) partial
    aggregation collapses each map partition to its doc count before the
    only remaining exchange."""
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("token"))
    num = bands * rows
    aggs = [F.min(F.xxhash64(F.col("token"), F.lit(i))).alias(f"_h{i}") for i in range(num)]
    sig = tok.groupBy("id").agg(*aggs)
    band_hashes = F.array(
        *[F.xxhash64(*[F.col(f"_h{b * rows + r}") for r in range(rows)]) for b in range(bands)]
    )
    return sig.select("id", F.posexplode(band_hashes).alias("band", "band_hash"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    bands: int = 16,
    rows: int = 4,
    max_bucket: int = 512,
    report: BlockingReport | None = None,
) -> DataFrame:
    """MinHash-LSH self-join channel: shingle/token sets whose Jaccard is
    high collide on >=1 band with high probability. ``max_bucket`` caps
    pathological buckets (all-identical boilerplate) the same way df-cap
    bounds token blocks."""
    bandtab = lsh_band_table(df, id_col, tokens, bands, rows)
    # Materialize the band table ONCE (r6, guide §2.4/§5): it feeds the
    # bucket-size aggregate AND both sides of the self-join, and without a
    # checkpoint Catalyst re-evaluates the whole explode + bands*rows
    # min-hash aggregate subtree (the expensive part — n-gram analysis of
    # every doc) up to 3x per run. localCheckpoint truncates lineage within
    # this one query evaluation; each call builds a fresh DataFrame, so
    # nothing persists across bench runs. The table is small: bands rows
    # per doc of (id, int, long).
    bandtab = bandtab.localCheckpoint(eager=False)
    sizes = bandtab.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("bucket_n"))
    if report is not None:
        dropped = sizes.filter(F.col("bucket_n") > max_bucket).agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("bucket_n"), F.lit(0)).alias("mass")
        ).collect()[0]
        report.extras["lsh_buckets_dropped"] = int(dropped["n"])
        report.extras["lsh_dropped_mass"] = int(dropped["mass"])
    ok = bandtab.join(sizes.filter(F.col("bucket_n") <= max_bucket), ["band", "band_hash"], "left_semi")
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs
