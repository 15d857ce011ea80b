"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship entity-resolution pipeline of
``merge_machine_spark`` over the driver's sf0.001 documents table (wrapped
into the interleaved-span shape of BASELINE.json input_hint).

``queries()``/``oracle_sql()`` expose one entry per implemented operator
family from SURVEY.md §2, executable at any sf_dir, with ANSI-SQL DuckDB
oracles. Determinism rules used throughout (so value hashes match):
  * no float *aggregations* — sums/means go through exact DECIMAL and only
    then into scalar double arithmetic (identical IEEE results);
  * ratios exposed as integer-scaled values via integer division;
  * every top-k has a total tie-break order;
  * timestamps/dates stringified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared building blocks (Spark side)
# ---------------------------------------------------------------------------
_TOKEN_SPLIT = r"[^a-z0-9]+"


def _ev_us(col: str) -> "F.Column":
    """tz-independent epoch-microseconds (parity with DuckDB epoch_us)."""
    from merge_machine_spark.operators.temporal import epoch_us

    return epoch_us(col)


def _tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, token) distinct — J1's exploded token table (SURVEY §2.3).

    r6 (guide §2.4 "remove shuffles outright"): duplicates of (doc_id,
    token) can only come from WITHIN one document (doc_id is part of the
    key), so per-doc ``array_distinct`` before the explode produces the
    exact global-distinct row set with ZERO exchanges — the r5 shape paid a
    full shuffle + two aggregate passes over the exploded table (~2.6M rows
    at sf1.0) for the same rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT)
    arr = F.array_distinct(F.filter(toks, lambda t: t != F.lit("")))
    # the driver parquet is one row group -> single-task scan; spreading the
    # 50k doc rows (~16 MiB exchange) parallelizes the explode 32x
    return (
        docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.col("doc_id"), F.explode(arr).alias("token"))
    )


def _block_keys(spark, sf_dir) -> DataFrame:
    """(doc_id, k): first-2-token blocking key (F1-style normalized key)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT)
    toks = F.filter(toks, lambda t: t != F.lit(""))
    return docs.select(F.col("doc_id"), F.array_join(F.slice(toks, 1, 2), " ").alias("k"))


def _block_pairs(spark, sf_dir) -> DataFrame:
    """(id_a, id_b, k): symmetric self-join blocking, canonical id_a < id_b.

    The probe (a) side is repartitioned by doc_id BEFORE the broadcast join
    (r6, guide §2.4/§2.5): the driver ``documents`` parquet is a single file,
    so without it the whole join probe — and everything downstream of the
    pair table — runs in ONE task pinned to the scan layout. Spreading the
    50k-row KEYS table (~1 MiB exchange) instead of the 1.4M-row pair table
    with both texts (~800 MiB exchange, the r5 shape) parallelizes pair
    generation AND leaves the pair plane hash-distributed by id_a, which
    downstream windows/aggregations reuse without another exchange."""
    keys = _block_keys(spark, sf_dir)
    a = (
        keys.repartition(spark.sparkContext.defaultParallelism * 4, "doc_id")
        .select(F.col("doc_id").alias("id_a"), "k")
    )
    b = keys.select(F.col("doc_id").alias("id_b"), "k")
    return a.join(F.broadcast(b), "k").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "k")


_SQL_TOKENS = """
SELECT DISTINCT doc_id, token
FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+')) AS token
      FROM documents)
WHERE token <> ''
"""

_SQL_BLOCK_KEYS = """
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'),
                                   t -> t <> '')[1:2], ' ') AS k
FROM documents
"""

_SQL_BLOCK_PAIRS = f"""
WITH keys AS ({_SQL_BLOCK_KEYS})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.k AS k
FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def q_scan_clean_project(spark, sf_dir):
    """S1/S2/P1/P7: scan + trim clean + many-to-one column concat."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.trim(F.col("text")).alias("text_clean"),
        F.concat_ws(" ", F.coalesce("lang", F.lit("")), F.coalesce("source", F.lit(""))).alias("meta"),
    )


SQL_SCAN = """
SELECT doc_id, trim(text) AS text_clean,
       concat_ws(' ', coalesce(lang,''), coalesce(source,'')) AS meta
FROM documents WHERE n_chars > 0
"""


def q_special_keyword(spark, sf_dir):
    """F1 special_keyword: char-map + keyword tokenizer + lowercase
    (reference analyzers, no_resource_analyzer_definitions.py:105-119)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.lower(F.translate(F.col("text"), "-éèêëàü", " eeeeau")).alias("norm_key")
    )


SQL_SPECIAL_KEYWORD = """
SELECT doc_id, lower(translate(text, '-éèêëàü', ' eeeeau')) AS norm_key FROM documents
"""


def q_tokens_standard(spark, sf_dir):
    """F8 standard analyzer: token explode, the inverted-index table."""
    return _tokens(spark, sf_dir)


def q_token_doc_frequency(spark, sf_dir):
    """Materialized document frequency (the IDF input Lucene gave the
    reference for free — SURVEY §2.4 'new in our engine')."""
    return _tokens(spark, sf_dir).groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))


SQL_TOKEN_DF = f"""
SELECT token, count(*) AS n_docs FROM ({_SQL_TOKENS}) GROUP BY token
"""


def q_top_tokens_per_doc(spark, sf_dir):
    """J5/W1/W2 top-k window: 3 rarest-then-most-frequent tokens per doc,
    ranked by (tf desc, global df asc, token) — the TF-IDF ordering with
    integer keys only (no float ambiguity)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT)
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = _tokens(spark, sf_dir).groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("n_docs"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "n_docs", "rank")
    )


SQL_TOP_TOKENS = f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+')) AS token
        FROM documents)
  WHERE token <> '' GROUP BY doc_id, token
), dfreq AS (SELECT token, count(*) AS n_docs FROM ({_SQL_TOKENS}) GROUP BY token)
SELECT doc_id, token, tf, n_docs, rank FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.n_docs,
         row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.n_docs ASC, tf.token ASC) AS rank
  FROM tf JOIN dfreq USING (token)
) WHERE rank <= 3
"""


def q_exact_dedup_groups(spark, sf_dir):
    """A1/A2 + training-data exact dedup: groups at the blocking key with
    >1 member; representative = min doc_id."""
    keys = _block_keys(spark, sf_dir)
    return (
        keys.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


SQL_EXACT_DEDUP = f"""
WITH keys AS ({_SQL_BLOCK_KEYS})
SELECT k, count(*) AS n_dups, min(doc_id) AS keep_id FROM keys GROUP BY k HAVING count(*) > 1
"""


def q_blocking_pairs(spark, sf_dir):
    """J1/J7: symmetric self-join blocking, canonical pairs."""
    return _block_pairs(spark, sf_dir)


def q_pair_token_jaccard(spark, sf_dir):
    """A6/U3 token-overlap scoring over blocked pairs; jaccard integer-scaled
    (x1e6, integer division) to stay float-free."""
    pairs = _block_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT)
    arr = F.array_distinct(F.filter(toks, lambda t: t != F.lit("")))
    # r6 (guide §2.3/§2.4): the r5 shape materialized the distinct (doc_id,
    # token) table FOUR times (2 exchanges each) and ran the intersection as
    # a token-exploded pair join (~55M rows at sf1.0) + groupBy + a pair-
    # level SortMergeJoin. Intersection sizes over per-doc distinct-token
    # ARRAYS are the same numbers computed in one codegen projection: the
    # doc->array table broadcasts (~15 MiB at sf1.0) and the pair plane never
    # shuffles. Docs with zero tokens are excluded exactly like the r5 inner
    # join against the sizes table (size(toks) > 0 <=> the doc had a row).
    tokarr = docs.select("doc_id", arr.alias("_toks")).filter(F.size("_toks") > 0)
    ta = tokarr.select(F.col("doc_id").alias("id_a"), F.col("_toks").alias("_ta"))
    tb = tokarr.select(F.col("doc_id").alias("id_b"), F.col("_toks").alias("_tb"))
    j = (
        pairs.join(F.broadcast(ta), "id_a")
        .join(F.broadcast(tb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_ta", "_tb")).cast("bigint").alias("inter"),
            (F.size("_ta") + F.size("_tb") - F.size(F.array_intersect("_ta", "_tb")))
            .cast("bigint")
            .alias("union_n"),
        )
    )
    return j.select(
        "id_a", "id_b", "inter", "union_n", F.expr("(inter * 1000000) div union_n").alias("jaccard_e6")
    )


SQL_PAIR_JACCARD = f"""
WITH pairs AS ({_SQL_BLOCK_PAIRS}), tok AS ({_SQL_TOKENS}),
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS inter
  FROM pairs p JOIN tok a ON a.doc_id = p.id_a JOIN tok b ON b.doc_id = p.id_b AND b.token = a.token
  GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b, coalesce(i.inter, 0) AS inter,
       sa.n + sb.n - coalesce(i.inter, 0) AS union_n,
       (coalesce(i.inter, 0) * 1000000) // (sa.n + sb.n - coalesce(i.inter, 0)) AS jaccard_e6
FROM pairs p LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
"""


def q_pair_levenshtein_top1(spark, sf_dir):
    """J5/W1 + edit distance: best (lowest-distance) partner per id_a among
    blocked pairs.

    r6 shape (guide §4.2): the pair plane arrives pre-distributed by id_a
    from ``_block_pairs`` (the r5 explicit pair-level repartition shipped
    both full texts through an ~800 MiB exchange; now only the 1 MiB keys
    table is exchanged). The O(len_a*len_b) DP itself runs in a native C
    kernel (Myers bit-parallel, ~60x the JVM built-in's cell rate here) via
    ``mapInArrow``; exact-equivalence is pinned by tests and the DuckDB
    oracle. Falls back to the JVM built-in when no C compiler exists — the
    fallback inherits the id_a distribution, so the window still needs no
    extra exchange."""
    from merge_machine_spark.functions import native_sim

    pairs = _block_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    j = (
        pairs.join(F.broadcast(docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))), "id_a")
        .join(F.broadcast(docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))), "id_b")
    )
    if native_sim.have_native():
        j = j.mapInArrow(native_sim.lev_pairs_map_arrow, "id_a long, id_b long, lev int")
    else:
        j = j.select("id_a", "id_b", F.levenshtein("ta", "tb").alias("lev"))
    w = Window.partitionBy("id_a").orderBy(F.asc("lev"), F.asc("id_b"))
    return j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("id_a", "id_b", "lev")


SQL_LEV_TOP1 = f"""
WITH pairs AS ({_SQL_BLOCK_PAIRS}),
j AS (SELECT p.id_a, p.id_b, levenshtein(a.text, b.text) AS lev
      FROM pairs p JOIN documents a ON a.doc_id = p.id_a JOIN documents b ON b.doc_id = p.id_b)
SELECT id_a, id_b, lev FROM (
  SELECT id_a, id_b, lev, row_number() OVER (PARTITION BY id_a ORDER BY lev ASC, id_b ASC) AS rn FROM j
) WHERE rn = 1
"""


def q_pair_jaro_winkler(spark, sf_dir):
    """North-rule similarity feature (Arrow pandas UDF) cross-checked against
    DuckDB's jaro_winkler_similarity; floor-scaled x1e4."""
    from merge_machine_spark.functions.similarity import jaro_winkler

    pairs = _block_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # pairs arrive pre-distributed by id_a from _block_pairs (r6) — the r5
    # pair-level repartition shipped both texts through the exchange; now the
    # Arrow JW batches parallelize with no pair-plane shuffle at all.
    j = (
        pairs.join(F.broadcast(docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))), "id_a")
        .join(F.broadcast(docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))), "id_b")
    )
    return j.select(
        "id_a", "id_b", F.floor(jaro_winkler(F.col("ta"), F.col("tb")) * 10000).cast("bigint").alias("jw_e4")
    )


SQL_JARO_WINKLER = f"""
WITH pairs AS ({_SQL_BLOCK_PAIRS})
SELECT p.id_a, p.id_b,
       CAST(floor(jaro_winkler_similarity(a.text, b.text) * 10000) AS BIGINT) AS jw_e4
FROM pairs p JOIN documents a ON a.doc_id = p.id_a JOIN documents b ON b.doc_id = p.id_b
"""


def q_cascade_two_tier(spark, sf_dir):
    """J6 priority cascade / `_best_match` truth table (es_match.py:41-57)
    over events: tier1 = best 'purchase' value, tier2 = best 'click' value,
    threshold 150; first tier above threshold wins, else first tier with any
    hit."""
    ev = _t(spark, sf_dir, "events")
    t1 = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(F.max("value").alias("s1"))
    t2 = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.max("value").alias("s2"))
    j = t1.join(t2, "user_id", "full_outer")
    qid = (
        F.when(F.col("s1").isNotNull() & (F.col("s1") >= 150.0), F.lit(1))
        .when(F.col("s2").isNotNull() & (F.col("s2") >= 150.0), F.lit(2))
        .when(F.col("s1").isNotNull(), F.lit(1))
        .when(F.col("s2").isNotNull(), F.lit(2))
        .otherwise(F.lit(0))
    )
    best = (
        F.when(qid == 1, F.col("s1")).when(qid == 2, F.col("s2")).otherwise(F.lit(None).cast("double"))
    )
    is_match = (qid == 1) & (F.col("s1") >= 150.0) | (qid == 2) & (F.col("s2") >= 150.0)
    return j.select("user_id", qid.alias("query_id"), best.alias("best_value"), is_match.alias("is_match"))


SQL_CASCADE = """
WITH t1 AS (SELECT user_id, max(value) AS s1 FROM events WHERE event_type = 'purchase' GROUP BY user_id),
     t2 AS (SELECT user_id, max(value) AS s2 FROM events WHERE event_type = 'click' GROUP BY user_id),
     j AS (SELECT coalesce(t1.user_id, t2.user_id) AS user_id, s1, s2 FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id),
     p AS (SELECT user_id, s1, s2,
             CASE WHEN s1 IS NOT NULL AND s1 >= 150.0 THEN 1
                  WHEN s2 IS NOT NULL AND s2 >= 150.0 THEN 2
                  WHEN s1 IS NOT NULL THEN 1
                  WHEN s2 IS NOT NULL THEN 2 ELSE 0 END AS query_id
           FROM j)
SELECT user_id, query_id,
  CASE WHEN query_id = 1 THEN s1 WHEN query_id = 2 THEN s2 ELSE NULL END AS best_value,
  (coalesce(s1, -1e18) >= 150.0) OR (coalesce(s2, -1e18) >= 150.0) AS is_match
FROM p
"""


def q_confidence_scaling(spark, sf_dir):
    """A3 `_confidence_estimator` (es_match.py:59-76): confidence =
    1 + (score - thresh)/mean(score); mean built from an exact DECIMAL sum so
    both engines do identical double arithmetic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    stats = ev.agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = ev.crossJoin(stats)
    conf = F.lit(1.0) + (F.col("value") - F.lit(150.0)) / (F.col("s").cast("double") / F.col("n"))
    return j.select("event_id", "user_id", "value", F.floor(conf * 1000).cast("bigint").alias("confidence_e3"))


SQL_CONFIDENCE = """
WITH stats AS (SELECT sum(CAST(value AS DECIMAL(18,2))) AS s, count(*) AS n FROM events WHERE event_type = 'purchase')
SELECT event_id, user_id, value,
       CAST(floor((1.0 + (value - 150.0) / (CAST(s AS DOUBLE) / n)) * 1000) AS BIGINT) AS confidence_e3
FROM events, stats WHERE event_type = 'purchase'
"""


def q_must_not_filter(spark, sf_dir):
    """P3/P4 global must / must_not word filters."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").contains("spark") & F.col("text").contains("query") & ~F.col("text").contains("slow")
    ).select("doc_id", "lang", "source")


SQL_MUST_NOT = """
SELECT doc_id, lang, source FROM documents
WHERE text LIKE '%spark%' AND text LIKE '%query%' AND text NOT LIKE '%slow%'
"""


def q_exact_override_union(spark, sf_dir):
    """P5/P6/U1: 'labelled' exact pairs bypass scoring with sentinel 999
    (es_match.py:386); others keep their computed score; one unioned table."""
    pairs = _block_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    j = (
        pairs.join(docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb")), "id_b")
    )
    is_exact = (F.col("id_a") % 2 == 0) & (F.col("id_b") % 2 == 0)
    score = F.when(is_exact, F.lit(999000).cast("bigint")).otherwise(
        F.floor((F.lit(1.0) - F.levenshtein("ta", "tb") / F.greatest(F.length("ta"), F.length("tb"))) * 1000).cast("bigint")
    )
    return j.select("id_a", "id_b", is_exact.alias("is_exact"), score.alias("score_e3"))


SQL_EXACT_OVERRIDE = f"""
WITH pairs AS ({_SQL_BLOCK_PAIRS})
SELECT p.id_a, p.id_b,
       (p.id_a % 2 = 0 AND p.id_b % 2 = 0) AS is_exact,
       CASE WHEN p.id_a % 2 = 0 AND p.id_b % 2 = 0 THEN CAST(999000 AS BIGINT)
            ELSE CAST(floor((1.0 - levenshtein(a.text, b.text) / greatest(length(a.text), length(b.text))) * 1000) AS BIGINT)
       END AS score_e3
FROM pairs p JOIN documents a ON a.doc_id = p.id_a JOIN documents b ON b.doc_id = p.id_b
"""


def q_dedup_reattach(spark, sf_dir):
    """A1/J9: representative per blocking group computes once, result
    re-attached to every duplicate row."""
    keys = _block_keys(spark, sf_dir)
    w = Window.partitionBy("k")
    with_rep = keys.withColumn("rep_id", F.min("doc_id").over(w))
    rep_stats = _tokens(spark, sf_dir).groupBy("doc_id").agg(F.count(F.lit(1)).alias("rep_n_tokens"))
    return with_rep.join(
        rep_stats.withColumnRenamed("doc_id", "rep_id"), "rep_id", "left"
    ).select("doc_id", "rep_id", F.coalesce("rep_n_tokens", F.lit(0)).alias("rep_n_tokens"))


SQL_DEDUP_REATTACH = f"""
WITH keys AS ({_SQL_BLOCK_KEYS}),
reps AS (SELECT doc_id, k, min(doc_id) OVER (PARTITION BY k) AS rep_id FROM keys),
stats AS (SELECT doc_id, count(*) AS rep_n_tokens FROM ({_SQL_TOKENS}) GROUP BY doc_id)
SELECT r.doc_id, r.rep_id, coalesce(s.rep_n_tokens, 0) AS rep_n_tokens
FROM reps r LEFT JOIN stats s ON s.doc_id = r.rep_id
"""


def q_rolling_precision_curve(spark, sf_dir):
    """A4/W3 rolling precision curve (es_labeller.py:362-386 shape): events
    sorted by value desc; rolling precision of 'purchase' among top-ranked,
    integer-scaled."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy(F.desc("value"), F.asc("event_id")).rowsBetween(Window.unboundedPreceding, 0)
    ranked = ev.select(
        "event_id",
        F.row_number().over(Window.orderBy(F.desc("value"), F.asc("event_id"))).alias("rank"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w).alias("cum_purchase"),
    )
    return ranked.select(
        "event_id", "rank", "cum_purchase", F.expr("(cum_purchase * 1000000) div rank").alias("prec_e6")
    )


SQL_ROLLING = """
SELECT event_id, rank, CAST(cum_purchase AS BIGINT) AS cum_purchase,
       CAST((cum_purchase * 1000000) // rank AS BIGINT) AS prec_e6
FROM (
  SELECT event_id,
         row_number() OVER (ORDER BY value DESC, event_id ASC) AS rank,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (ORDER BY value DESC, event_id ASC ROWS UNBOUNDED PRECEDING) AS cum_purchase
  FROM events)
"""


def q_label_counters(spark, sf_dir):
    """A8 label counters: per-type counts + integer-scaled share."""
    ev = _t(spark, sf_dir, "events")
    total = ev.count()
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.expr(f"(count(1) * 1000000) div {total}").alias("share_e6")
    )


SQL_LABEL_COUNTERS = """
SELECT event_type, count(*) AS n,
       (count(*) * 1000000) // (SELECT count(*) FROM events) AS share_e6
FROM events GROUP BY event_type
"""


def q_lang_id(spark, sf_dir):
    """Training-data op: language-ID heuristic — stopword votes plus true
    character-n-gram occurrence counts (the mandate's 'n-gram heuristic'):
    occurrences of the English-discriminative bigram 'th' and trigram
    'ing' counted JVM-side via replace-length arithmetic, exactly
    replicable in SQL. (The synthetic text is language-invariant word soup,
    so the columns are the heuristic's FEATURES; no accuracy is claimed —
    the lang label rides along for downstream evaluation.)"""
    docs = _t(spark, sf_dir, "documents")
    txt = F.lower(F.coalesce(F.col("text"), F.lit("")))
    toks = F.split(txt, _TOKEN_SPLIT)
    en_hits = F.size(F.filter(toks, lambda t: (t == F.lit("the")) | (t == F.lit("a")) | (t == F.lit("of"))))
    n_tok = F.size(F.filter(toks, lambda t: t != F.lit("")))

    def occ(s: str):
        return (F.length(txt) - F.length(F.replace(txt, F.lit(s)))) / F.lit(len(s))

    return docs.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        n_tok.alias("n_tokens"),
        occ("th").cast("bigint").alias("ngram_th"),
        occ("ing").cast("bigint").alias("ngram_ing"),
        (en_hits * 1000 >= n_tok).alias("en_like"),
    )


SQL_LANG_ID = """
SELECT doc_id, lang,
  len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'),
                  t -> t IN ('the','a','of'))) AS en_hits,
  len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), t -> t <> '')) AS n_tokens,
  CAST((len(lower(coalesce(text,''))) - len(replace(lower(coalesce(text,'')), 'th', ''))) / 2 AS BIGINT) AS ngram_th,
  CAST((len(lower(coalesce(text,''))) - len(replace(lower(coalesce(text,'')), 'ing', ''))) / 3 AS BIGINT) AS ngram_ing,
  (len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), t -> t IN ('the','a','of'))) * 1000
     >= len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), t -> t <> ''))) AS en_like
FROM documents
"""


def q_quality_score(spark, sf_dir):
    """Training-data op: document quality features (length / mean word
    length / stopword ratio), integer-scaled."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT), lambda t: t != F.lit(""))
    n_tok = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_hits = F.size(F.filter(toks, lambda t: (t == F.lit("the")) | (t == F.lit("a"))))
    return docs.select(
        "doc_id",
        F.col("n_chars"),
        n_tok.alias("n_tokens"),
        F.expr("(aggregate(filter(split(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> ''), 0, (acc, x) -> acc + length(x)) * 1000) div greatest(size(filter(split(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '')), 1)").alias("mean_wlen_e3"),
        F.expr(
            "(size(filter(split(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x in ('the','a'))) * 1000000)"
            " div greatest(size(filter(split(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '')), 1)"
        ).alias("stop_ratio_e6"),
    )


SQL_QUALITY = """
WITH t AS (
  SELECT doc_id, n_chars,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, n_chars, len(toks) AS n_tokens,
  CAST((coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1000) // greatest(len(toks), 1) AS BIGINT) AS mean_wlen_e3,
  CAST((len(list_filter(toks, x -> x IN ('the','a'))) * 1000000) // greatest(len(toks), 1) AS BIGINT) AS stop_ratio_e6
FROM t
"""


# GPT-2-style pretokenizer shape (the "BPE-ish regex" of the task mandate):
# contraction suffixes, space-prefixed letter runs, space-prefixed digit
# runs, space-prefixed punctuation runs — over lowercased text, so the
# alternation is identical in Java (Spark) and RE2 (DuckDB) dialects.
_BPE_ISH = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"


def q_token_counts(spark, sf_dir):
    """Training-data op: token counting — whitespace, alpha/digit regex,
    and a BPE-ish GPT-2-pretokenizer count (the mandate's wording); the
    latter approximates the token count a BPE tokenizer's pretokenize pass
    would produce (each pretoken splits into >= 1 BPE pieces)."""
    docs = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    ws = F.size(F.filter(F.split(txt, r"\s+"), lambda t: t != F.lit("")))
    alpha = F.size(F.regexp_extract_all(F.lower(txt), F.lit("([a-z]+)"), 1))
    digit = F.size(F.regexp_extract_all(txt, F.lit("([0-9]+)"), 1))
    bpe = F.size(F.regexp_extract_all(F.lower(txt), F.lit(_BPE_ISH), 0))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), alpha.alias("alpha_tokens"),
        digit.alias("digit_tokens"), bpe.alias("bpe_ish_tokens"),
    )


SQL_TOKEN_COUNTS = f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'), t -> t <> '')) AS ws_tokens,
  len(regexp_extract_all(lower(coalesce(text,'')), '([a-z]+)', 1)) AS alpha_tokens,
  len(regexp_extract_all(coalesce(text,''), '([0-9]+)', 1)) AS digit_tokens,
  len(regexp_extract_all(lower(coalesce(text,'')), '{_BPE_ISH.replace("'", "''")}', 0)) AS bpe_ish_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Training-data op: document fingerprint (md5 over whitespace-normalized
    lowercase text) + duplicate-fingerprint count."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(norm)
    w = Window.partitionBy("fp")
    return docs.select("doc_id", fp.alias("fp")).withColumn("fp_count", F.count(F.lit(1)).over(w))


SQL_FINGERPRINT = """
SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS fp_count
FROM (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents)
"""


def q_embedding_cosine_top5(spark, sf_dir):
    """Similarity search baseline: brute-force cosine top-5 for the first 10
    query vectors (higher-order functions, JVM-side dot product)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # r6 (guide §1.2 "don't compute things you throw away"): norms are
    # per-VECTOR quantities — compute them once per row BEFORE the cross
    # join instead of once per (q, c) pair (the r5 shape re-evaluated the
    # query norm 20k times per query vector and the candidate norm 10x).
    # The candidate side is also spread out of the single-file scan layout
    # so the interpreted higher-order aggregates parallelize. Identical
    # doubles: same fold expression over the same data, same cos division.
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"), norm.alias("_n1")
    )
    c = (
        emb.filter(F.col("vec_id") >= 10)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"), norm.alias("_n2"))
    )
    j = F.broadcast(q).crossJoin(c)
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda a, v: a + v)
    cos = dot / (F.col("_n1") * F.col("_n2"))
    scored = j.select("q_id", "c_id", F.floor(cos * 1000).cast("bigint").alias("cos_e3"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_e3"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


SQL_EMB_TOP5 = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT q_id, c_id,
         CAST(floor((list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))) * 1000) AS BIGINT) AS cos_e3
  FROM q, c)
SELECT q_id, c_id, cos_e3, rank FROM (
  SELECT q_id, c_id, cos_e3, row_number() OVER (PARTITION BY q_id ORDER BY cos_e3 DESC, c_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


def q_tpch_pricing_summary(spark, sf_dir):
    """Aggregation coverage (TPC-H Q1 shape) with exact DECIMAL sums."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    dq = F.col("l_quantity").cast("decimal(14,2)")
    dp = F.col("l_extendedprice").cast("decimal(16,2)")
    dd = F.col("l_discount").cast("decimal(6,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dq).cast("double").alias("sum_qty"),
            F.sum(dp).cast("double").alias("sum_base_price"),
            F.sum((dp * (F.lit(1).cast("decimal(6,2)") - dd)).cast("decimal(24,4)")).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * (CAST(1 AS DECIMAL(6,2)) - CAST(l_discount AS DECIMAL(6,2))) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_top_orders(spark, sf_dir):
    """Join + top-k coverage (TPC-H Q3 shape): top-10 orders by exact
    decimal revenue."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dp = F.col("l_extendedprice").cast("decimal(16,2)")
    dd = F.col("l_discount").cast("decimal(6,2)")
    # r6 (guide §3.1): associate the joins the cheap way round — reduce
    # orders by the selective customer filter FIRST (1.5M -> ~300k keys at
    # sf1.0), then broadcast only the surviving o_orderkeys to the lineitem
    # probe. The r5 shape broadcast the FULL orders table (and customer)
    # and probed lineitem through two joins. Inner-join reassociation:
    # identical result.
    ford = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select("o_orderkey")
    rev = (
        li.join(F.broadcast(ford), li["l_orderkey"] == ford["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.sum((dp * (F.lit(1).cast("decimal(6,2)") - dd)).cast("decimal(24,4)")).alias("_rev"))
    )
    return (
        rev.orderBy(F.desc("_rev"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("_rev").cast("double").alias("revenue"))
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey, CAST(rev AS DOUBLE) AS revenue FROM (
  SELECT o_orderkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * (CAST(1 AS DECIMAL(6,2)) - CAST(l_discount AS DECIMAL(6,2))) AS DECIMAL(24,4))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey)
ORDER BY rev DESC, o_orderkey ASC LIMIT 10
"""


def q_events_hourly_rollup(spark, sf_dir):
    """Batch analog of the streaming windowed aggregation: per-hour,
    per-type event rollup with exact decimal value sums."""
    ev = _t(spark, sf_dir, "events")
    # left in the scan layout (r6): the query is scan/decode-bound — a
    # repartition before the aggregation won 0.2s at sf1.0 but cost 0.2s at
    # sf0.1 (measured both ways), so the r5 shape stays
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


SQL_HOURLY = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_multi_match_best_field(spark, sf_dir):
    """J2 multi_match best-field (helpers.py:129-141): each blocked pair
    scores the source text against TWO ref fields (raw text and its first
    40 chars), clause score = greatest of the per-field normalized edit
    similarities; integer-scaled. The engine path
    (fused_pair_features_best_field) is pytest-verified; this entry pins the
    greatest()-of-fields semantics against DuckDB."""
    pairs = _block_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = docs.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("f1"),
        F.substring(F.col("text"), 1, 40).alias("f2"),
    )
    j = pairs.join(docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")), "id_a").join(b, "id_b")
    lev = "((greatest(length(ta), length({f}), 1) - levenshtein(ta, {f})) * 1000000) div greatest(length(ta), length({f}), 1)"
    j = j.withColumn("s1", F.expr(lev.format(f="f1"))).withColumn("s2", F.expr(lev.format(f="f2")))
    best_field = F.when(F.col("s1") >= F.col("s2"), F.lit("f1")).otherwise(F.lit("f2"))
    return j.select(
        "id_a", "id_b", F.greatest("s1", "s2").cast("bigint").alias("best_e6"), best_field.alias("best_field")
    )


SQL_MULTI_MATCH = f"""
WITH pairs AS ({_SQL_BLOCK_PAIRS}),
j AS (
  SELECT p.id_a, p.id_b, a.text AS ta, b.text AS f1, substr(b.text, 1, 40) AS f2
  FROM pairs p JOIN documents a ON a.doc_id = p.id_a JOIN documents b ON b.doc_id = p.id_b),
s AS (
  SELECT id_a, id_b,
    ((greatest(length(ta), length(f1), 1) - levenshtein(ta, f1)) * 1000000)
      // greatest(length(ta), length(f1), 1) AS s1,
    ((greatest(length(ta), length(f2), 1) - levenshtein(ta, f2)) * 1000000)
      // greatest(length(ta), length(f2), 1) AS s2
  FROM j)
SELECT id_a, id_b, CAST(greatest(s1, s2) AS BIGINT) AS best_e6,
       CASE WHEN s1 >= s2 THEN 'f1' ELSE 'f2' END AS best_field
FROM s
"""


def q_must_filter_phrase(spark, sf_dir):
    """P3 must filter, analyzed-phrase semantics (helpers.py:145-148
    match_phrase in the bool filter): keep docs whose standard-analyzed
    token stream contains the phrase 'the data' contiguously — token-level,
    not substring (so 'theXdata' and 'data the' do NOT match)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT), lambda t: t != F.lit(""))
    stream = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
    return docs.filter(stream.contains(" the data ")).select("doc_id", "lang", "source")


SQL_MUST_PHRASE = """
SELECT doc_id, lang, source FROM documents
WHERE ' ' || array_to_string(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'),
                                         t -> t <> ''), ' ') || ' '
      LIKE '% the data %'
"""


def q_majority_vote_user(spark, sf_dir):
    """A7 majority vote over events: each user's most frequent event_type,
    deterministic tie-break on the type value."""
    from merge_machine_spark.operators.cascade import majority_vote

    ev = _t(spark, sf_dir, "events")
    return majority_vote(ev, ["user_id"], "event_type")


SQL_MAJORITY_VOTE = """
SELECT user_id, vote, n_votes FROM (
  SELECT user_id, event_type AS vote, count(*) AS n_votes,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


# --- rows-only checks (no SQL-expressible oracle; pytest covers semantics) ----
def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash/LSH candidate generation (xxhash64 family — not expressible in
    DuckDB; property-tested in tests/test_blocking.py; GOLDEN-ORACLED since
    r4: tests/golden/minhash_lsh_pairs_sf0001.parquet pins the exact sf0.001
    candidate set, regenerable byte-stably via scripts/gen_golden_lsh.py)."""
    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.operators.blocking import lsh_candidate_pairs

    # spread out of the single-row-group scan layout so the Arrow n-gram
    # expansion and the minhash aggregate run on all cores (r6: 7.1s -> 1.6s
    # for the shingle explode alone at sf1.0)
    docs = (
        _t(spark, sf_dir, "documents").select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # bands=8, rows=4: at rows=2 the 3-gram channel emitted ~89% of the cross
    # join (unselective demo); 4 rows/band keeps recall for near-dups while
    # exhibiting the sub-quadratic candidate generation the module is for.
    #
    # r6 (guide §2.3 narrower types): the LSH join/distinct runs on BIGINT
    # ids (the r5 shape cast to string first, so the band self-join and the
    # 4.9M-row pair distinct exchanged/compared strings). The historical
    # string-typed, lexicographically-canonicalized output contract is
    # restored at the end: least/greatest on the string casts reproduces the
    # golden's id_a < id_b STRING ordering exactly — the unordered candidate
    # set is id-type-independent, only which side is id_a changes.
    pairs = lsh_candidate_pairs(docs, "doc_id", A.n_grams_fast(F.col("text")), bands=8, rows=4)
    sa = F.col("id_a").cast("string")
    sb = F.col("id_b").cast("string")
    return pairs.select(
        F.least(sa, sb).alias("id_a"), F.greatest(sa, sb).alias("id_b")
    )


def _simhash16_expr() -> "F.Column":
    """16-bit SimHash signature from per-token bit votes over ``text``.
    Bit i of a token = parity of hex digit i of md5(token) — chosen because
    BOTH engines compute it identically (full DuckDB oracle). md5 in a
    Spark expression anti-scales with threads (synchronized Provider
    lookup); production SimHash should use xxhash64 — the bucketing/banding
    semantics under test are hash-agnostic."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _TOKEN_SPLIT), lambda t: t != F.lit(""))

    def bit_at(i):
        # NB: a one-arg lambda is required — a default-arg capture (lambda
        # t, i=i: ...) reads as a two-arg (element, index) HOF lambda
        return lambda t: F.conv(F.substring(F.md5(t), i + 1, 1), 16, 10).cast("int") % 2 == 1

    sig = F.lit(0)
    for i in range(16):
        mask = 1 << i
        vote = F.size(F.filter(toks, bit_at(i))) * 2 > F.size(toks)
        sig = sig + F.when(vote, F.lit(mask)).otherwise(F.lit(0))
    return sig.cast("bigint")


def q_simhash_buckets(spark, sf_dir):
    """SimHash near-dup buckets: 16-bit signature from per-token bit votes
    (see _simhash16_expr; VERDICT r1 #9 upgraded this to a full oracle)."""
    docs = _t(spark, sf_dir, "documents")
    out = docs.select("doc_id", _simhash16_expr().alias("simhash16"))
    return out.withColumn("bucket_n", F.count(F.lit(1)).over(Window.partitionBy("simhash16")))


def q_connected_components(spark, sf_dir):
    """Transitive clustering over blocking-pair edges (iterative star joins)
    — oracled against a DuckDB recursive-CTE min-label propagation."""
    from merge_machine_spark.operators.clustering import connected_components

    pairs = _block_pairs(spark, sf_dir).select(
        F.col("id_a").cast("string").alias("id_a"), F.col("id_b").cast("string").alias("id_b")
    )
    return connected_components(pairs)


SQL_CONNECTED_COMPONENTS = f"""
WITH RECURSIVE
pairs AS ({_SQL_BLOCK_PAIRS}),
edges AS (
  SELECT DISTINCT least(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS u,
                  greatest(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS v
  FROM pairs WHERE CAST(id_a AS VARCHAR) <> CAST(id_b AS VARCHAR)),
und AS (SELECT u AS n, v AS m FROM edges UNION SELECT v, u FROM edges),
reach(n, r) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM und)
  UNION
  SELECT und.n, reach.r FROM und JOIN reach ON und.m = reach.n
)
SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n
"""


def q_core_attach_clusters(spark, sf_dir):
    """Chain-safe two-tier clustering (core_attach_clusters) over the
    integer-jaccard scored blocking pairs: edges with jaccard_e6 >= 550000
    may MERGE clusters (connected components); edges in [250000, 550000)
    only ATTACH a doc to its best core neighbor's cluster; leftovers pair on
    mutual best. The float-free integer score keeps the DuckDB oracle
    (recursive CTE + window replication) bit-exact."""
    from merge_machine_spark.operators.clustering import core_attach_clusters

    pairs = q_pair_token_jaccard(spark, sf_dir).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        F.col("jaccard_e6").cast("double").alias("score"),
    )
    return core_attach_clusters(pairs, core_threshold=550000.0, attach_threshold=250000.0)


SQL_CORE_ATTACH = f"""
WITH RECURSIVE
pj AS ({SQL_PAIR_JACCARD}),
scored AS (
  SELECT CAST(id_a AS VARCHAR) AS u, CAST(id_b AS VARCHAR) AS v, jaccard_e6 AS s
  FROM pj WHERE CAST(id_a AS VARCHAR) <> CAST(id_b AS VARCHAR)),
core_e AS (SELECT u, v FROM scored WHERE s >= 550000),
und AS (SELECT u AS n, v AS m FROM core_e UNION SELECT v, u FROM core_e),
reach(n, r) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM und)
  UNION
  SELECT und.n, reach.r FROM und JOIN reach ON und.m = reach.n),
core AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
weak AS (SELECT u, v, s FROM scored WHERE s >= 250000 AND s < 550000),
directed AS (SELECT u AS src, v AS dst, s FROM weak UNION ALL SELECT v, u, s FROM weak),
uncored AS (SELECT d.* FROM directed d WHERE d.src NOT IN (SELECT doc_id FROM core)),
to_core AS (SELECT un.src, un.dst, un.s, c.cluster_id FROM uncored un JOIN core c ON c.doc_id = un.dst),
attached AS (
  SELECT src AS doc_id, cluster_id FROM (
    SELECT src, cluster_id, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rn
    FROM to_core) WHERE rn = 1),
floating AS (
  SELECT un.* FROM uncored un
  WHERE un.src NOT IN (SELECT doc_id FROM attached)
    AND un.dst NOT IN (SELECT doc_id FROM attached)),
best AS (
  SELECT src, dst AS bdst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rn
    FROM floating) WHERE rn = 1),
mutual AS (
  SELECT x.src AS mu, x.bdst AS mv FROM best x JOIN best y
  ON x.bdst = y.src AND y.bdst = x.src WHERE x.src < x.bdst)
SELECT doc_id, cluster_id FROM core
UNION ALL SELECT doc_id, cluster_id FROM attached
UNION ALL SELECT mu AS doc_id, mu AS cluster_id FROM mutual
UNION ALL SELECT mv AS doc_id, mu AS cluster_id FROM mutual
"""


def q_cluster_score_stats(spark, sf_dir):
    """Per-cluster match-count/score-distribution metrics over the
    chain-safe clusters (north rule: the metrics table the resumable
    pipeline publishes next to cluster assignments). Integer jaccard_e6
    scores keep count/min/max/sum exact for the DuckDB oracle."""
    from merge_machine_spark.operators.clustering import (
        cluster_score_stats, core_attach_clusters)

    pairs = q_pair_token_jaccard(spark, sf_dir).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        F.col("jaccard_e6").alias("score"),
    ).localCheckpoint(eager=True)  # one derivation feeds clustering AND stats
    assign = core_attach_clusters(pairs, core_threshold=550000.0, attach_threshold=250000.0)
    return cluster_score_stats(pairs, assign)


SQL_CLUSTER_STATS = f"""
WITH assign AS ({SQL_CORE_ATTACH}),
pj AS ({SQL_PAIR_JACCARD}),
intra AS (
  SELECT x.cluster_id, count(*) AS n_intra_pairs,
         min(p.jaccard_e6) AS min_score, max(p.jaccard_e6) AS max_score,
         CAST(sum(p.jaccard_e6) AS BIGINT) AS sum_score
  FROM pj p
  JOIN assign x ON x.doc_id = CAST(p.id_a AS VARCHAR)
  JOIN assign y ON y.doc_id = CAST(p.id_b AS VARCHAR)
  WHERE x.cluster_id = y.cluster_id
  GROUP BY x.cluster_id),
members AS (SELECT cluster_id, count(*) AS n_members FROM assign GROUP BY cluster_id)
SELECT m.cluster_id, m.n_members, coalesce(i.n_intra_pairs, 0) AS n_intra_pairs,
       i.min_score, i.max_score, i.sum_score
FROM members m LEFT JOIN intra i ON i.cluster_id = m.cluster_id
"""


SQL_SIMHASH = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents),
sig AS (
  SELECT doc_id, CAST(({terms}) AS BIGINT) AS simhash16 FROM t)
SELECT doc_id, simhash16, count(*) OVER (PARTITION BY simhash16) AS bucket_n FROM sig
""".format(
    terms=" + ".join(
        "(CASE WHEN 2 * len(list_filter(toks, x -> (strpos('0123456789abcdef', substr(md5(x), {p}, 1)) - 1) % 2 = 1)) > len(toks) THEN {m} ELSE 0 END)".format(p=i + 1, m=1 << i)
        for i in range(16)
    )
)


def q_ann_lsh_top3(spark, sf_dir):
    """Bucketed ANN (random-hyperplane LSH + multiprobe) over embeddings —
    the scale path next to the brute-force baseline (rows-only; recall@k is
    pytest-verified in tests/test_ann_multimodal_streaming.py; GOLDEN-ORACLED
    since r4: tests/golden/ann_lsh_top3_sf0001.parquet pins the exact sf0.001
    top-3 table, regenerable byte-stably via scripts/gen_golden_lsh.py)."""
    from pyspark.sql import functions as F

    from merge_machine_spark.operators.ann import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    return lsh_topk(q, c, k=3, n_planes=8, dim=64, n_tables=2, n_probes=2, max_bucket=4096)


def q_ann_ivf_top3(spark, sf_dir):
    """IVF ANN (coarse k-means quantizer, nprobe cell probing) over
    embeddings — the second mandated scale path next to LSH: data-adaptive
    cells follow the actual embedding distribution where hyperplanes are
    oblivious to it (rows-only; recall@k + bit-determinism are
    pytest-verified; GOLDEN-ORACLED: tests/golden/ann_ivf_top3_sf0001.parquet
    pins the exact sf0.001 top-3 table, regenerable byte-stably via
    scripts/gen_golden_lsh.py — seeded xxhash64 centroids + fixed-point
    Lloyd sums make the quantizer itself deterministic)."""
    from pyspark.sql import functions as F

    from merge_machine_spark.operators.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    return ivf_topk(q, c, k=3, k_coarse=8, nprobe=3, iters=2, max_cell=65536)


def q_winnowing_fingerprints(spark, sf_dir):
    """Training-data op the mandate names: document fingerprinting via a
    ROLLING HASH — MOSS winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03):
    polynomial token/shingle hashes (exact integer mod 1e9+7, so DuckDB
    mirrors it bit-for-bit), k=3-token shingles, min per w=4 window, full
    windows only, distinct minima per doc. Complements md5 exact
    `doc_fingerprint`: any shared run of >= w+k-1 tokens across two docs is
    guaranteed to share a fingerprint."""
    from merge_machine_spark.functions.fingerprint import winnowing_fingerprints

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowing_fingerprints(docs, k=3, w=4)


SQL_WINNOWING = """
WITH toks AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), t -> t <> ''),
           t -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT), list_transform(str_split(t, ''), c -> ascii(c))),
                  (acc, x) -> (acc * 31 + x) % 1000000007)) AS th
  FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(th) >= 3 THEN
           list_transform(range(1, len(th) - 1),
             i -> (((th[i] * 1000003 + th[i+1]) % 1000000007) * 1000003 + th[i+2]) % 1000000007)
         ELSE [] END AS sl
  FROM toks),
pos AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(sl) + 1),
                          i -> struct_pack(pos := i, h := sl[i]))) AS u
    FROM sh)),
wm AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS n_sh
  FROM pos),
fps AS (
  SELECT DISTINCT doc_id, wmin AS fp FROM wm WHERE pos <= n_sh - 3)
SELECT doc_id, fp, count(*) OVER (PARTITION BY doc_id) AS doc_fp_count FROM fps
"""


def q_fp_near_dup_pairs(spark, sf_dir):
    """Near-dup pairs from shared winnowed fingerprints (the MOSS use):
    docs sharing >= 2 window-min rolling hashes, LSH-band join shape with a
    hot-fp cap (boilerplate runs can never explode a join group). Exact
    integer jaccard_e3 via SQL DIV — fully DuckDB-oracled end to end."""
    from merge_machine_spark.functions.fingerprint import fp_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return fp_near_dup_pairs(docs, k=3, w=4, min_shared=2, max_fp_df=200)


SQL_FP_NEAR_DUP = f"""
WITH fps AS ({SQL_WINNOWING}),
ok AS (
  SELECT * FROM fps
  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 200)),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS n_shared,
         a.doc_fp_count AS fp_count_a, b.doc_fp_count AS fp_count_b
  FROM ok a JOIN ok b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 4, 5)
SELECT doc_a, doc_b, n_shared, fp_count_a, fp_count_b,
       (1000 * n_shared) // (fp_count_a + fp_count_b - n_shared) AS jaccard_e3
FROM p WHERE n_shared >= 2
"""


def q_embedding_near_dup(spark, sf_dir):
    """Training-data op the mandate names next to MinHash/SimHash:
    embedding-cosine near-dup dedup — threshold pairs -> connected
    components -> (vec_id, group_id, group_size), every vector present,
    group_id = min member id, singletons outside the CC shuffle. The
    contract runs the exact all-pairs plan so DuckDB oracles it end-to-end
    (recursive-CTE min propagation); the LSH-bucketed scale path shares the
    grouping code and is recall-pinned on planted near-dups in
    tests/test_ann_multimodal_streaming.py. Scores quantize to
    floor(1000*cos) BEFORE the threshold compare, so the Spark/DuckDB
    boundary decision is integer-exact. The synthetic embeddings hold no
    true near-dups (max pair cosine ~0.51), so the contract threshold sits
    at the ~99.9th percentile (0.35) to exercise real group structure."""
    from merge_machine_spark.operators.ann import near_dup_groups

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return near_dup_groups(emb, threshold_e3=350, method="exact")


SQL_EMB_NEAR_DUP = """
WITH RECURSIVE
p AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE CAST(floor((list_dot_product(a.embedding, b.embedding) /
          (sqrt(list_dot_product(a.embedding, a.embedding)) *
           sqrt(list_dot_product(b.embedding, b.embedding)))) * 1000) AS BIGINT) >= 350),
und AS (SELECT u AS n, v AS m FROM p UNION SELECT v, u FROM p),
reach(n, r) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM und)
  UNION
  SELECT und.n, reach.r FROM und JOIN reach ON und.m = reach.n),
grouped AS (SELECT n AS vec_id, min(r) AS group_id FROM reach GROUP BY n),
allv AS (
  SELECT e.vec_id, coalesce(g.group_id, e.vec_id) AS group_id
  FROM embeddings e LEFT JOIN grouped g ON e.vec_id = g.vec_id)
SELECT vec_id, group_id, count(*) OVER (PARTITION BY group_id) AS group_size FROM allv
"""


def q_french_analyzer_tokens(spark, sf_dir):
    """F2/F3 French analyzer over driver text (rows-only; golden-token pytest
    covers exact semantics)."""
    from merge_machine_spark.functions import analyzers as A

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(A.french_estab(F.col("text"))).alias("token"))


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER resolve() over the sf0.001 documents table wrapped
    into the interleaved-span input shape (BASELINE.json input_hint), ending
    in cluster assignments."""
    from merge_machine_spark.plans.pipeline import ResolveConfig, resolve

    sf_dir = "/root/testdata/sf0.001"
    flat = _t(spark, sf_dir, "documents")
    half = (F.length("text") / 2).cast("int")
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").substr(F.lit(1), half).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("m://"), F.md5(F.col("doc_id").cast("string"))).alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").substr(half + 1, F.length("text")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(2).alias("offset"),
        ),
    )
    docs = flat.select(F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans"))
    cfg = ResolveConfig(
        block_channel="standard",
        max_df=None,
        weights={"tfidf_cosine": 0.5, "jaro_winkler": 0.25, "token_jaccard": 0.25},
        threshold=0.9,
    )
    res = resolve(spark, docs, cfg)
    clusters = res["cluster_assignments"]
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return clusters.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


def q_media_stub_meta(spark, sf_dir):
    """Multimodal plumbing through the driver contract: wrap each document
    in a single media span (ref derived from doc_id — the driver tables
    carry no media payloads), run the REAL extract_media_features
    mapInPandas operator (stub decode: no media_store supplied), and emit
    the metadata columns. The stub's width/height are sha256(media_ref)
    byte-derived, replicated hex-digit-wise in SQL_MEDIA_STUB (DuckDB
    sha256 + strpos arithmetic, the SQL_SIMHASH technique) — a FULL value
    oracle over the Arrow batch path; the 16-dim feature floats are
    covered by tests/test_ann_multimodal_streaming.py."""
    from merge_machine_spark.functions.multimodal import extract_media_features

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    feats = extract_media_features(docs)
    return feats.select("doc_id", "media_ref", "width", "height", "decode_ok")


SQL_MEDIA_STUB = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         'img://' || CAST(doc_id AS VARCHAR) AS media_ref
  FROM documents),
h AS (SELECT doc_id, media_ref, sha256(media_ref) AS hx FROM m)
SELECT doc_id, media_ref,
  CAST(64 + ((16 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 192) AS INTEGER) AS width,
  CAST(64 + ((16 * (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 192) AS INTEGER) AS height,
  TRUE AS decode_ok
FROM h
"""


def q_frame_sample_meta(spark, sf_dir):
    """Video frame sampling through the driver contract: derive a
    deterministic per-doc video (ref + sha256-hex-derived duration — the
    driver tables carry no real videos), run the REAL sample_video_frames
    mapInPandas operator (3 frames each), and emit the metadata columns.
    Duration, frame timestamps, and stub frame dims are all replicated in
    SQL (DuckDB sha256 + strpos hex arithmetic, the SQL_MEDIA_STUB
    technique) — a FULL value oracle over the frame-explode + Arrow batch
    path; the 16-dim frame features are pytest-covered."""
    from merge_machine_spark.functions.multimodal import sample_video_frames

    ref = F.concat(F.lit("vid://"), F.col("doc_id").cast("string"))
    dur = (F.lit(1) + F.conv(F.substring(F.sha2(ref, 256), 1, 2), 16, 10).cast("int") % F.lit(60)).cast("double")
    media = _t(spark, sf_dir, "documents").select(ref.alias("media_ref"), dur.alias("duration_s"))
    out = sample_video_frames(media, n_frames=3)
    return out.select("media_ref", "frame_idx", "t_offset_s", "width", "height", "decode_ok")


SQL_FRAME_SAMPLE = """
WITH m AS (
  SELECT 'vid://' || CAST(doc_id AS VARCHAR) AS media_ref,
         sha256('vid://' || CAST(doc_id AS VARCHAR)) AS dh
  FROM documents),
d AS (
  SELECT media_ref,
         CAST(1 + ((16 * (strpos('0123456789abcdef', substr(dh, 1, 1)) - 1)
                  + (strpos('0123456789abcdef', substr(dh, 2, 1)) - 1)) % 60) AS DOUBLE) AS dur
  FROM m),
f AS (
  SELECT media_ref, dur, CAST(unnest(range(0, 3)) AS INTEGER) AS frame_idx FROM d),
h AS (
  SELECT media_ref, frame_idx,
         dur * (frame_idx + 0.5) / 3.0 AS t_offset_s,
         sha256(media_ref || '#frame=' || CAST(frame_idx AS VARCHAR)) AS hx
  FROM f)
SELECT media_ref, frame_idx, t_offset_s,
  CAST(64 + ((16 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 192) AS INTEGER) AS width,
  CAST(64 + ((16 * (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 192) AS INTEGER) AS height,
  TRUE AS decode_ok
FROM h
"""


def q_audio_window_meta(spark, sf_dir):
    """Audio windowing through the driver contract: derive a deterministic
    per-doc audio clip (ref + sha256-hex-derived quarter-second duration —
    the driver tables carry no real audio), run the REAL
    extract_audio_windows mapInPandas operator (1s windows @ 16 kHz), and
    emit every column. Duration, window bounds, and the whole-window PCM
    features (energy / rms / zero_crossings of the tiled stub signal) are
    all replicated in SQL (DuckDB sha256 + strpos hex arithmetic over the
    32 seed bytes, the SQL_FRAME_SAMPLE technique) — a FULL value oracle
    over the window-explode + Arrow batch + feature math."""
    from merge_machine_spark.functions.multimodal import extract_audio_windows

    ref = F.concat(F.lit("aud://"), F.col("doc_id").cast("string"))
    dur = (
        F.lit(1) + F.conv(F.substring(F.sha2(ref, 256), 1, 2), 16, 10).cast("int") % F.lit(120)
    ).cast("double") / F.lit(4.0)
    media = _t(spark, sf_dir, "documents").select(ref.alias("media_ref"), dur.alias("duration_s"))
    out = extract_audio_windows(media, window_s=1.0, sample_rate=16000)
    return out.select(
        "media_ref", "win_idx", "t_start_s", "t_end_s", "sample_rate",
        "n_samples", "energy", "rms", "zero_crossings", "decode_ok",
    )


SQL_AUDIO_WINDOW = """
WITH m AS (
  SELECT 'aud://' || CAST(doc_id AS VARCHAR) AS media_ref,
         sha256('aud://' || CAST(doc_id AS VARCHAR)) AS dh
  FROM documents),
d AS (
  SELECT media_ref,
         (1 + ((16 * (strpos('0123456789abcdef', substr(dh, 1, 1)) - 1)
              + (strpos('0123456789abcdef', substr(dh, 2, 1)) - 1)) % 120)) / 4.0 AS dur
  FROM m),
w AS (
  SELECT media_ref, dur,
         CAST(unnest(range(0, CAST(ceil(dur / 1.0) AS BIGINT))) AS INTEGER) AS win_idx
  FROM d),
g AS (
  SELECT media_ref, win_idx,
         win_idx * 1.0 AS t_start_s,
         least(dur, (win_idx + 1) * 1.0) AS t_end_s,
         sha256(media_ref || '#win=' || CAST(win_idx AS VARCHAR)) AS hx
  FROM w),
b AS (
  SELECT media_ref, win_idx, t_start_s, t_end_s, hx,
         CAST(unnest(range(0, 32)) AS INTEGER) AS j
  FROM g),
s AS (
  SELECT media_ref, win_idx, t_start_s, t_end_s, j,
         CAST(((16 * (strpos('0123456789abcdef', substr(hx, 2 * j + 1, 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, 2 * j + 2, 1)) - 1)) - 128) * 256 AS BIGINT) AS smp
  FROM b),
s2 AS (
  SELECT *, lag(smp) OVER (PARTITION BY media_ref, win_idx ORDER BY j) AS prev FROM s),
f AS (
  SELECT media_ref, win_idx,
         any_value(t_start_s) AS t_start_s, any_value(t_end_s) AS t_end_s,
         CAST(sum(smp * smp) AS BIGINT) AS seed_energy,
         CAST(sum(CASE WHEN prev IS NOT NULL AND ((smp >= 0) <> (prev >= 0)) THEN 1 ELSE 0 END) AS INTEGER) AS zc_seed,
         max(CASE WHEN j = 0 THEN smp END) AS s0,
         max(CASE WHEN j = 31 THEN smp END) AS s31
  FROM s2 GROUP BY media_ref, win_idx),
n AS (
  SELECT *, CAST(round((t_end_s - t_start_s) * 16000) AS INTEGER) AS n_samples FROM f)
SELECT media_ref, win_idx, t_start_s, t_end_s,
       CAST(16000 AS INTEGER) AS sample_rate,
       n_samples,
       CAST(seed_energy * (n_samples // 32) AS BIGINT) AS energy,
       sqrt(CAST(seed_energy * (n_samples // 32) AS DOUBLE) / n_samples) AS rms,
       CAST(zc_seed * (n_samples // 32)
            + (CASE WHEN (s0 >= 0) <> (s31 >= 0) THEN 1 ELSE 0 END) * (n_samples // 32 - 1) AS INTEGER) AS zero_crossings,
       TRUE AS decode_ok
FROM n
"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization over the event log (operators/temporal.py):
    a new session starts after >8h of per-user inactivity; per-session
    rollup with exact epoch-us bounds and a decimal value sum. One shuffle
    on user_id, everything else window expressions in codegen."""
    from merge_machine_spark.operators.temporal import session_stats, sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, key_col="user_id", ts_col="ts", gap_us=8 * 3600 * 1_000_000, tie_cols=("event_id",))
    return session_stats(s, key_col="user_id", ts_col="ts", value_col="value")


SQL_SESSIONIZE = """
WITH lagd AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
flag AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR date_diff('microsecond', prev, ts) > 28800000000
                 THEN 1 ELSE 0 END AS ns
  FROM lagd),
sess AS (
  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flag)
SELECT user_id, session_idx, count(*) AS n_events,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
       (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS duration_ms,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, session_idx
"""


def q_asof_click_view(spark, sf_dir):
    """Backward-inclusive as-of join (operators/temporal.py): each click
    picks the same user's most recent view at-or-before it. Union+window
    formulation — one shuffle on user_id, no range-join pair explosion."""
    from merge_machine_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        left_tie_cols=("event_id",),
        right_tie_cols=("event_id",),
        prefix="view_",
    )
    return out.select(
        "event_id",
        "user_id",
        _ev_us("ts").alias("click_us"),
        "view_event_id",
        "view_ts_us",
        (_ev_us("ts") - F.col("view_ts_us")).alias("lag_us"),
    )


SQL_ASOF = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS tag, event_id AS v_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, event_id, 1, NULL, NULL
  FROM events WHERE event_type = 'click'),
w AS (
  SELECT *,
         last_value(v_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event_id,
         last_value(v_us IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts_us
  FROM u)
SELECT event_id, user_id, epoch_us(ts) AS click_us, view_event_id, view_ts_us,
       epoch_us(ts) - view_ts_us AS lag_us
FROM w WHERE tag = 1
"""


def q_dedup_keep_best(spark, sf_dir):
    """End-to-end near-dup dedup with canonical selection: token-Jaccard
    >= 0.8 pairs over blocked candidates -> connected components ->
    keep-best representative per cluster (longest doc, ties lowest id).
    The full training-data dedup loop in one query; ids compared as strings
    (CC's lexicographic min-label), canonical id re-cast to BIGINT."""
    from merge_machine_spark.operators.clustering import (
        assignments_with_singletons,
        canonical_per_cluster,
        connected_components,
    )

    jac = q_pair_token_jaccard(spark, sf_dir)
    edges = jac.filter(F.col("jaccard_e6") >= 800000).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
    )
    cc = connected_components(edges)
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "n_chars"
    )
    assigns = assignments_with_singletons(docs, cc)
    best = canonical_per_cluster(docs, assigns, prefer_col="n_chars", id_col="doc_id")
    return best.select(
        "cluster_id",
        F.col("canonical_id").cast("bigint").alias("canonical_id"),
        "n_members",
        "best_n_chars",
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE
jac AS ({SQL_PAIR_JACCARD}),
edges AS (
  SELECT DISTINCT least(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS u,
                  greatest(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS v
  FROM jac WHERE jaccard_e6 >= 800000),
und AS (SELECT u AS n, v AS m FROM edges UNION SELECT v, u FROM edges),
reach(n, r) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM und)
  UNION
  SELECT und.n, reach.r FROM und JOIN reach ON und.m = reach.n),
comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
allc AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
         coalesce(c.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = CAST(d.doc_id AS VARCHAR)),
mx AS (SELECT cluster_id, count(*) AS n_members, max(n_chars) AS best_n_chars
       FROM allc GROUP BY cluster_id),
win AS (
  SELECT a.cluster_id, min(a.doc_id) AS canonical_s
  FROM allc a JOIN mx m ON m.cluster_id = a.cluster_id AND a.n_chars = m.best_n_chars
  GROUP BY a.cluster_id)
SELECT m.cluster_id, CAST(w.canonical_s AS BIGINT) AS canonical_id,
       m.n_members, m.best_n_chars
FROM mx m JOIN win w ON w.cluster_id = m.cluster_id
"""


def q_train_test_split(spark, sf_dir):
    """Deterministic salted-md5 hash split (functions/sampling.py): pure
    projection, no shuffle, reproducible on any engine that has md5 — the
    DuckDB oracle recomputes the identical buckets."""
    from merge_machine_spark.functions.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return train_test_split(docs, "doc_id", train_pct=80, salt="split")


SQL_SPLIT = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split
FROM b
"""


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic downsampling (functions/sampling.py):
    rebalance the language mix (keep 25% of dominant en, 50% zh, all
    fr/de/es) with a salted-hash filter — no shuffle, no count pass."""
    from merge_machine_spark.functions.sampling import hash_bucket, stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = stratified_sample(
        docs, "doc_id", "lang",
        rates_pct={"en": 25, "zh": 50, "fr": 100, "de": 100, "es": 100},
        default_pct=0, salt="sample",
    )
    return kept.withColumn("bucket", hash_bucket("doc_id", "sample"))


SQL_STRATIFIED = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents)
SELECT doc_id, lang, bucket
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 50
                         WHEN 'fr' THEN 100 WHEN 'de' THEN 100
                         WHEN 'es' THEN 100 ELSE 0 END
"""


def q_split_contamination(spark, sf_dir):
    """Train/test decontamination (functions/fingerprint.py): for every
    TEST doc of the salted-md5 80/20 split, count its winnowed fingerprints
    that also occur anywhere in TRAIN; contaminated at >= 2 shared. The
    train side collapses to a DISTINCT fp set before the semi join, so a
    boilerplate fp shared by 10^6 train docs is one build-side row — the
    join can't explode at corpus scale."""
    from merge_machine_spark.functions.fingerprint import split_contamination, winnowing_fingerprints
    from merge_machine_spark.functions.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fps = winnowing_fingerprints(docs, k=3, w=4)
    split = train_test_split(docs.select("doc_id"), "doc_id", train_pct=80, salt="split")
    return split_contamination(fps, split, min_shared=2)


SQL_SPLIT_CONTAMINATION = f"""
WITH fps AS ({SQL_WINNOWING}),
b AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents),
s AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split FROM b),
train_fp AS (
  SELECT DISTINCT fp FROM fps JOIN s ON fps.doc_id = s.doc_id WHERE s.split = 'train'),
test_fp AS (
  SELECT fps.doc_id, fp FROM fps JOIN s ON fps.doc_id = s.doc_id WHERE s.split = 'test'),
shared AS (
  SELECT doc_id, count(*) AS n_shared_fps
  FROM test_fp WHERE fp IN (SELECT fp FROM train_fp)
  GROUP BY doc_id)
SELECT s.doc_id,
       coalesce(n_shared_fps, 0) AS n_shared_fps,
       coalesce(n_shared_fps, 0) >= 2 AS contaminated
FROM s LEFT JOIN shared ON shared.doc_id = s.doc_id
WHERE s.split = 'test'
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style within-document repetition signals
    (functions/quality.py): distinct-token fraction, most-frequent-bigram
    share, duplicated-trigram share — the standard repetitious-text filter
    in training-data curation, integer-e6 exact so DuckDB replays it
    bit-for-bit. N-gram construction is an array projection in codegen;
    the counts are two map-side-combinable hash aggregates."""
    from merge_machine_spark.functions.quality import repetition_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_stats(docs, top_n=2, dup_n=3)


SQL_REPETITION = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents),
b AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END AS g3
  FROM t),
c2 AS (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(g2) AS g FROM b) GROUP BY 1, 2),
a2 AS (SELECT doc_id, max(c) AS top_count, sum(c) AS total2 FROM c2 GROUP BY 1),
c3 AS (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(g3) AS g FROM b) GROUP BY 1, 2),
a3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_hits, sum(c) AS total3 FROM c3 GROUP BY 1)
SELECT b.doc_id, n_tokens,
       (CAST(n_uniq AS BIGINT) * 1000000) // greatest(n_tokens, 1) AS uniq_token_frac_e6,
       coalesce(top_count, 0) AS top_2gram_count,
       CAST((coalesce(top_count, 0) * 1000000) // greatest(coalesce(total2, 0), 1) AS BIGINT) AS top_2gram_frac_e6,
       CAST((coalesce(dup_hits, 0) * 1000000) // greatest(coalesce(total3, 0), 1) AS BIGINT) AS dup_3gram_frac_e6
FROM b LEFT JOIN a2 ON a2.doc_id = b.doc_id LEFT JOIN a3 ON a3.doc_id = b.doc_id
"""


def q_doc_chunks(spark, sf_dir):
    """Fixed-token-budget document chunking for model context windows
    (functions/quality.py): 16-token chunks with 4-token overlap, last
    chunk short. A pure posexplode projection — zero shuffles, chunks at
    scan speed at any corpus size."""
    from merge_machine_spark.functions.quality import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=16, overlap=4)


SQL_DOC_CHUNKS = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents),
n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(CAST(floor((n - 4 - 1) / 12.0) AS BIGINT) + 1, 1))) AS chunk_idx
  FROM n),
c AS (
  SELECT doc_id, chunk_idx,
         list_slice(toks, chunk_idx * 12 + 1, chunk_idx * 12 + 16) AS ch
  FROM idx)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       len(ch) AS chunk_n_tokens, array_to_string(ch, ' ') AS chunk_text
FROM c
"""


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-dup PAIRS — completes the SimHash dedup path (buckets
    exist as `simhash_buckets`): band the 16-bit signature into 4 x 4-bit
    bands, candidate docs share >= 1 band (LSH guarantee: hamming <= 3
    implies >= 1 untouched band), verify bit_count(xor) <= 3. Hot-band cap
    (<= 200 docs per band value) keeps any join group bounded — at
    production scale the signature is 64-bit with 4 x 16-bit bands, same
    plan shape. Everything JVM-side: band explode is an array projection,
    the join is an equi hash join, hamming is a codegen bit op."""
    docs = _t(spark, sf_dir, "documents")
    sig = docs.select("doc_id", _simhash16_expr().alias("simhash16"))
    bands = sig.select(
        "doc_id",
        "simhash16",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.shiftright("simhash16", 4 * b).bitwiseAND(F.lit(15)).alias("val"),
                )
                for b in range(4)
            ])
        ).alias("bd"),
    ).select("doc_id", "simhash16", "bd.b", "bd.val")
    ok = bands.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("b", "val"))
    ).filter(F.col("__n") <= 200)
    a = ok.select("b", "val", F.col("doc_id").alias("doc_a"), F.col("simhash16").alias("__sa"))
    bb = ok.select("b", "val", F.col("doc_id").alias("doc_b"), F.col("simhash16").alias("__sb"))
    pairs = (
        a.join(bb, ["b", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 3)


_SQL_SIMHASH_SIG = SQL_SIMHASH[: SQL_SIMHASH.index("SELECT doc_id, simhash16, count(*)")]

SQL_SIMHASH_NEAR_DUP = f"""
{_SQL_SIMHASH_SIG.rstrip()},
bands AS (
  SELECT doc_id, simhash16, t.b AS b,
         (simhash16 // (CASE t.b WHEN 0 THEN 1 WHEN 1 THEN 16 WHEN 2 THEN 256 ELSE 4096 END)) % 16 AS val
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)),
ok AS (
  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY b, val) <= 200),
p AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         bit_count(xor(a.simhash16, b2.simhash16)) AS hamming
  FROM ok a JOIN ok b2 ON a.b = b2.b AND a.val = b2.val AND a.doc_id < b2.doc_id)
SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM p WHERE hamming <= 3
"""


def q_golden_record(spark, sf_dir):
    """Survivorship / golden-record merge (operators/clustering.py
    merge_clusters): the dirty-to-clean endgame — near-dup clusters
    (token-Jaccard >= 0.8 -> connected components -> singletons) collapse
    to ONE clean row each: majority-vote lang and source (ties smallest),
    canonical member = longest doc (ties lowest id). Every pick is a scalar
    aggregate (min/max-of-struct), hub-safe, no windows."""
    from merge_machine_spark.operators.clustering import (
        assignments_with_singletons,
        connected_components,
        merge_clusters,
    )

    jac = q_pair_token_jaccard(spark, sf_dir)
    edges = jac.filter(F.col("jaccard_e6") >= 800000).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
    )
    cc = connected_components(edges)
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "n_chars", "lang", "source"
    )
    assigns = assignments_with_singletons(docs, cc)
    out = merge_clusters(docs, assigns, vote_cols=["lang", "source"], prefer_col="n_chars")
    return out.select(
        "cluster_id",
        F.col("canonical_id").cast("bigint").alias("canonical_id"),
        "n_members",
        "best_n_chars",
        "lang_mode",
        "source_mode",
    )


SQL_GOLDEN_RECORD = f"""
WITH RECURSIVE
jac AS ({SQL_PAIR_JACCARD}),
edges AS (
  SELECT DISTINCT least(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS u,
                  greatest(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS v
  FROM jac WHERE jaccard_e6 >= 800000),
und AS (SELECT u AS n, v AS m FROM edges UNION SELECT v, u FROM edges),
reach(n, r) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM und)
  UNION
  SELECT und.n, reach.r FROM und JOIN reach ON und.m = reach.n),
comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
allc AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
         coalesce(c.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id,
         d.n_chars, d.lang, d.source
  FROM documents d LEFT JOIN comp c ON c.doc_id = CAST(d.doc_id AS VARCHAR)),
mx AS (SELECT cluster_id, count(*) AS n_members, max(n_chars) AS best_n_chars
       FROM allc GROUP BY cluster_id),
win AS (
  SELECT a.cluster_id, min(a.doc_id) AS canonical_s
  FROM allc a JOIN mx m ON m.cluster_id = a.cluster_id AND a.n_chars = m.best_n_chars
  GROUP BY a.cluster_id),
lm AS (
  SELECT cluster_id, lang AS lang_mode
  FROM (SELECT cluster_id, lang, count(*) AS c FROM allc GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY cluster_id ORDER BY c DESC, lang ASC) = 1),
sm AS (
  SELECT cluster_id, source AS source_mode
  FROM (SELECT cluster_id, source, count(*) AS c FROM allc GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY cluster_id ORDER BY c DESC, source ASC) = 1)
SELECT m.cluster_id, CAST(w.canonical_s AS BIGINT) AS canonical_id,
       m.n_members, m.best_n_chars, lm.lang_mode, sm.source_mode
FROM mx m
JOIN win w ON w.cluster_id = m.cluster_id
JOIN lm ON lm.cluster_id = m.cluster_id
JOIN sm ON sm.cluster_id = m.cluster_id
"""


def q_pack_sequences(spark, sf_dir):
    """Example packing for pre-training batches (functions/quality.py):
    concat-then-split at document boundaries — salted-md5 bucket, order by
    id within bucket, running token offset, sequence = offset div budget.
    ONE shuffle on bucket; buckets (not docs) are the parallelism unit."""
    from merge_machine_spark.functions.quality import pack_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = pack_documents(docs, budget_tokens=64, n_buckets=16)
    return out.select(
        "doc_id", "bucket", "seq_idx",
        F.col("offset_in_seq").cast("bigint").alias("offset_in_seq"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


SQL_PACK = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
         CAST(concat('0x', substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS bucket
  FROM documents),
s AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS st
  FROM t WHERE n_tokens > 0)
SELECT doc_id, bucket, CAST(st // 64 AS INT) AS seq_idx,
       CAST(st % 64 AS BIGINT) AS offset_in_seq, n_tokens
FROM s
"""


def q_pii_redaction(spark, sf_dir):
    """PII detection + redaction (functions/pii.py): regex classes
    (email/ipv4/phone) in the Java-regex ∩ RE2 subset, counts + flags +
    placeholder-redacted text in ONE codegen projection — zero shuffles,
    scan-speed at 100 TB. PII is laced deterministically from doc_id
    (docs where doc_id % 4 == 0 stay clean) so detection, negation, and
    redaction are all exercised; the oracle reproduces the lacing."""
    from merge_machine_spark.functions.pii import pii_project

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    laced = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-src.example from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, phone).otherwise(F.lit("")),
    )
    base = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 != 0, laced)
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return pii_project(base)


SQL_PII = r"""
WITH laced AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 <> 0 THEN
           coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail-src.example from 10.' || CAST(doc_id % 200 AS VARCHAR)
           || '.' || CAST(doc_id % 250 AS VARCHAR)
           || '.' || CAST(doc_id % 100 AS VARCHAR)
           || CASE WHEN doc_id % 3 = 0 THEN
                ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
         ELSE coalesce(text, '') END AS text
  FROM documents),
c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
         CAST(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
         CAST(len(regexp_extract_all(text, '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS INT) AS n_phone,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS text_redacted
  FROM laced)
SELECT doc_id, n_email, n_ipv4, n_phone,
       (n_email > 0 OR n_ipv4 > 0 OR n_phone > 0) AS has_pii,
       text_redacted
FROM c
"""


def q_domain_cap(spark, sf_dir):
    """URL normalize + host extract + per-domain cap (functions/urls.py):
    the RefinedWeb-style guard against mega-domain dominance. Normalize
    and host are pure regexp projections; the cap is ONE shuffle on
    domain with a salted-md5-ordered row_number over ids only — the
    surviving set is deterministic across runs/engines/partitionings.
    URLs are synthesized deterministically from (source, doc_id) with
    mixed case, scheme, www, query and fragment so every normalization
    rule fires; the oracle reproduces them."""
    from merge_machine_spark.functions.urls import (
        cap_per_domain,
        normalize_url,
        url_host,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.upper(F.col("source")),
            F.lit(".Example.COM/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("/?utm_source=feed#frag"),
        ).alias("url"),
    )
    normd = with_url.select(
        "doc_id", normalize_url(F.col("url")).alias("url_norm")
    ).withColumn("domain", url_host(F.col("url_norm")))
    capped = cap_per_domain(normd, "domain", "doc_id", max_per_domain=15)
    return capped.select("doc_id", "url_norm", "domain", "keep_rank")


SQL_DOMAIN_CAP = r"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || lower(source) || '.example.com/docs/'
         || CAST(doc_id AS VARCHAR) || '/?utm_source=feed#frag' AS url
  FROM documents),
n AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
           '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '[?#].*$', ''), '/+$', '') AS url_norm
  FROM u),
d AS (
  SELECT doc_id, url_norm,
         regexp_extract(url_norm, '^([^/]+)', 1) AS domain
  FROM n),
r AS (
  SELECT doc_id, url_norm, domain,
         row_number() OVER (PARTITION BY domain
                            ORDER BY md5('domaincap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM d)
SELECT doc_id, url_norm, domain, CAST(rn AS INT) AS keep_rank
FROM r
WHERE rn <= 15
"""


def q_bpe_pair_counts(spark, sf_dir):
    """BPE tokenizer-training iteration 0 (functions/bpe.py): ONE
    corpus-scale pass (tokenize + explode + map-side-combinable word
    count), then adjacent-character pair counts weighted by word frequency
    over the VOCAB table — vocab-sized no matter the corpus, which is why
    BPE training scales to 100 TB. Top-50 merge candidates with a
    deterministic (count DESC, pair ASC) tie-break."""
    from merge_machine_spark.functions.bpe import (
        char_pair_counts,
        corpus_word_counts,
        top_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("text")
    wc = corpus_word_counts(docs)
    return top_pairs(char_pair_counts(wc), 50).select(
        "pair", F.col("pair_count").cast("bigint").alias("pair_count")
    )


SQL_BPE_PAIRS = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                            x -> x <> '')) AS word
  FROM documents),
wc AS (SELECT word, count(*) AS wcount FROM toks GROUP BY word),
pos AS (
  SELECT word, wcount, unnest(range(1, len(word))) AS i
  FROM wc WHERE len(word) >= 2),
p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wcount FROM pos)
SELECT pair, CAST(sum(wcount) AS BIGINT) AS pair_count
FROM p GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 50
"""


def q_domain_blocklist_filter(spark, sf_dir):
    """Domain blocklist (functions/urls.py): derive the blocklist from the
    corpus itself — the top-3 domains by doc count (the 'block dominating
    spam domains' policy), deterministic (n_docs DESC, domain ASC) — then
    broadcast LEFT ANTI join so the corpus side never shuffles. Returns
    the surviving (doc_id, domain) rows."""
    from merge_machine_spark.functions.urls import (
        domain_stats,
        filter_blocked_domains,
        normalize_url,
        url_host,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    with_domain = docs.select(
        "doc_id",
        url_host(
            normalize_url(
                F.concat(
                    F.lit("https://www."),
                    F.col("source"),
                    F.lit(".example.com/docs/"),
                    F.col("doc_id").cast("string"),
                )
            )
        ).alias("domain"),
    )
    blocked = (
        domain_stats(with_domain, "domain")
        .orderBy(F.desc("n_docs"), F.asc("domain"))
        .limit(3)
    )
    return filter_blocked_domains(with_domain, blocked, "domain")


SQL_DOMAIN_BLOCKLIST = r"""
WITH d AS (
  SELECT doc_id, lower(source) || '.example.com' AS domain
  FROM documents),
blocked AS (
  SELECT domain FROM d GROUP BY domain
  ORDER BY count(*) DESC, domain ASC LIMIT 3)
SELECT domain, doc_id
FROM d
WHERE domain NOT IN (SELECT domain FROM blocked)
"""


def q_substring_dedup_spans(spark, sf_dir):
    """Exact substring dedup, Lee et al. 2021 shingle approximation
    (functions/substring_dedup.py): duplicated 8-token spans to cut so
    only the canonical (min doc, min pos) occurrence survives; per-doc
    overlapping cut windows merged. Three key-partitioned shuffles: one
    map-side-combinable shingle aggregate (count + min-struct — a
    boilerplate shingle shared by 1e6 docs reduces map-side), one hash
    join of positions to duplicated-shingle stats, one doc-partitioned
    interval-merge window whose grouping reuses its partitioning."""
    from merge_machine_spark.functions.substring_dedup import duplicated_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_spans(docs, L=8)


SQL_SUBSTRING_DEDUP = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
p0 AS (
  SELECT doc_id, unnest(range(1, len(toks) - 8 + 2)) AS pos, toks
  FROM t WHERE len(toks) >= 8),
p AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         array_to_string(toks[pos:pos+7], ' ') AS shingle
  FROM p0),
r AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY shingle) AS n_occ,
         row_number() OVER (PARTITION BY shingle ORDER BY doc_id, pos) AS rn
  FROM p),
cuts AS (
  SELECT doc_id, pos AS s, pos + 7 AS e FROM r WHERE n_occ >= 2 AND rn > 1),
m AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM cuts),
g AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
  FROM m)
SELECT doc_id,
       CAST(min(s) AS INT) AS span_start,
       CAST(max(e) AS INT) AS span_end,
       CAST(max(e) - min(s) + 1 AS INT) AS n_tokens_cut
FROM g GROUP BY doc_id, grp
"""


def q_bigram_lm_scores(spark, sf_dir):
    """CCNet-style LM quality filter (functions/ngram_lm.py): train an
    add-one-smoothed bigram LM on the corpus (two map-side-combinable
    aggregates + a scalar vocab count), score every document by joining
    its bigrams back to the vocabulary-sized stat tables. Integer-e6
    probabilities (`div`, never float) so the oracle replays exactly;
    avg is one IEEE division of two exact integers."""
    from merge_machine_spark.functions.ngram_lm import bigram_lm_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_scores(docs).select(
        "doc_id", "n_bigrams", "sum_p_e6", "avg_p_e6"
    )


SQL_BIGRAM_LM = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
pos AS (
  SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
  FROM t WHERE len(toks) >= 2),
bg AS (
  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM pos),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT x) AS v FROM (SELECT unnest(toks) AS x FROM t)),
s AS (
  SELECT bg.doc_id, ((c12.c12 + 1) * 1000000) // (c1.c1 + v.v) AS p_e6
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(p_e6) AS BIGINT) AS sum_p_e6,
       CAST(sum(p_e6) AS DOUBLE) / count(*) AS avg_p_e6
FROM s GROUP BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_clean_project": q_scan_clean_project,
        "special_keyword": q_special_keyword,
        "tokens_standard": q_tokens_standard,
        "token_doc_frequency": q_token_doc_frequency,
        "top_tokens_per_doc": q_top_tokens_per_doc,
        "exact_dedup_groups": q_exact_dedup_groups,
        "blocking_pairs": q_blocking_pairs,
        "pair_token_jaccard": q_pair_token_jaccard,
        "pair_levenshtein_top1": q_pair_levenshtein_top1,
        "pair_jaro_winkler": q_pair_jaro_winkler,
        "cascade_two_tier": q_cascade_two_tier,
        "confidence_scaling": q_confidence_scaling,
        "must_not_filter": q_must_not_filter,
        "exact_override_union": q_exact_override_union,
        "dedup_reattach": q_dedup_reattach,
        "rolling_precision_curve": q_rolling_precision_curve,
        "label_counters": q_label_counters,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "embedding_cosine_top5": q_embedding_cosine_top5,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_top_orders": q_tpch_top_orders,
        "events_hourly_rollup": q_events_hourly_rollup,
        "simhash_buckets": q_simhash_buckets,
        "connected_components": q_connected_components,
        "core_attach_clusters": q_core_attach_clusters,
        "cluster_score_stats": q_cluster_score_stats,
        "multi_match_best_field": q_multi_match_best_field,
        "must_filter_phrase": q_must_filter_phrase,
        "majority_vote_user": q_majority_vote_user,
        "media_stub_meta": q_media_stub_meta,
        "audio_window_meta": q_audio_window_meta,
        "sessionize_events": q_sessionize_events,
        "asof_click_view": q_asof_click_view,
        "dedup_keep_best": q_dedup_keep_best,
        "train_test_split": q_train_test_split,
        "stratified_sample": q_stratified_sample,
        "split_contamination": q_split_contamination,
        "repetition_stats": q_repetition_stats,
        "doc_chunks": q_doc_chunks,
        "simhash_near_dup": q_simhash_near_dup,
        "golden_record": q_golden_record,
        "pack_sequences": q_pack_sequences,
        "pii_redaction": q_pii_redaction,
        "domain_cap": q_domain_cap,
        "bpe_pair_counts": q_bpe_pair_counts,
        "domain_blocklist_filter": q_domain_blocklist_filter,
        "substring_dedup_spans": q_substring_dedup_spans,
        "bigram_lm_scores": q_bigram_lm_scores,
        # rows-only (non-SQL-expressible; pytest oracles)
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "french_analyzer_tokens": q_french_analyzer_tokens,
        "ann_lsh_top3": q_ann_lsh_top3,
        "ann_ivf_top3": q_ann_ivf_top3,
        "embedding_near_dup": q_embedding_near_dup,
        "winnowing_fingerprints": q_winnowing_fingerprints,
        "fp_near_dup_pairs": q_fp_near_dup_pairs,
        "frame_sample_meta": q_frame_sample_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_clean_project": SQL_SCAN,
        "special_keyword": SQL_SPECIAL_KEYWORD,
        "tokens_standard": _SQL_TOKENS,
        "token_doc_frequency": SQL_TOKEN_DF,
        "top_tokens_per_doc": SQL_TOP_TOKENS,
        "exact_dedup_groups": SQL_EXACT_DEDUP,
        "blocking_pairs": _SQL_BLOCK_PAIRS,
        "pair_token_jaccard": SQL_PAIR_JACCARD,
        "pair_levenshtein_top1": SQL_LEV_TOP1,
        "pair_jaro_winkler": SQL_JARO_WINKLER,
        "cascade_two_tier": SQL_CASCADE,
        "confidence_scaling": SQL_CONFIDENCE,
        "must_not_filter": SQL_MUST_NOT,
        "exact_override_union": SQL_EXACT_OVERRIDE,
        "dedup_reattach": SQL_DEDUP_REATTACH,
        "rolling_precision_curve": SQL_ROLLING,
        "label_counters": SQL_LABEL_COUNTERS,
        "lang_id": SQL_LANG_ID,
        "quality_score": SQL_QUALITY,
        "token_counts": SQL_TOKEN_COUNTS,
        "doc_fingerprint": SQL_FINGERPRINT,
        "embedding_cosine_top5": SQL_EMB_TOP5,
        "tpch_pricing_summary": SQL_TPCH_Q1,
        "tpch_top_orders": SQL_TPCH_Q3,
        "events_hourly_rollup": SQL_HOURLY,
        "simhash_buckets": SQL_SIMHASH,
        "connected_components": SQL_CONNECTED_COMPONENTS,
        "core_attach_clusters": SQL_CORE_ATTACH,
        "cluster_score_stats": SQL_CLUSTER_STATS,
        "multi_match_best_field": SQL_MULTI_MATCH,
        "must_filter_phrase": SQL_MUST_PHRASE,
        "majority_vote_user": SQL_MAJORITY_VOTE,
        "media_stub_meta": SQL_MEDIA_STUB,
        "embedding_near_dup": SQL_EMB_NEAR_DUP,
        "winnowing_fingerprints": SQL_WINNOWING,
        "fp_near_dup_pairs": SQL_FP_NEAR_DUP,
        "frame_sample_meta": SQL_FRAME_SAMPLE,
        "audio_window_meta": SQL_AUDIO_WINDOW,
        "sessionize_events": SQL_SESSIONIZE,
        "asof_click_view": SQL_ASOF,
        "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
        "train_test_split": SQL_SPLIT,
        "stratified_sample": SQL_STRATIFIED,
        "split_contamination": SQL_SPLIT_CONTAMINATION,
        "repetition_stats": SQL_REPETITION,
        "doc_chunks": SQL_DOC_CHUNKS,
        "simhash_near_dup": SQL_SIMHASH_NEAR_DUP,
        "golden_record": SQL_GOLDEN_RECORD,
        "pack_sequences": SQL_PACK,
        "pii_redaction": SQL_PII,
        "domain_cap": SQL_DOMAIN_CAP,
        "bpe_pair_counts": SQL_BPE_PAIRS,
        "domain_blocklist_filter": SQL_DOMAIN_BLOCKLIST,
        "substring_dedup_spans": SQL_SUBSTRING_DEDUP,
        "bigram_lm_scores": SQL_BIGRAM_LM,
    }
