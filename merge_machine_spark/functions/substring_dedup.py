"""Exact substring deduplication (corpus-level duplicated-span removal).

Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" (arXiv 2107.06499), removes every duplicated substring of >= 50
tokens from the training corpus, keeping one occurrence. Their exact
construction is a corpus-wide suffix array — inherently single-machine.
The standard distributed approximation (used here) works on fixed-length
token shingles:

  a span is duplicated iff every L-token shingle inside it occurs more
  than once corpus-wide; cutting all non-canonical occurrences of every
  duplicated shingle and merging the overlapping cut windows removes
  exactly the duplicated regions (maximal duplicated runs of length
  M >= L become merged intervals of their M - L + 1 shingle windows).

Canonical-occurrence policy: for each duplicated shingle the occurrence
with (min doc_id, then min pos) survives; every other occurrence is cut.
This keeps the first copy of boilerplate and strips the rest, like the
reference algorithm's keep-one behavior.

Scale shape (three shuffles, all key-partitioned):
  1. shingle stats: positions are a pure slice/concat projection
     (posexplode), then ONE map-side-combinable aggregate per shingle —
     count + min-struct((doc_id, pos)) — so a boilerplate shingle shared
     by 10^6 docs reduces map-side, never materializing its occurrence
     list.
  2. join positions -> duplicated-shingle stats: hash join on the shingle
     key; the build side is one row per DISTINCT duplicated shingle (AQE
     broadcasts it when small). For 100 TB runs set ``hashed=True`` to
     join on xxhash64(shingle) instead of the string — same plan, 8-byte
     keys (the oracled contract query uses the string form so DuckDB can
     replay it).
  3. per-doc interval merge: running-max window + cumulative group id,
     then a (doc_id, grp) aggregate that REUSES the window's hash
     partitioning on doc_id — no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"[^a-z0-9]+"


def _toks(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TOKEN_SPLIT),
        lambda t: t != F.lit(""),
    )


def shingle_positions(
    docs: DataFrame, L: int, id_col: str = "doc_id", text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, pos, shingle) — one row per L-token window, pos 1-based.
    Pure projection + posexplode; docs shorter than L emit nothing."""
    if L < 2:
        raise ValueError(f"L must be >= 2, got {L}")
    base = docs.select(F.col(id_col), _toks(text_col).alias("__toks"))
    windows = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (L - 1)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(" ", F.slice("__toks", i, L)).alias("shingle"),
        ),
    )
    out = (
        base.filter(F.size("__toks") >= L)
        .select(id_col, F.explode(windows).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.shingle").alias("shingle"))
    )
    if hashed:
        out = out.withColumn("shingle", F.xxhash64("shingle"))
    return out


def duplicated_spans(
    docs: DataFrame, L: int = 8, id_col: str = "doc_id", text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_tokens_cut) — 1-based inclusive
    token intervals to CUT so that only the canonical (first) occurrence
    of every duplicated L-token shingle survives. Overlapping/adjacent
    cut windows are merged per document."""
    pos = shingle_positions(docs, L, id_col, text_col, hashed=hashed)
    stats = pos.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("canon"),
    )
    dup = stats.filter(F.col("n_occ") >= 2).select(
        "shingle",
        F.col(f"canon.{id_col}").alias("__cdoc"),
        F.col("canon.pos").alias("__cpos"),
    )
    cuts = (
        pos.join(dup, "shingle")
        .filter(~((F.col(id_col) == F.col("__cdoc")) & (F.col("pos") == F.col("__cpos"))))
        .select(id_col, F.col("pos").alias("s"), (F.col("pos") + (L - 1)).alias("e"))
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = cuts.withColumn(
        "__new", F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end + 1), 1).otherwise(0)
    ).withColumn("__grp", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("int").alias("n_tokens_cut"),
        )
    )


def apply_span_cuts(
    docs: DataFrame, spans: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rewrite each document with its cut spans removed: tokens whose
    1-based position falls in any span are dropped, the rest re-join with
    single spaces into ``text_dedup``. Docs with no spans pass through
    (left join). Per-doc span lists are small (merged intervals), so the
    collect_list side is a per-key array, never a corpus-scale state."""
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = docs.join(span_lists, id_col, "left")
    toks = _toks(text_col)
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct((i + 1).alias("pos"), t.alias("tok"))),
        lambda st: ~F.exists(
            F.coalesce(F.col("__spans"), F.array().cast("array<struct<span_start:int,span_end:int>>")),
            lambda sp: (st["pos"] >= sp["span_start"]) & (st["pos"] <= sp["span_end"]),
        ),
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", F.transform(kept, lambda st: st["tok"])).alias("text_dedup"),
    )
