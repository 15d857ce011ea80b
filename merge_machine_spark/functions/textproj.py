"""Span -> text projections over the interleaved ``documents`` table.

Input schema (BASELINE.json ``input_hint``):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

The reference operates on flat string columns (every cell ``str``,
/root/reference/examples/example.py:45-54); our richer input maps each of
those logical columns to a *named text projection* over the span array. The
per-row invariant is span-sequence equality (kind, text, media_ref, order):
spans are never mutated — projections are derived columns, and ``doc_id``
re-joins spans at any stage.

Everything here is built-in higher-order functions (filter/transform/
array_sort/concat_ws) — JVM-side, whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_spans(spans: Column | str = "spans") -> Column:
    """Spans ordered by ``offset`` (the invariant order)."""
    col = F.col(spans) if isinstance(spans, str) else spans
    return F.array_sort(col, lambda a, b: a["offset"].cast("int") - b["offset"].cast("int"))


def text_spans(spans: Column | str = "spans") -> Column:
    """Only the ``kind='text'`` spans, in offset order, as array<string>.

    Slims each struct to (text, offset) BEFORE sorting: sorting the full
    struct would force the parquet scan to read every span field —
    ``media_ref`` (and at real scale, media payloads) must never be read for
    a text projection (verify via ReadSchema in PLANS.md)."""
    col = F.col(spans) if isinstance(spans, str) else spans
    slim = F.transform(
        F.filter(col, lambda s: s["kind"] == F.lit("text")),
        lambda s: F.struct(s["text"].alias("text"), s["offset"].cast("int").alias("offset")),
    )
    ordered = F.array_sort(slim, lambda a, b: a["offset"] - b["offset"])
    return F.transform(ordered, lambda s: s["text"])


def full_text(spans: Column | str = "spans") -> Column:
    """All text spans concatenated with single spaces, in offset order.

    This is the analog of the reference's many-to-one column pairing
    (' '.join of source columns, /root/reference/merge_machine/helpers.py:119).
    """
    return F.concat_ws(" ", text_spans(spans))


def media_refs(spans: Column | str = "spans") -> Column:
    """``media_ref`` of media spans in offset order (opaque pointers)."""
    return F.transform(
        F.filter(sorted_spans(spans), lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )


def span_fingerprint(spans: Column | str = "spans") -> Column:
    """Deterministic 64-bit fingerprint of the full span sequence
    (kind, text, media_ref, order). Used to assert the span invariant
    cheaply across checkpoints without comparing struct arrays."""
    canon = F.transform(
        sorted_spans(spans),
        lambda s: F.concat_ws(
            "\x01",
            F.coalesce(s["kind"], F.lit("\x00")),
            F.coalesce(s["text"], F.lit("\x00")),
            F.coalesce(s["media_ref"], F.lit("\x00")),
            F.coalesce(s["offset"].cast("string"), F.lit("\x00")),
        ),
    )
    return F.xxhash64(F.concat_ws("\x02", canon))


def nth_text_span(spans: Column | str, n: int) -> Column:
    """The n-th (0-based) text span, or '' — the analog of addressing one
    reference column (e.g. span 0 = name, span 1 = address in the synthetic
    fixture)."""
    return F.coalesce(F.element_at(text_spans(spans), n + 1), F.lit(""))


TEXT_ONLY_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,offset:int>>"
)


def read_documents_text_only(spark, path: str):
    """Text-plane scan of a documents table: reads the span structs WITHOUT
    ``media_ref`` by supplying an explicit subset schema (parquet serves
    nested subsets natively). Catalyst's nested-schema pruning does not see
    through higher-order-function lambdas (verified in PLANS.md), so for
    text-only pipelines this source-level prune is how media payloads stay
    out of the scan at 100 TB."""
    return spark.read.schema(TEXT_ONLY_SCHEMA).parquet(path)


def project_documents(
    docs: DataFrame,
    projections: dict[str, int | None] | None = None,
    spans_col: str = "spans",
    keep_spans: bool = False,
) -> DataFrame:
    """documents -> (doc_id, <named text projections>...).

    ``projections`` maps output column name -> text-span index (None = full
    concatenated text). Default: one ``full_text`` column. ``keep_spans``
    keeps the raw span array for invariant checks; for the heavy pipeline we
    drop it (column pruning — media bytes/refs never travel with pair data).
    """
    if projections is None:
        projections = {"full_text": None}
    cols = [F.col("doc_id")]
    for name, idx in projections.items():
        cols.append((full_text(spans_col) if idx is None else nth_text_span(spans_col, idx)).alias(name))
    if keep_spans:
        cols.append(F.col(spans_col))
    return docs.select(*cols)
