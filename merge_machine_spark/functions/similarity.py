"""Pair-level string-similarity functions.

These replace Lucene BM25 as the pair score (SURVEY.md §2.8 additions,
north rule: "Jaro-Winkler, Levenshtein, and token-set TF-IDF cosine").
Built-ins where Spark has them (levenshtein); Arrow-batched pandas UDFs
otherwise — never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def levenshtein_norm(a: Column | str, b: Column | str) -> Column:
    """1 - edit_distance/max_len in [0,1]; built-in, JVM-side."""
    ca = F.coalesce(F.col(a) if isinstance(a, str) else a, F.lit(""))
    cb = F.coalesce(F.col(b) if isinstance(b, str) else b, F.lit(""))
    denom = F.greatest(F.length(ca), F.length(cb), F.lit(1))
    return F.lit(1.0) - F.levenshtein(ca, cb).cast("double") / denom.cast("double")


def _jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # DuckDB convention: empty-vs-anything (incl. empty) is 0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(len1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler_py(s1: str, s2: str, prefix_scale: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Classic Jaro-Winkler (prefix bonus <=4 units, applied above the 0.7
    boost threshold) — semantics match DuckDB's ``jaro_winkler_similarity``
    bit-for-bit (hypothesis-tested), INCLUDING its UTF-8 *byte* alphabet:
    DuckDB matches bytes, not code points, so the fallback encodes first —
    otherwise the fast path (DuckDB in the worker) and this fallback would
    disagree on accented text."""
    b1 = (s1 or "").encode("utf-8")
    b2 = (s2 or "").encode("utf-8")
    j = _jaro(b1, b2)
    if j > boost_threshold:
        prefix = 0
        for a, b in zip(b1[:4], b2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        j += prefix * prefix_scale * (1.0 - j)
    return j


_DUCK_CON = None  # per-worker-process cached connection (workers are processes)


def _duckdb_jw_batch(a: pd.Series, b: pd.Series) -> pd.Series | None:
    """Vectorized Jaro-Winkler via DuckDB's C implementation — the same
    function the correctness oracle runs, so scores are bit-identical by
    construction, and ~60x faster than the Python char loop. Returns None
    when duckdb is unavailable on the worker (caller falls back)."""
    global _DUCK_CON
    try:
        if _DUCK_CON is None:
            import duckdb

            _DUCK_CON = duckdb.connect()
            # one thread per Spark python worker: the executor already runs
            # one worker per core; a default (all-cores) DuckDB pool inside
            # EACH worker oversubscribes cores^2-fold and collapses throughput
            _DUCK_CON.execute("SET threads=1")
            _DUCK_CON.execute("SET preserve_insertion_order=true")
        batch = pd.DataFrame({"i": np.arange(len(a)), "a": a.to_numpy(), "b": b.to_numpy()})
        _DUCK_CON.register("_jw_batch", batch)
        out = _DUCK_CON.execute(
            "SELECT jaro_winkler_similarity(a, b) AS jw FROM _jw_batch ORDER BY i"
        ).fetchdf()["jw"]
        _DUCK_CON.unregister("_jw_batch")
        return out.astype("float64").reset_index(drop=True)
    except Exception:  # pragma: no cover - exercised only without duckdb
        return None


_FALLBACK_WARNED = False  # once per worker process


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    a = a.fillna("")
    b = b.fillna("")
    # DuckDB's C implementation measures 3-10x faster than our own C JW
    # kernel (native_sim.jw_batch) at every length tried (r6 microbench:
    # 20k x 96-char pairs 0.08s vs 0.27s; 300-char 0.14s vs 1.35s), so it
    # stays the primary path; the native kernel slots in as the SECOND
    # fallback — still ~5x the pure-Python loop and bit-identical
    # (tests/test_native_sim.py) — before the Python kernel.
    fast = _duckdb_jw_batch(a, b)
    if fast is not None:
        return fast
    from .native_sim import have_native, jw_batch

    if have_native():
        return pd.Series(jw_batch(a.tolist(), b.tolist()), dtype="float64")
    global _FALLBACK_WARNED
    if not _FALLBACK_WARNED:
        _FALLBACK_WARNED = True
        import sys

        # surfaces in the executor's stderr log — a silent ~60x per-worker
        # slowdown on a mixed-env cluster is an operational trap (VERDICT r2 #6)
        print(
            "merge_machine_spark: duckdb unavailable in this worker; "
            "jaro_winkler falling back to the ~60x slower pure-Python kernel "
            "(byte-parity verified). Install duckdb on executors for the fast path.",
            file=sys.stderr,
            flush=True,
        )
    return pd.Series([jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64")


def _jw_arrow_impl(aa, bb):  # pragma: no cover - exercised via Spark
    """pyarrow.Array batch kernel: DuckDB reads the Arrow buffers zero-copy
    and the result comes back as Arrow — no pandas object-string
    materialization in either direction (guide §4.2). Same fallback chain
    and bit-identical scores as the pandas path (same DuckDB function, same
    null->\"\" coercion; parity pytest in test_native_sim.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    global _DUCK_CON
    try:
        if _DUCK_CON is None:
            import duckdb

            _DUCK_CON = duckdb.connect()
            _DUCK_CON.execute("SET threads=1")  # see _duckdb_jw_batch
            _DUCK_CON.execute("SET preserve_insertion_order=true")
        tbl = pa.table({"a": pc.fill_null(aa, ""), "b": pc.fill_null(bb, "")})
        _DUCK_CON.register("_jw_batch_arrow", tbl)
        out = _DUCK_CON.execute(
            "SELECT jaro_winkler_similarity(a, b) AS jw FROM _jw_batch_arrow"
        ).arrow()
        _DUCK_CON.unregister("_jw_batch_arrow")
        col = out.column("jw").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
        return col.cast(pa.float64())
    except Exception:
        pass
    xs = ["" if x is None else x for x in aa.to_pylist()]
    ys = ["" if y is None else y for y in bb.to_pylist()]
    from .native_sim import have_native, jw_batch

    if have_native():
        return pa.array(jw_batch(xs, ys), type=pa.float64())
    global _FALLBACK_WARNED
    if not _FALLBACK_WARNED:
        _FALLBACK_WARNED = True
        import sys

        print(
            "merge_machine_spark: duckdb unavailable in this worker; "
            "jaro_winkler falling back to the ~60x slower pure-Python kernel "
            "(byte-parity verified). Install duckdb on executors for the fast path.",
            file=sys.stderr,
            flush=True,
        )
    return pa.array([jaro_winkler_py(x, y) for x, y in zip(xs, ys)], type=pa.float64())


try:  # Spark 4.1+: vectorized Arrow UDF (pa.Array in/out, no pandas step)
    jaro_winkler_arrow = F.arrow_udf(_jw_arrow_impl, DoubleType())
except AttributeError:  # pragma: no cover - older Spark
    jaro_winkler_arrow = None


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched Jaro-Winkler similarity in [0,1]. Primary path is the
    Arrow-native UDF (r6: 1.20s vs 1.73s for the pandas_udf on 4.78M
    96-char pairs — the pandas path builds ~10M Python string objects just
    to hand DuckDB data it could read zero-copy); the pandas_udf remains
    for Spark without arrow_udf."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if jaro_winkler_arrow is not None:
        return jaro_winkler_arrow(ca, cb)
    return jaro_winkler_udf(ca, cb)


def token_jaccard(tok_a: Column, tok_b: Column) -> Column:
    """|A∩B| / |A∪B| over token arrays — built-in array functions."""
    da = F.array_distinct(tok_a)
    db = F.array_distinct(tok_b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    union = F.size(F.array_union(da, db)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def token_overlap(tok_a: Column, tok_b: Column) -> Column:
    """|A∩B| — the reference's core token-overlap signal
    (/root/reference/merge_machine/es_labeller.py:551-637 semantics: the
    CoreScorer counts shared analyzed tokens between the two sides)."""
    return F.size(F.array_intersect(F.array_distinct(tok_a), F.array_distinct(tok_b)))


def cosine_embeddings(a: Column, b: Column) -> Column:
    """Cosine over two array<float|double> columns via higher-order
    functions — JVM-side, sequential fold (deterministic order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    n2 = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).otherwise(F.lit(0.0))
