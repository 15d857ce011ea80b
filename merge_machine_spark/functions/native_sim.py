"""Native (C) batch kernels for pair-plane string similarity.

Why this exists (spark_optimization_guide.md §4.2: "do the heavy lifting in
native code inside the UDF"): the pair plane evaluates O(len^2) dynamic
programs per candidate pair. At sf1.0 the blocked pair table is ~1.4M pairs
of ~300-char texts — ~1.2e11 DP cells for Levenshtein alone. The JVM
built-in runs that in ~40s on 32 cores; the bit-parallel Myers algorithm
(Myers 1999, Hyyrö 2003 block extension — public literature) does the same
work in O(ceil(m/64)·n) word operations, ~20-60x fewer ops.

The kernel is compiled once per process with the system C compiler into a
cached shared object (keyed by source hash, atomic rename — safe under
concurrent worker start-up). Everything degrades gracefully:

  * no C compiler / compile failure  -> ``get_lib()`` returns None and the
    callers keep their previous implementations (JVM ``levenshtein`` /
    DuckDB ``jaro_winkler_similarity``);
  * non-ASCII strings -> Levenshtein falls back per-pair to an exact
    O(m·n) DP over UTF-32 code points (same unit as Spark's built-in);
  * Jaro-Winkler operates on UTF-8 *bytes* by design — byte-for-byte the
    semantics of ``similarity.jaro_winkler_py`` and DuckDB's
    ``jaro_winkler_similarity`` (verified in tests).

Equivalence guarantees (tests/test_native_sim.py):
  * ``lev_batch`` == exact DP == Spark ``levenshtein`` on random unicode;
  * Myers block path == plain DP on random ASCII incl. lengths >64/>128;
  * ``jw_batch`` bit-identical to ``jaro_winkler_py`` (and therefore to
    DuckDB) on random strings.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- plain DP over uint32 code points (exact fallback) ---- */
static int64_t lev_pair_u32(const uint32_t* A, int64_t la,
                            const uint32_t* B, int64_t lb, int32_t* row) {
    while (la > 0 && lb > 0 && A[0] == B[0]) { A++; B++; la--; lb--; }
    while (la > 0 && lb > 0 && A[la-1] == B[lb-1]) { la--; lb--; }
    if (la == 0) return lb;
    if (lb == 0) return la;
    if (lb > la) { const uint32_t* T = A; A = B; B = T; int64_t t = la; la = lb; lb = t; }
    for (int64_t j = 0; j <= lb; j++) row[j] = (int32_t)j;
    for (int64_t i = 1; i <= la; i++) {
        int32_t prev = row[0];
        row[0] = (int32_t)i;
        uint32_t ca = A[i-1];
        for (int64_t j = 1; j <= lb; j++) {
            int32_t cur = row[j];
            int32_t v = prev + (ca != B[j-1]);
            int32_t d = row[j] + 1;
            if (d < v) v = d;
            d = row[j-1] + 1;
            if (d < v) v = d;
            row[j] = v;
            prev = cur;
        }
    }
    return row[lb];
}

void lev_plain_batch_u32(const uint32_t* a_data, const int64_t* a_off,
                         const uint32_t* b_data, const int64_t* b_off,
                         int64_t n, int64_t* out) {
    int64_t maxlen = 1;
    for (int64_t p = 0; p < n; p++) {
        int64_t la = a_off[p+1] - a_off[p];
        int64_t lb = b_off[p+1] - b_off[p];
        if (la > maxlen) maxlen = la;
        if (lb > maxlen) maxlen = lb;
    }
    int32_t* row = (int32_t*)malloc((size_t)(maxlen + 1) * sizeof(int32_t));
    if (!row) { for (int64_t p = 0; p < n; p++) out[p] = -1; return; }
    for (int64_t p = 0; p < n; p++)
        out[p] = lev_pair_u32(a_data + a_off[p], a_off[p+1] - a_off[p],
                              b_data + b_off[p], b_off[p+1] - b_off[p], row);
    free(row);
}

/* ---------------- Myers/Hyyro bit-parallel Levenshtein over bytes ------ */
/* Global (NW) edit distance; score tracked at bit (la-1)%64 of the last
 * block; boundary row D[0][j]=j enters block 0 as hin=+1 each column. */
static int64_t lev_pair_myers_u8(const uint8_t* A, int64_t la,
                                 const uint8_t* B, int64_t lb,
                                 uint64_t* Peq, uint64_t* Pv, uint64_t* Mv,
                                 int32_t* row32) {
    while (la > 0 && lb > 0 && A[0] == B[0]) { A++; B++; la--; lb--; }
    while (la > 0 && lb > 0 && A[la-1] == B[lb-1]) { la--; lb--; }
    if (la == 0) return lb;
    if (lb == 0) return la;
    /* pattern = shorter side: fewer words per column */
    if (la > lb) { const uint8_t* T = A; A = B; B = T; int64_t t = la; la = lb; lb = t; }
    if (la <= 32) {
        /* tiny patterns: plain DP row beats Peq setup cost */
        for (int64_t j = 0; j <= la; j++) row32[j] = (int32_t)j;
        for (int64_t i = 1; i <= lb; i++) {
            int32_t prev = row32[0];
            row32[0] = (int32_t)i;
            uint8_t cb = B[i-1];
            for (int64_t j = 1; j <= la; j++) {
                int32_t cur = row32[j];
                int32_t v = prev + (cb != A[j-1]);
                int32_t d = row32[j] + 1;
                if (d < v) v = d;
                d = row32[j-1] + 1;
                if (d < v) v = d;
                row32[j] = v;
                prev = cur;
            }
        }
        return row32[la];
    }
    int64_t words = (la + 63) >> 6;
    memset(Peq, 0, 256 * (size_t)words * sizeof(uint64_t));
    for (int64_t i = 0; i < la; i++)
        Peq[(int64_t)A[i] * words + (i >> 6)] |= 1ULL << (i & 63);
    for (int64_t w = 0; w < words; w++) { Pv[w] = ~0ULL; Mv[w] = 0ULL; }
    int64_t score = la;
    int last = (int)((la - 1) & 63);
    for (int64_t j = 0; j < lb; j++) {
        const uint64_t* eqc = Peq + (int64_t)B[j] * words;
        int hin = 1;
        for (int64_t w = 0; w < words; w++) {
            uint64_t Eq = eqc[w];
            uint64_t Pvw = Pv[w], Mvw = Mv[w];
            uint64_t hinneg = (uint64_t)(hin < 0);
            uint64_t Xv = Eq | Mvw;
            Eq |= hinneg;
            uint64_t Xh = (((Eq & Pvw) + Pvw) ^ Pvw) | Eq;
            uint64_t Ph = Mvw | ~(Xh | Pvw);
            uint64_t Mh = Pvw & Xh;
            if (w == words - 1)
                score += (int64_t)((Ph >> last) & 1ULL) - (int64_t)((Mh >> last) & 1ULL);
            int hout = (int)((Ph >> 63) & 1ULL) - (int)((Mh >> 63) & 1ULL);
            Ph = (Ph << 1) | (uint64_t)(hin > 0);
            Mh = (Mh << 1) | hinneg;
            Pv[w] = Mh | ~(Xv | Ph);
            Mv[w] = Ph & Xv;
            hin = hout;
        }
    }
    return score;
}

void lev_myers_batch_u8(const uint8_t* a_data, const int64_t* a_off,
                        const uint8_t* b_data, const int64_t* b_off,
                        int64_t n, int64_t* out) {
    int64_t maxlen = 1;
    for (int64_t p = 0; p < n; p++) {
        int64_t la = a_off[p+1] - a_off[p];
        int64_t lb = b_off[p+1] - b_off[p];
        if (la > maxlen) maxlen = la;
        if (lb > maxlen) maxlen = lb;
    }
    int64_t maxw = (maxlen + 63) >> 6;
    uint64_t* Peq = (uint64_t*)malloc(256 * (size_t)maxw * sizeof(uint64_t));
    uint64_t* Pv = (uint64_t*)malloc((size_t)maxw * sizeof(uint64_t));
    uint64_t* Mv = (uint64_t*)malloc((size_t)maxw * sizeof(uint64_t));
    int32_t* row32 = (int32_t*)malloc((size_t)(maxlen + 1) * sizeof(int32_t));
    if (!Peq || !Pv || !Mv || !row32) {
        free(Peq); free(Pv); free(Mv); free(row32);
        for (int64_t p = 0; p < n; p++) out[p] = -1;
        return;
    }
    for (int64_t p = 0; p < n; p++)
        out[p] = lev_pair_myers_u8(a_data + a_off[p], a_off[p+1] - a_off[p],
                                   b_data + b_off[p], b_off[p+1] - b_off[p],
                                   Peq, Pv, Mv, row32);
    free(Peq); free(Pv); free(Mv); free(row32);
}

/* ---------------- Jaro-Winkler over UTF-8 bytes ------------------------ */
/* Exact port of similarity.jaro_winkler_py (itself bit-parity-verified
 * against DuckDB's jaro_winkler_similarity): byte alphabet, prefix bonus
 * <=4 *bytes* above the 0.7 boost threshold, identical double-op order. */
static double jaro_u8(const uint8_t* s1, int64_t len1,
                      const uint8_t* s2, int64_t len2,
                      uint8_t* m1, uint8_t* m2) {
    if (len1 == 0 || len2 == 0) return 0.0;
    if (len1 == len2 && memcmp(s1, s2, (size_t)len1) == 0) return 1.0;
    int64_t mw = (len1 > len2 ? len1 : len2) / 2 - 1;
    if (mw < 0) mw = 0;
    memset(m1, 0, (size_t)len1);
    memset(m2, 0, (size_t)len2);
    int64_t matches = 0;
    for (int64_t i = 0; i < len1; i++) {
        int64_t lo = i - mw; if (lo < 0) lo = 0;
        int64_t hi = i + mw + 1; if (hi > len2) hi = len2;
        uint8_t c = s1[i];
        for (int64_t j = lo; j < hi; j++) {
            if (!m2[j] && s2[j] == c) { m1[i] = 1; m2[j] = 1; matches++; break; }
        }
    }
    if (matches == 0) return 0.0;
    int64_t t = 0, j = 0;
    for (int64_t i = 0; i < len1; i++) {
        if (m1[i]) {
            while (!m2[j]) j++;
            if (s1[i] != s2[j]) t++;
            j++;
        }
    }
    t /= 2;
    double md = (double)matches;
    return (md / (double)len1 + md / (double)len2 + (md - (double)t) / md) / 3.0;
}

void jw_batch_u8(const uint8_t* a_data, const int64_t* a_off,
                 const uint8_t* b_data, const int64_t* b_off,
                 int64_t n, double* out) {
    int64_t maxlen = 1;
    for (int64_t p = 0; p < n; p++) {
        int64_t la = a_off[p+1] - a_off[p];
        int64_t lb = b_off[p+1] - b_off[p];
        if (la > maxlen) maxlen = la;
        if (lb > maxlen) maxlen = lb;
    }
    uint8_t* m1 = (uint8_t*)malloc((size_t)maxlen);
    uint8_t* m2 = (uint8_t*)malloc((size_t)maxlen);
    if (!m1 || !m2) { free(m1); free(m2); for (int64_t p = 0; p < n; p++) out[p] = -1.0; return; }
    for (int64_t p = 0; p < n; p++) {
        const uint8_t* A = a_data + a_off[p];
        const uint8_t* B = b_data + b_off[p];
        int64_t la = a_off[p+1] - a_off[p];
        int64_t lb = b_off[p+1] - b_off[p];
        double jv = jaro_u8(A, la, B, lb, m1, m2);
        if (jv > 0.7) {
            int64_t prefix = 0;
            int64_t pm = la < lb ? la : lb;
            if (pm > 4) pm = 4;
            for (int64_t i = 0; i < pm; i++) {
                if (A[i] == B[i]) prefix++;
                else break;
            }
            jv += (double)prefix * 0.1 * (1.0 - jv);
        }
        out[p] = jv;
    }
    free(m1); free(m2);
}
"""

_LIB: ctypes.CDLL | None = None
_TRIED = False


def _so_path() -> str:
    h = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache = os.environ.get("MM_NATIVE_CACHE_DIR", tempfile.gettempdir())
    return os.path.join(cache, f"mm_native_sim_{h}.so")


def _build() -> str | None:
    """Compile the kernel to a hash-keyed cached .so (atomic rename — safe
    when several Spark python workers race at task start)."""
    path = _so_path()
    if os.path.exists(path):
        return path
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        try:
            with tempfile.NamedTemporaryFile("w", suffix=".c", delete=False) as src:
                src.write(_C_SRC)
                src_path = src.name
            tmp_out = path + f".tmp{os.getpid()}"
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp_out, src_path],
                capture_output=True, timeout=120,
            )
            os.unlink(src_path)
            if r.returncode == 0:
                os.replace(tmp_out, path)  # atomic
                return path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib() -> ctypes.CDLL | None:
    """The compiled kernel, or None (callers then keep their JVM/DuckDB
    paths). Cached per process; workers reuse the same cached .so file."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.lev_myers_batch_u8.argtypes = [u8p, i64p, u8p, i64p, ctypes.c_int64, i64p]
        lib.lev_myers_batch_u8.restype = None
        lib.lev_plain_batch_u32.argtypes = [u32p, i64p, u32p, i64p, ctypes.c_int64, i64p]
        lib.lev_plain_batch_u32.restype = None
        lib.jw_batch_u8.argtypes = [u8p, i64p, u8p, i64p, ctypes.c_int64, f64p]
        lib.jw_batch_u8.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return get_lib() is not None


def _flatten_ascii(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    data = np.frombuffer("".join(strs).encode("ascii"), dtype=np.uint8)
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=off[1:])
    return data, off


def _flatten_u32(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    data = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=off[1:])
    return data, off


def _flatten_utf8(strs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=off[1:])
    return data, off


def lev_batch(a: list, b: list) -> np.ndarray:
    """Exact Levenshtein distance (code-point units — Spark/DuckDB parity)
    for parallel string lists. ASCII pairs run the Myers bit-parallel byte
    kernel; any pair containing non-ASCII runs the exact code-point DP.
    Nones are treated per Spark semantics by the caller (this function
    requires non-null strings)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native kernel unavailable")
    n = len(a)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    ascii_mask = np.fromiter(
        ((x.isascii() and y.isascii()) for x, y in zip(a, b)), dtype=bool, count=n
    )
    if ascii_mask.all():
        ad, ao = _flatten_ascii(a)
        bd, bo = _flatten_ascii(b)
        lib.lev_myers_batch_u8(ad, ao, bd, bo, n, out)
        return out
    idx_a = np.nonzero(ascii_mask)[0]
    idx_u = np.nonzero(~ascii_mask)[0]
    if len(idx_a):
        ad, ao = _flatten_ascii([a[i] for i in idx_a])
        bd, bo = _flatten_ascii([b[i] for i in idx_a])
        sub = np.empty(len(idx_a), dtype=np.int64)
        lib.lev_myers_batch_u8(ad, ao, bd, bo, len(idx_a), sub)
        out[idx_a] = sub
    if len(idx_u):
        ad, ao = _flatten_u32([a[i] for i in idx_u])
        bd, bo = _flatten_u32([b[i] for i in idx_u])
        sub = np.empty(len(idx_u), dtype=np.int64)
        lib.lev_plain_batch_u32(ad, ao, bd, bo, len(idx_u), sub)
        out[idx_u] = sub
    return out


def lev_pairs_map_arrow(it):
    """``mapInArrow`` kernel: batches of (id_a, id_b, ta, tb) -> batches of
    (id_a, id_b, lev:int32). Null text on either side -> null lev (Spark
    ``levenshtein`` semantics). Module-level so Spark python workers import
    it by reference and share the per-process compiled kernel."""
    import pyarrow as pa

    for batch in it:
        a = batch.column("ta").to_pylist()
        b = batch.column("tb").to_pylist()
        if (batch.column("ta").null_count or batch.column("tb").null_count):
            vals: list[int | None] = [None] * len(a)
            idx = [i for i in range(len(a)) if a[i] is not None and b[i] is not None]
            sub = lev_batch([a[i] for i in idx], [b[i] for i in idx])
            for k, i in enumerate(idx):
                vals[i] = int(sub[k])
            lev = pa.array(vals, type=pa.int32())
        else:
            lev = pa.array(lev_batch(a, b).astype(np.int32), type=pa.int32())
        yield pa.RecordBatch.from_arrays(
            [batch.column("id_a"), batch.column("id_b"), lev], names=["id_a", "id_b", "lev"]
        )


def jw_batch(a: list, b: list) -> np.ndarray:
    """Jaro-Winkler over UTF-8 bytes — bit-identical to
    ``similarity.jaro_winkler_py`` / DuckDB ``jaro_winkler_similarity``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native kernel unavailable")
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    ad, ao = _flatten_utf8([(x or "").encode("utf-8") for x in a])
    bd, bo = _flatten_utf8([(x or "").encode("utf-8") for x in b])
    lib.jw_batch_u8(ad, ao, bd, bo, n, out)
    return out
