"""Blocking-key / token-stream functions ("analyzers").

The reference delegates text analysis to Elasticsearch custom analyzers
(/root/reference/merge_machine/analyzers/no_resource_analyzer_definitions.py,
resource_analyzer_definitions.py). Each analyzer is a deterministic
text -> token-multiset function; sharing >=1 token is the candidate predicate
(inverted-index retrieval), and token streams feed relevance scoring.

Implementation split (measured, not guessed):
  * cheap channels (special_keyword, standard, n_grams, integers, phonetic,
    gazetteer) are built-in higher-order functions — JVM-side, inside
    whole-stage codegen, sub-second plan compile;
  * the French channels (french, french_estab) are Arrow-batched pandas UDFs
    over the pure-Python core in ``french.py`` — the equivalent built-in
    case-when/HOF tree costs ~30 s of Catalyst/codegen PER QUERY and ships
    multi-MiB task binaries, which would dominate every job at any scale.

Channels (SURVEY.md §2.8):
  F1 special_keyword   char-map + keyword tokenizer + lowercase
  F2 french            standard tokenize, elision, stopwords, light stemming
  F3 french_estab      F2 + legal-form stopwords + abbrev/acronym synonyms
  F4 n_grams           char 3-grams over letter/digit runs
  F5 integers          integer extraction + leading-zero trim + shingles<=5
  F6 city / F7 country gazetteer keep+translate (broadcast dim)
  F8 standard          plain unicode tokenize + lowercase
     english           + possessive strip, English stopwords, Porter stem
                       (pandas UDF over english.py, like the French channels)
  F10 keyword          raw string equality key
  +  phonetic          soundex per token (north-rule addition)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from . import french as FR
from .analyzers_data import FRENCH_ABBREV, FRENCH_ACRONYMS, FRENCH_STOPWORDS, FRENCH_USELESS  # noqa: F401 (re-export)

# special_keyword folds exactly the chars of the reference char_filter
# (no_resource_analyzer_definitions.py:106-110); fuller folding for the rest.
_SPECIAL_SRC, _SPECIAL_DST = "-éèêëàü", " eeeeau"
_ASCII_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ASCII_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fold_ascii(col: Column | str) -> Column:
    return F.translate(_c(col), _ASCII_SRC, _ASCII_DST)


def _non_empty(tokens: Column) -> Column:
    return F.filter(tokens, lambda t: (t.isNotNull()) & (t != F.lit("")))


# --- F1 special_keyword ----------------------------------------------------
def special_keyword(col: Column | str) -> Column:
    """Whole normalized string as a single token (exact-key block):
    char-map '-'->space + fold é/è/ê/ë/à/ü, keyword tokenizer, lowercase."""
    norm = F.lower(F.translate(_c(col), _SPECIAL_SRC, _SPECIAL_DST))
    return F.when(
        F.coalesce(norm, F.lit("")) == F.lit(""), F.array().cast("array<string>")
    ).otherwise(F.array(norm))


def keyword(col: Column | str) -> Column:
    """F10: raw string as single token (ES analyzer_suffix '')."""
    c = _c(col)
    return F.when(
        F.coalesce(c, F.lit("")) == F.lit(""), F.array().cast("array<string>")
    ).otherwise(F.array(c))


# --- F8 standard -----------------------------------------------------------
def standard(col: Column | str) -> Column:
    """Unicode word tokenize + lowercase (ES ``standard`` analyzer)."""
    return _non_empty(F.split(F.lower(F.coalesce(_c(col), F.lit(""))), r"[^\p{L}\p{N}]+"))


# --- F2/F3 French (Arrow pandas UDFs over functions/french.py) --------------
@F.pandas_udf(ArrayType(StringType()))
def _french_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return s.map(FR.french_tokens)


@F.pandas_udf(ArrayType(StringType()))
def _french_estab_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return s.map(FR.french_estab_tokens)


@F.pandas_udf(ArrayType(StringType()))
def _english_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    from .english import english_tokens

    return s.map(english_tokens)


def english(col: Column | str) -> Column:
    """F8 ``english``: ES stock english analyzer semantics — standard
    tokenize, possessive strip, lowercase, English stopwords, Porter stem
    (reference applies it on filter fields, helpers.py:106)."""
    return _english_udf(_c(col))


def french(col: Column | str) -> Column:
    """F2: standard tokenize -> elision -> fold+lower -> stop -> light stem."""
    return _french_udf(_c(col))


def french_estab(col: Column | str) -> Column:
    """F3: establishment-aware French analyzer
    (no_resource_analyzer_definitions.py:16-97 semantics)."""
    return _french_estab_udf(_c(col))


# --- F4 n_grams -------------------------------------------------------------
def n_grams(col: Column | str, n: int = 3) -> Column:
    """Char n-grams (default 3) over letter/digit runs, lowercased
    (no_resource_analyzer_definitions.py:125-144). Runs shorter than n emit
    nothing, matching the ES ngram tokenizer. Pure expression — composable
    anywhere, including inside higher-order-function lambdas (see
    :func:`n_grams_fast` for the explode-path fast variant)."""
    runs = _non_empty(F.split(F.lower(F.coalesce(_c(col), F.lit(""))), r"[^\p{L}\p{N}]+"))
    grams = F.transform(
        runs,
        lambda r: F.when(
            F.length(r) >= n,
            F.transform(F.sequence(F.lit(1), F.length(r) - (n - 1)), lambda i: F.substring(r, i, n)),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.flatten(grams)


def n_grams_fast(col: Column | str, n: int = 3) -> Column:
    """Token-stream-identical fast variant of :func:`n_grams` (r6, guide
    §4.2): the run SPLIT stays the exact JVM regex (``[^\\p{L}\\p{N}]+`` —
    unicode classes the Python ``re`` module does not reproduce exactly),
    while the per-run gram EXPANSION — the nested-HOF part whose interpreted
    lambdas cost ~135us/doc at ~300 chars (measured r6: 6.7s of
    minhash_lsh_pairs' 14s at sf1.0 was the expression alone) — runs as an
    Arrow-batched slice loop in Python. Spark's ``substring``/``length``
    count code points, exactly like Python ``str`` slicing, so the streams
    are identical for ALL unicode input (pinned vs :func:`n_grams` in
    tests/test_analyzers.py).

    Limitation (why this is not the default): a Python-evaluated column
    cannot be nested inside HOF lambdas (Spark UNSUPPORTED_FEATURE), so use
    it where the grams are exploded/aggregated directly — the LSH shingle
    channels — and keep :func:`n_grams` for expression composition."""
    runs = _non_empty(F.split(F.lower(F.coalesce(_c(col), F.lit(""))), r"[^\p{L}\p{N}]+"))

    @F.pandas_udf(ArrayType(StringType()))
    def _expand(rs: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
        def one(runs_arr):
            out: list[str] = []
            if runs_arr is None:
                return out
            for r in runs_arr:
                for i in range(len(r) - (n - 1)):
                    out.append(r[i : i + n])
            return out

        return rs.map(one)

    return _expand(runs)


# --- F5 integers -------------------------------------------------------------
def integers(col: Column | str, max_shingle: int = 5) -> Column:
    """Integer tokens + adjacency shingles
    (no_resource_analyzer_definitions.py:152-182): extract ``(\\d+)`` runs,
    trim leading zeros (``^0+(.*)`` -> ``$1``), then emit every concatenation
    of 1..5 adjacent integers ('' separator) like the ES shingle filter."""
    ints = F.regexp_extract_all(F.coalesce(_c(col), F.lit("")), F.lit(r"(\d+)"), 1)
    ints = F.transform(ints, lambda t: F.regexp_replace(t, "^0+", ""))
    ntok = F.size(ints)
    shingled = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(ntok, F.lit(1))),
            lambda i: F.when(
                i <= ntok,
                F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(max_shingle), ntok - i + 1)),
                    lambda k: F.array_join(F.slice(ints, i, k), ""),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    return F.when(ntok == 0, F.array().cast("array<string>")).otherwise(_non_empty(shingled))


# --- F6/F7 gazetteer channels -------------------------------------------------
def gazetteer(col: Column | str, keep_translate: dict[str, str], shingle_sep: str = " ") -> Column:
    """Keep-and-translate against a gazetteer (city/country analyzers,
    resource_analyzer_definitions.py:127-233): fold+lower tokens, 1-2 token
    shingles, length>=4, keep only gazetteer entries, alias -> canonical.
    ``keep_translate`` is a small in-literal dim; use :func:`gazetteer_join`
    with a real broadcast dim DataFrame at scale."""
    entries: list[Column] = []
    for k, v in keep_translate.items():
        entries.append(F.lit(k))
        entries.append(F.lit(v))
    gmap = F.create_map(*entries) if entries else F.create_map()
    toks = _non_empty(F.split(F.lower(fold_ascii(F.coalesce(_c(col), F.lit("")))), r"[^a-z0-9]+"))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(shingle_sep, F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    all_toks = F.filter(F.concat(toks, bigrams), lambda t: F.length(t) >= 4)
    return _non_empty(F.transform(all_toks, lambda t: F.element_at(gmap, t)))


def gazetteer_join(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    out: str,
    alias_col: str = "alias",
    canon_col: str = "canonical",
    shingle_sep: str = " ",
) -> DataFrame:
    """Scale path for F6/F7: explode tokens AND 1-2 token shingles (same
    candidate stream as :func:`gazetteer`, so multi-word aliases like
    'saint etienne' resolve), broadcast-join the gazetteer dim,
    re-aggregate to array — the dim is broadcast so df never shuffles."""
    toks = _non_empty(F.split(F.lower(fold_ascii(F.coalesce(F.col(col), F.lit("")))), r"[^a-z0-9]+"))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(shingle_sep, F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # same length >= 4 candidate filter as gazetteer() so both F6/F7 paths
    # see an identical stream (ADVICE r2: short aliases must not resolve via
    # the join path only)
    stream = F.filter(F.concat(toks, bigrams), lambda t: F.length(t) >= 4)
    other = list(df.columns)
    exploded = df.select(*other, F.posexplode_outer(stream).alias("_pos", "_tok"))
    joined = exploded.join(F.broadcast(dim), exploded["_tok"] == dim[alias_col], "left")
    return (
        joined.groupBy(*other)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", canon_col))).alias("_s"))
        .select(*other, _non_empty(F.transform("_s", lambda s: s[canon_col])).alias(out))
    )


# --- phonetic ------------------------------------------------------------------
def phonetic(col: Column | str) -> Column:
    """Soundex key per token (north-rule addition; built-in, JVM-side)."""
    toks = _non_empty(F.split(F.lower(fold_ascii(F.coalesce(_c(col), F.lit("")))), r"[^a-zA-Z]+"))
    return _non_empty(F.transform(toks, lambda t: F.soundex(t)))


# --- registry -------------------------------------------------------------------
def _city(col: Column | str) -> Column:
    from .gazetteers import city

    return city(_c(col))


def _country(col: Column | str) -> Column:
    from .gazetteers import country

    return country(_c(col))


CHANNELS = {
    "special_keyword": special_keyword,
    "keyword": keyword,
    "standard": standard,
    "english": english,  # F8: real ES-english semantics (stop + Porter stem)
    "french": french,
    "french_estab": french_estab,
    "n_grams": n_grams,
    "integers": integers,
    "phonetic": phonetic,
    "city": _city,      # F6, mini-gazetteer fixture (swap dim at scale)
    "country": _country,  # F7
}


def analyze(col: Column | str, channel: str, **kwargs) -> Column:
    """Dispatch: text column -> array<string> tokens for ``channel``."""
    if channel not in CHANNELS:
        raise KeyError(f"unknown analyzer channel {channel!r}; have {sorted(CHANNELS)}")
    return CHANNELS[channel](_c(col), **kwargs)
