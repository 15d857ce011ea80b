"""Pure-Python French analyzer core (tokenizer + light stemmer + synonyms).

One canonical implementation shared by:
  * the Spark pandas UDFs in ``analyzers.py`` (Arrow-batched data plane) —
    a pandas UDF here beats the equivalent built-in expression tree, whose
    nested case-when/HOF plan costs tens of seconds of Catalyst/codegen per
    query and serializes multi-MiB task binaries;
  * driver-side calibration and pytest golden-token tests;
  * DuckDB Python-UDF oracles (same function registered in DuckDB gives
    bit-identical token streams for correctness cross-checks).

Semantics mirror the reference analyzers
(/root/reference/merge_machine/analyzers/no_resource_analyzer_definitions.py):
standard tokenize -> elision -> lowercase+fold -> stopwords [-> useless ->
abbrev -> acronyms] -> light French stem. The stemmer is a compact
approximation of Lucene's FrenchLightStemFilter — exact Lucene parity is not
required because both join sides are analyzed by *this* function and
thresholds are calibrated over its token streams (SURVEY.md §7.3).
"""

from __future__ import annotations

import re

from .analyzers_data import FRENCH_ABBREV, FRENCH_ACRONYMS, FRENCH_STOPWORDS, FRENCH_USELESS

_TOKEN_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)
_ELISION_RE = re.compile(r"^(l|m|t|qu|n|s|j|d|c|jusqu|quoiqu|lorsqu|puisqu)['’]", re.IGNORECASE)
_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ",
    "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY",
)
_STOP = set(FRENCH_STOPWORDS)
_STOP_USELESS = _STOP | set(FRENCH_USELESS)


def fold(s: str) -> str:
    return s.translate(_ACCENTS).replace("œ", "oe").replace("æ", "ae")


def light_stem(t: str) -> str:
    """Plural/feminine/derivational suffix strip (see module docstring)."""
    n = len(t)
    if n >= 5 and t.endswith("eaux"):
        t = t[:-1]
    elif n >= 5 and t.endswith("aux"):
        t = t[:-3] + "al"
    elif n >= 4 and t.endswith("x"):
        t = t[:-1]
    n = len(t)
    if n >= 4 and t.endswith("s") and not t.endswith("ss"):
        t = t[:-1]
    n = len(t)
    if n >= 9 and t.endswith("issement"):
        t = t[:-8] + "iss"
    elif n >= 8 and t.endswith("issant"):
        t = t[:-6] + "iss"
    elif n >= 6 and t.endswith("ement"):
        t = t[:-5]
    elif n >= 5 and t.endswith("tion"):
        t = t[:-4] + "t"
    n = len(t)
    if n >= 5 and t.endswith("e"):
        t = t[:-1]
    n = len(t)
    if n >= 4 and t[-1] == t[-2]:
        t = t[:-1]
    return t


def _base_tokens(text: str | None) -> list[str]:
    if not text:
        return []
    out = []
    for m in _TOKEN_RE.finditer(text):
        t = _ELISION_RE.sub("", m.group(0))
        t = fold(t).lower().replace("'", " ").replace("’", " ")
        for piece in t.split():
            if piece:
                out.append(piece)
    return out


def french_tokens(text: str | None) -> list[str]:
    """F2 ``french``: tokenize, elide, fold, stop, stem."""
    return [light_stem(t) for t in _base_tokens(text) if t not in _STOP]


def french_estab_tokens(text: str | None) -> list[str]:
    """F3 ``french_estab``: F2 + legal-form stopwords + abbreviation and
    acronym synonym expansion (applied before stemming, like the ES filter
    chain order)."""
    toks: list[str] = []
    for t in _base_tokens(text):
        if t in _STOP_USELESS:
            continue
        expanded = FRENCH_ABBREV.get(t, [t])
        for e in expanded:
            toks.extend(FRENCH_ACRONYMS.get(e, [e]))
    return [light_stem(t) for t in toks if t]
