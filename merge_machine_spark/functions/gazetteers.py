"""Mini gazetteer fixtures for the city/country channels (F6/F7).

The reference builds these from public geonames / mledoze-countries dumps
(/root/reference/merge_machine/analyzers/gen_resources.py) into ES
keep-words + synonym files. Here they are small broadcast dimensions
(alias -> canonical); production deployments would load the full dumps into
the same shape (FIXTURES.md §5 prescribes an in-repo ~20-entry fixture).
"""

from __future__ import annotations

# alias -> canonical city name (accent-folded lowercase; includes common
# alternate spellings like the reference's synonym translation)
CITY_GAZETTEER: dict[str, str] = {
    "paris": "paris",
    "lyon": "lyon",
    "marseille": "marseille",
    "toulouse": "toulouse",
    "bordeaux": "bordeaux",
    "nantes": "nantes",
    "strasbourg": "strasbourg",
    "montpellier": "montpellier",
    "lille": "lille",
    "rennes": "rennes",
    "grenoble": "grenoble",
    "dijon": "dijon",
    "angers": "angers",
    "nimes": "nimes",
    "saint etienne": "saint-etienne",
    "st etienne": "saint-etienne",
    "le havre": "le-havre",
    "clermont ferrand": "clermont-ferrand",
    "aix en provence": "aix-en-provence",
    "marseilles": "marseille",
}

# alias -> canonical country (mledoze/countries shape: common + alt spellings)
COUNTRY_GAZETTEER: dict[str, str] = {
    "france": "france",
    "republique_francaise": "france",
    "allemagne": "germany",
    "germany": "germany",
    "deutschland": "germany",
    "espagne": "spain",
    "spain": "spain",
    "espana": "spain",
    "italie": "italy",
    "italy": "italy",
    "italia": "italy",
    "belgique": "belgium",
    "belgium": "belgium",
    "suisse": "switzerland",
    "switzerland": "switzerland",
    "royaume_uni": "united-kingdom",
    "united_kingdom": "united-kingdom",
    "angleterre": "united-kingdom",
    "portugal": "portugal",
    "pays_bas": "netherlands",
    "netherlands": "netherlands",
}


def load_gazetteer_dim(
    spark,
    source,
    name_col: str = "name",
    alternates_col: str = "alternates",
    alt_sep: str = "|",
    join_char: str = " ",
):
    """S7 real gazetteer ingest — the DataFrame analog of the reference's
    dump -> keep/synonym resource build (gen_resources.py:85-259,
    write_keep_syn): from a (name, alternates) dump (CSV path or DataFrame;
    ``alternates`` is an ``alt_sep``-separated list) produce the broadcast
    dim (alias, canonical) that :func:`~.analyzers.gazetteer_join` consumes.

    Normalization mirrors write_keep_syn: asciifold, '-'/'\\'' -> space,
    lowercase, strip, collapse whitespace to ``join_char`` (the reference
    uses '_'; the city channel shingles with ' '). The name itself is always
    one of its aliases; empty aliases are dropped; (alias, canonical) pairs
    are distinct. Runs as pure DataFrame ops — a 100M geonames dump ingests
    distributed, then broadcasts only the dim."""
    from pyspark.sql import functions as F

    from .analyzers import fold_ascii

    df = spark.read.option("header", True).csv(source) if isinstance(source, str) else source

    def norm(c):
        folded = F.lower(fold_ascii(F.translate(c, "-'", "  ")))
        return F.regexp_replace(F.trim(folded), r"\s+", join_char)

    import re

    base = df.select(
        norm(F.col(name_col)).alias("canonical"),
        F.concat(
            F.array(F.col(name_col)),
            F.coalesce(F.split(F.col(alternates_col), re.escape(alt_sep), -1), F.array().cast("array<string>")),
        ).alias("_alts"),
    )
    out = (
        base.select("canonical", F.explode("_alts").alias("_raw"))
        .select("canonical", norm(F.col("_raw")).alias("alias"))
        .filter((F.col("alias") != "") & (F.col("canonical") != ""))
        .select("alias", "canonical")
        .distinct()
    )
    return out


def city(col):
    from .analyzers import gazetteer

    return gazetteer(col, CITY_GAZETTEER, shingle_sep=" ")


def country(col):
    from .analyzers import gazetteer

    return gazetteer(col, COUNTRY_GAZETTEER, shingle_sep="_")
