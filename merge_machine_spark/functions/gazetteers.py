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


def city(col):
    from .analyzers import gazetteer

    return gazetteer(col, CITY_GAZETTEER, shingle_sep=" ")


def country(col):
    from .analyzers import gazetteer

    return gazetteer(col, COUNTRY_GAZETTEER, shingle_sep="_")
