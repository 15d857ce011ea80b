"""Token-filter data tables for the French analyzers.

Semantic ports of the reference's analyzer resources
(/root/reference/merge_machine/analyzers/no_resource_analyzer_definitions.py:
elision articles 18-26, useless words 31-34, abbreviation synonyms 36-67,
acronym expansions 69-76) plus the public Lucene French stop list that the
ES ``_french_`` stopword set expands to.
"""

from __future__ import annotations

# Lucene French stop list (org.apache.lucene.analysis.fr, public), accent-folded
# because our pipelines fold before the stop filter.
FRENCH_STOPWORDS: list[str] = [
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du", "elle", "en",
    "et", "eux", "il", "je", "la", "le", "leur", "lui", "ma", "mais", "me",
    "meme", "mes", "moi", "mon", "ne", "nos", "notre", "nous", "on", "ou",
    "par", "pas", "pour", "qu", "que", "qui", "sa", "se", "ses", "son", "sur",
    "ta", "te", "tes", "toi", "ton", "tu", "un", "une", "vos", "votre",
    "vous", "c", "d", "j", "l", "m", "n", "s", "t", "y", "ete", "etee",
    "etees", "etes", "etant", "suis", "es", "est", "sommes", "sont", "serai",
    "seras", "sera", "serons", "serez", "seront", "serais", "serait",
    "serions", "seriez", "seraient", "etais", "etait", "etions", "etiez",
    "etaient", "fus", "fut", "fumes", "futes", "furent", "sois", "soit",
    "soyons", "soyez", "soient", "fusse", "fusses", "fussions", "fussiez",
    "fussent", "ayant", "eu", "eue", "eues", "eus", "ai", "as", "avons",
    "avez", "ont", "aurai", "auras", "aura", "aurons", "aurez", "auront",
    "aurais", "aurait", "aurions", "auriez", "auraient", "avais", "avait",
    "avions", "aviez", "avaient", "eut", "eumes", "eutes", "eurent", "aie",
    "aies", "ait", "ayons", "ayez", "aient", "eusse", "eusses", "eussions",
    "eussiez", "eussent",
]

# Legal-form noise ("french_useless").
FRENCH_USELESS: list[str] = ["cedex", "sas", "sarl", "eurl", "sa", "limited"]

# Abbreviation synonyms: alias -> expansion token list ("french_abbrev").
FRENCH_ABBREV: dict[str, list[str]] = {
    "agric": ["agricole"], "agri": ["agricole"],
    "agro": ["agronomique"],
    "assoc": ["association"], "ass": ["association"], "asso": ["association"],
    "auto": ["automobile"], "autos": ["automobile"], "automobiles": ["automobile"],
    "bat": ["batiment"],
    "coop": ["cooperative"],
    "ctre": ["centre"],
    "grp": ["groupe"], "groupement": ["groupe"],
    "copro": ["copropriete"], "coprop": ["copropriete"], "cop": ["copropriete"],
    "coproprietaires": ["copropriete"], "copr": ["copropriete"],
    "dep": ["departement"],
    "dir": ["direction"], "directeur": ["direction"],
    "elec": ["electrique"],
    "etab": ["etablissement"],
    "fr": ["fra"], "francais": ["fra"],
    "gen": ["general"],
    "gym": ["gymnastique"],
    "immo": ["immobilier"],
    "indust": ["industrie"],
    "invest": ["investissement"],
    "loc": ["location", "local"],
    "lyc": ["lycee"],
    "med": ["medical"],
    "music": ["musique"],
    "nat": ["national", "naturel"],
    "prod": ["production"],
    "pub": ["publique"], "publ": ["publique"], "public": ["publique"],
    "reg": ["region"],
    "res": ["residence"],
    "soc": ["social", "societe"],
    "synd": ["syndicat"], "syndic": ["syndicat"], "syndicale": ["syndicat"],
    "tech": ["technologie"],
}

# Acronym expansions ("french_acronyms"); expansions keep stopwords because
# the synonym filter runs after the stop filter in the reference chain.
FRENCH_ACRONYMS: dict[str, list[str]] = {
    "cnrs": ["centre", "national", "de", "la", "recherche", "scientifique"],
    "inra": ["institut", "national", "de", "la", "recherche", "agronomique"],
    "cea": ["commissariat", "a", "l", "energie", "atomique", "et", "aux",
            "energies", "alternatives"],
    "inserm": ["institut", "national", "de", "la", "sante", "et", "de", "la",
               "recherche", "medicale"],
    "inria": ["institut", "national", "de", "recherche", "en", "informatique",
              "et", "en", "automatique"],
}
