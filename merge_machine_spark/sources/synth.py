"""Deterministic synthetic ``documents`` generator (FIXTURES.md §1/§2/§6).

Produces the interleaved text+media span table of BASELINE.json
``input_hint`` with known ground-truth entity clusters, so pairwise-F1 and
the span invariant are testable without external data. Shape mirrors the
reference's fixtures (/root/reference/examples/data_1: establishment name /
address / city+department, with a hidden unique ``uai``-style key; dirt
mirrors source.csv: stray '*', spacing, case, accent loss, abbreviations,
token drops, digit typos, leading zeros).

Generation is *distributed and partition-independent*: one ``spark.range``
over entity indices + ``mapInPandas``; every random draw is seeded from the
entity index alone, so the same (n_entities, seed) yields byte-identical
documents at any partitioning/parallelism — required for resume tests and
the local[8]-vs-local[32] scaling run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)

_KINDS = ["lycee", "college", "ecole", "institut", "centre", "association", "universite", "groupe scolaire"]
_QUALS = ["agricole", "technologique", "professionnel", "general", "polyvalent", "prive", "public", "regional"]
_NAMES = [
    "jean moulin", "victor hugo", "marie curie", "louis pasteur", "jules ferry",
    "george sand", "blaise pascal", "rené descartes", "émile zola", "albert camus",
    "simone veil", "jeanne d'arc", "pierre mendès", "françois rabelais", "claude monet",
    "paul cézanne", "gustave eiffel", "antoine lavoisier", "henri poincaré", "sophie germain",
]
_STREETS = ["rue de la gare", "avenue des écoles", "boulevard victor hugo", "place de l'église",
            "chemin des vignes", "rue du stade", "allée des tilleuls", "route nationale"]
_CITIES = [
    "paris", "lyon", "marseille", "toulouse", "bordeaux", "nantes", "strasbourg",
    "montpellier", "lille", "rennes", "grenoble", "dijon", "angers", "nîmes",
    "saint étienne", "le havre", "clermont ferrand", "aix en provence",
]
# abbreviation dirt = inverse of the analyzer synonym table
_ABBREV_DIRT = {
    "agricole": ["agric", "agri"], "association": ["assoc", "ass", "asso"],
    "lycee": ["lyc"], "centre": ["ctre"], "general": ["gen"], "departement": ["dep"],
    "region": ["reg"], "national": ["nat"], "technologique": ["tech"],
}
_ACCENTS = str.maketrans("éèêëàüîïôçœ", "eeeeauiioco")


def _canonical_entity(rng: np.random.RandomState, idx: int) -> dict:
    name = f"{rng.choice(_KINDS)} {rng.choice(_QUALS)} {rng.choice(_NAMES)}"
    num = rng.randint(1, 199)
    street = rng.choice(_STREETS)
    city = rng.choice(_CITIES)
    dept = f"{rng.randint(1, 95):02d}"
    postal = f"{dept}{rng.randint(0, 999):03d}"
    uai = f"{rng.randint(0, 9999999):07d}{'ABCDEFGHJK'[rng.randint(0, 10)]}"
    return {
        "name": name,
        "address": f"{num} {street}",
        "city": city,
        "dept": dept,
        "postal": postal,
        "uai": uai,
        "entity_id": f"e{idx:09d}",
    }


def _corrupt(rng: np.random.RandomState, text: str) -> str:
    words = text.split()
    out = []
    for w in words:
        r = rng.rand()
        if w in _ABBREV_DIRT and r < 0.35:
            out.append(_ABBREV_DIRT[w][rng.randint(0, len(_ABBREV_DIRT[w]))])
        elif r < 0.08 and len(words) > 2:
            continue  # token drop
        elif r < 0.20:
            out.append(w.upper())
        elif r < 0.35:
            out.append(w.translate(_ACCENTS))
        else:
            out.append(w)
    s = " ".join(out) if out else text
    r = rng.rand()
    if r < 0.10:
        s = "*" + s
    elif r < 0.18:
        s = "  " + s + " "
    if rng.rand() < 0.10 and any(c.isdigit() for c in s):
        digits = [i for i, c in enumerate(s) if c.isdigit()]
        i = digits[rng.randint(0, len(digits))]
        s = s[:i] + str(rng.randint(0, 10)) + s[i + 1:]
    if rng.rand() < 0.10 and s and s[0].isdigit():
        s = "0" + s
    return s


def _doc_rows_for_entity(idx: int, seed: int, max_variants: int) -> list[dict]:
    rng = np.random.RandomState((seed * 1_000_003 + idx) % (2**31 - 1))
    ent = _canonical_entity(rng, idx)
    n_variants = 1 + rng.randint(0, max_variants)
    rows = []
    for v in range(n_variants):
        vrng = np.random.RandomState((seed * 7_000_003 + idx * 101 + v) % (2**31 - 1))
        dirty = v > 0  # variant 0 is the clean copy
        mk = (lambda s: _corrupt(vrng, s)) if dirty else (lambda s: s)
        texts = [
            mk(ent["name"]),
            mk(ent["address"]),
            mk(f"{ent['city']} {ent['dept']} {ent['postal']}"),
        ]
        if vrng.rand() < 0.5:
            texts.append(f"code uai {ent['uai']}")
        spans, off = [], 0
        for t in texts:
            if vrng.rand() < 0.35:  # interleave media spans
                spans.append({"kind": "media", "text": None,
                              "media_ref": f"m://{abs(hash((idx, v, off))) % 10**12:012d}", "offset": off})
                off += 1
            spans.append({"kind": "text", "text": t, "media_ref": None, "offset": off})
            off += 1
        if vrng.rand() < 0.25:
            spans.append({"kind": "media", "text": None,
                          "media_ref": f"m://{abs(hash((idx, v, 99))) % 10**12:012d}", "offset": off})
        rows.append({"doc_id": f"d{idx:09d}_{v:02d}", "entity_id": ent["entity_id"], "spans": spans})
    return rows


def generate_documents(
    spark: SparkSession, n_entities: int, seed: int = 42, max_variants: int = 5, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation: (doc_id, entity_id, spans).

    ``entity_id`` is ground truth — drop it for pipeline input, keep it for
    F1 scoring (FIXTURES.md §6 expected_clusters)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_entities, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for idx in pdf["id"].tolist():
                rows.extend(_doc_rows_for_entity(int(idx), seed, max_variants))
            yield pd.DataFrame(rows, columns=["doc_id", "entity_id", "spans"])

    return base.mapInPandas(gen, schema=DOC_SCHEMA)


def expected_clusters(docs_with_truth: DataFrame) -> DataFrame:
    return docs_with_truth.select("doc_id", F.col("entity_id"))


REF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("numero_uai", T.StringType(), False),
        T.StructField("denomination", T.StringType(), False),
        T.StructField("patronyme", T.StringType(), False),
        T.StructField("adresse", T.StringType(), False),
        T.StructField("localite", T.StringType(), False),
        T.StructField("departement", T.StringType(), False),
        T.StructField("code_postal", T.StringType(), False),
        T.StructField("full_name", T.StringType(), False),
    ]
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ref_id", T.StringType(), False),  # ground truth (drop for input)
        T.StructField("id_prog", T.StringType(), False),
        T.StructField("region", T.StringType(), True),
        T.StructField("dept", T.StringType(), True),
        T.StructField("commune", T.StringType(), True),
        T.StructField("school_names", T.StringType(), True),
        T.StructField("uai", T.StringType(), True),  # hidden certain-match key (nullable)
    ]
)


def generate_linkage_fixture(
    spark: SparkSession, n_ref: int = 6200, n_src: int = 1400, seed: int = 42, uai_coverage: float = 0.6
):
    """Reference-shape dirty-source -> clean-ref linkage fixture
    (FIXTURES.md §4, mirroring examples/data_1's shape: ~1,400 dirty program
    rows vs ~6,200 clean establishment rows, pairings commune<->localite,
    school_names<->full_name, dept<->departement, certain key
    uai<->numero_uai carried by ``uai_coverage`` of source rows).
    Returns (src, ref) DataFrames; ``src.ref_id`` is ground truth."""

    def gen_ref(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 11_000_003 + idx) % (2**31 - 1))
                e = _canonical_entity(rng, int(idx))
                name, patro = e["name"].rsplit(" ", 2)[0], " ".join(e["name"].split()[-2:])
                rows.append(
                    {
                        "doc_id": f"r{idx:09d}",
                        "numero_uai": e["uai"],
                        "denomination": name,
                        "patronyme": patro,
                        "adresse": e["address"],
                        "localite": e["city"],
                        "departement": e["dept"],
                        "code_postal": e["postal"],
                        "full_name": f"{e['name']} {e['address']} {e['city']}",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in REF_SCHEMA.fields])

    ref = spark.range(0, n_ref, 1, max(spark.sparkContext.defaultParallelism, 8)).mapInPandas(
        gen_ref, schema=REF_SCHEMA
    )

    def gen_src(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sidx in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 13_000_003 + sidx) % (2**31 - 1))
                ridx = int(rng.randint(0, n_ref))  # source entities ⊆ ref entities
                e = _canonical_entity(np.random.RandomState((seed * 11_000_003 + ridx) % (2**31 - 1)), ridx)
                rows.append(
                    {
                        "doc_id": f"s{sidx:09d}",
                        "ref_id": f"r{ridx:09d}",
                        "id_prog": f"p{sidx:06d}",
                        "region": f"region {int(e['dept']) % 13}",
                        "dept": ("0" + e["dept"]) if rng.rand() < 0.2 else e["dept"],
                        "commune": _corrupt(rng, e["city"]),
                        "school_names": _corrupt(rng, f"{e['name']} {e['address']}"),
                        "uai": e["uai"] if rng.rand() < uai_coverage else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SRC_SCHEMA.fields])

    src = spark.range(0, n_src, 1, max(spark.sparkContext.defaultParallelism, 8)).mapInPandas(
        gen_src, schema=SRC_SCHEMA
    )
    return src, ref


def generate_labels(
    docs_with_truth: DataFrame, n_pos: int = 300, n_neg: int = 300, seed: int = 42
) -> DataFrame:
    """labels(doc_id_a < doc_id_b, label y/n) — positives within entities,
    hard negatives across entities that collide on the city+dept blocking
    key (FIXTURES.md §2)."""
    from ..functions.textproj import full_text

    d = docs_with_truth.select("doc_id", "entity_id", full_text("spans").alias("t"))
    a, b = d.alias("a"), d.alias("b")
    pos = (
        a.join(b, F.col("a.entity_id") == F.col("b.entity_id"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"), F.lit("y").alias("label"))
        .orderBy(F.xxhash64("doc_id_a", "doc_id_b", F.lit(seed)))
        .limit(n_pos)
    )
    key = F.regexp_extract(F.col("t"), r"(\S+ \d{2} \d{5})", 1)
    dk = docs_with_truth.select(
        "doc_id", "entity_id", F.substring(F.regexp_replace(full_text("spans"), r".* (\d{2}) \d{5}.*", "$1"), 1, 2).alias("k")
    )
    ka, kb = dk.alias("a"), dk.alias("b")
    neg = (
        ka.join(kb, "k")
        .filter((F.col("a.entity_id") != F.col("b.entity_id")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"), F.lit("n").alias("label"))
        .orderBy(F.xxhash64("doc_id_a", "doc_id_b", F.lit(seed + 1)))
        .limit(n_neg)
    )
    return pos.unionByName(neg)
