"""Golden-token tests per analyzer channel (SURVEY.md §5.2 item 1;
fixtures shape per FIXTURES.md §5). Covers accents, elisions, legal-form
stopwords, abbreviation/acronym synonyms, 3-grams, integer shingles with
leading zeros."""

from pyspark.sql import functions as F

from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.french import french_estab_tokens, french_tokens, light_stem


def _run(spark, col_expr, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col_expr.alias("out")).collect()[0]["out"]


def test_special_keyword_char_map(spark):
    # char-map: '-' -> space, fold é/è/ê/ë/à/ü, keyword tokenizer, lowercase
    assert _run(spark, A.special_keyword(F.col("t")), "Pont-à-Mousson") == ["pont a mousson"]
    # char filter precedes the lowercase filter (reference chain order), so
    # only lowercase accent chars fold — 'Ü' survives as 'ü' after lowering
    assert _run(spark, A.special_keyword(F.col("t")), "Fenêtre ültra") == ["fenetre ultra"]
    assert _run(spark, A.special_keyword(F.col("t")), "") == []
    assert _run(spark, A.special_keyword(F.col("t")), None) == []


def test_standard_tokens(spark):
    assert _run(spark, A.standard(F.col("t")), "Hello,  World 42!") == ["hello", "world", "42"]


def test_french_elision_stop_stem():
    # elision l'/d', stopword removal, accent folding, light stemming
    toks = french_tokens("l'école des Étangs")
    assert toks == ["ecol", "etang"]
    # stopwords: 'de', 'la' dropped
    assert french_tokens("la maison de la musique") == ["maison", "musiqu"]


def test_french_estab_synonyms():
    # abbreviation expansion (agric -> agricole), legal-form stopwords dropped
    assert french_estab_tokens("Lyc Agric SARL") == ["lyce", "agricol"]
    # multi-expansion alias: loc -> location + local
    assert french_estab_tokens("loc") == ["locat", "local"]
    # acronym expansion keeps inner stopwords (reference filter-chain order)
    toks = french_estab_tokens("CNRS")
    assert toks[0:2] == ["centr", "national"]
    assert "recherch" in toks


def test_light_stem_rules():
    assert light_stem("chevaux") == "cheval"
    assert light_stem("maisons") == "maison"
    assert light_stem("etablissement") == "etablis"  # issement->iss, then ss collapse
    assert light_stem("formation") == "format"


def test_n_grams(spark):
    assert _run(spark, A.n_grams(F.col("t")), "Abc de") == ["abc"]  # 'de' shorter than 3
    assert _run(spark, A.n_grams(F.col("t")), "abcd") == ["abc", "bcd"]
    assert _run(spark, A.n_grams(F.col("t")), "a-b") == []


def test_n_grams_fast_matches_expression_reference(spark):
    """The r6 Arrow-expanded n_grams_fast must emit the exact token stream
    of the pure-expression n_grams, including unicode (code-point slicing)
    and run/word ordering."""
    import random

    rng = random.Random(13)
    alphabet = "abcDEF012 -_.éüœ日本語x"
    texts = [None, "", "ab", "abc", "a-b_c.d",
             "日本語のテキスト abcdéfü 0123456789"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))) for _ in range(200)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(A.n_grams_fast(F.col("t")).alias("g")).collect()
    exp = df.select(A.n_grams(F.col("t")).alias("g")).collect()
    assert [r["g"] for r in got] == [r["g"] for r in exp]
    got2 = df.select(A.n_grams_fast(F.col("t"), 2).alias("g")).collect()
    exp2 = df.select(A.n_grams(F.col("t"), 2).alias("g")).collect()
    assert [r["g"] for r in got2] == [r["g"] for r in exp2]


def test_integers_shingles(spark):
    # leading-zero trim + adjacency shingles up to 5, '' separator
    out = _run(spark, A.integers(F.col("t")), "rue 007 bis 12")
    assert "7" in out and "12" in out and "712" in out
    assert _run(spark, A.integers(F.col("t")), "no digits") == []
    # ES semantics: all-zero run trims to empty and is dropped from output
    out2 = _run(spark, A.integers(F.col("t")), "0 5")
    assert "5" in out2


def test_phonetic_soundex(spark):
    out = _run(spark, A.phonetic(F.col("t")), "Robert Rupert")
    assert out[0] == out[1] == "R163"


def test_gazetteer_keep_translate(spark):
    gaz = {"saint denis": "saint-denis", "paris": "paris", "lyon": "lyon"}
    out = _run(spark, A.gazetteer(F.col("t"), gaz), "12 rue de Paris, Saint Denis")
    assert "paris" in out and "saint-denis" in out
    # unknown tokens dropped
    assert all(t in {"paris", "saint-denis", "lyon"} for t in out)


def test_keyword_exact(spark):
    assert _run(spark, A.keyword(F.col("t")), "As Is") == ["As Is"]


def test_gazetteer_ingest_large_dim(spark, tmp_path):
    """S7 real ingest (VERDICT r1 #10): a >=1k-entry (name, alternates) dump
    loads into the broadcast dim with the reference's write_keep_syn
    normalization, and gazetteer_join resolves unigram AND multi-word
    aliases against it."""
    import csv

    from merge_machine_spark.functions.analyzers import gazetteer_join
    from merge_machine_spark.functions.gazetteers import load_gazetteer_dim

    path = str(tmp_path / "cities.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "alternates"])
        for i in range(1100):
            # accented, hyphenated, and short alternates per canonical
            w.writerow([f"ville {i:04d}", f"villé {i:04d}|ville-{i:04d}|v{i:04d}"])
        w.writerow(["saint etienne", "st-étienne|saint étienne"])
    dim = load_gazetteer_dim(spark, path).cache()
    assert dim.count() >= 2200  # canonical + distinct normalized alternates
    got = {r["alias"]: r["canonical"] for r in dim.filter(F.col("canonical") == "ville 0042").collect()}
    # accented + hyphen variants normalize onto the canonical alias
    assert got == {"ville 0042": "ville 0042", "v0042": "ville 0042"}

    docs = spark.createDataFrame(
        [("d1", "HQ at villé 0042 tower"), ("d2", "moved to St-Étienne"), ("d3", "no city here")],
        "doc_id string, t string",
    )
    out = {r["doc_id"]: r["cities"] for r in gazetteer_join(docs, "t", dim, "cities").collect()}
    assert "ville 0042" in out["d1"]
    assert "saint etienne" in out["d2"]  # multi-word alias via bigram shingle
    assert out["d3"] == []


def test_jaro_winkler_python_matches_duckdb_property():
    """Property: the pure-Python Jaro-Winkler fallback is bit-identical to
    DuckDB's jaro_winkler_similarity (the oracle AND the fast path), so the
    UDF result cannot depend on which implementation a worker used."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from merge_machine_spark.functions.similarity import jaro_winkler_py

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcdeé -01", max_size=24), st.text(alphabet="abcdeé -01", max_size=24))
    def check(a, b):
        expected = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler_py(a, b) == expected

    check()


def test_english_golden_tokens():
    """F8 english (VERDICT r2 missing #2): real ES-english semantics —
    stemming ('running'->'run'), stopword drop, possessive strip — not the
    r2 standard alias."""
    from merge_machine_spark.functions.english import english_tokens, porter_stem

    assert english_tokens("The dogs are running") == ["dog", "run"]
    assert english_tokens("John's buildings") == ["john", "build"]
    assert english_tokens("the and of") == []
    assert english_tokens(None) == []
    # published examples from Porter (1980)
    for w, e in [("caresses", "caress"), ("ponies", "poni"), ("relational", "relat"),
                 ("electriciti", "electr"), ("adjustment", "adjust"), ("hopping", "hop"),
                 ("controll", "control"), ("roll", "roll"), ("agreed", "agre")]:
        assert porter_stem(w) == e, w
    # Martin Porter's official step-2 departures (the Lucene/ES variant,
    # ADVICE r3): logi->log and bli->ble, both guarded by (m>0) on the stem
    for w, e in [("archaeology", "archaeolog"),   # logi->log fires (m>0)
                 ("geology", "geologi"),          # guard holds: m('geo')=0, same as Lucene
                 ("probably", "probabl"),         # bli->ble path
                 ("analogies", "analog")]:
        assert porter_stem(w) == e, (w, porter_stem(w))


def test_english_channel_spark_and_filters(spark):
    """The 'english' registry entry runs the real analyzer through Spark, and
    apply_global_filters honors it: a must_not of 'run' excludes a row whose
    text says 'running' (stem match), which the standard channel would keep."""
    from pyspark.sql import functions as F

    from merge_machine_spark.functions import analyzers as A
    from merge_machine_spark.plans.pipeline import apply_global_filters

    df = spark.createDataFrame(
        [("1", "He was running fast"), ("2", "She walks home")], ["doc_id", "body"]
    )
    toks = {r["doc_id"]: r["t"] for r in df.select("doc_id", A.analyze("body", "english").alias("t")).collect()}
    # 'was' is in the Lucene stop set; 'he'/'she' are not
    assert toks["1"] == ["he", "run", "fast"]
    assert toks["2"] == ["she", "walk", "home"]

    kept = apply_global_filters(
        spark, df, must_not={"body": ["run"]}, channels=("english",)
    )
    assert [r["doc_id"] for r in kept.collect()] == ["2"]
    # standard channel would NOT exclude it ('run' != 'running' unstemmed)
    kept_std = apply_global_filters(spark, df, must_not={"body": ["run"]}, channels=("standard",))
    assert kept_std.count() == 2

    # must phrase via english: 'walked home' matches 'walks home' after stemming
    kept_must = apply_global_filters(spark, df, must={"body": ["walked home"]}, channels=("english",))
    assert [r["doc_id"] for r in kept_must.collect()] == ["2"]


def test_french_tokens_golden_parquet(spark):
    """Golden-parquet regression oracle for the `french_analyzer_tokens`
    contract query (VERDICT r2 #9): the Spark pandas-UDF channel must emit
    exactly the checked-in token table (generated once from the pure-Python
    canonical implementation by scripts/gen_golden_french.py, byte-stable
    across 3 runs, spot-checked by hand)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from merge_machine_spark.functions import analyzers as A

    golden_path = os.path.join(os.path.dirname(__file__), "golden", "french_tokens_sf0001.parquet")
    golden = pq.read_table(golden_path).to_pandas()
    expected = sorted(map(tuple, golden.itertuples(index=False)))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        docs.select("doc_id", F.posexplode(A.french_estab(F.col("text"))).alias("pos", "token"))
        .collect()
    )
    got_rows = sorted((r["doc_id"], r["pos"], r["token"]) for r in got)
    assert len(got_rows) == len(expected)
    assert got_rows == expected
