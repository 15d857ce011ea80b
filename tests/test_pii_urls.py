"""PII detection/redaction (functions/pii.py) and URL normalize / domain
cap (functions/urls.py)."""
from pyspark.sql import functions as F

from merge_machine_spark.functions.pii import pii_project, pii_stats
from merge_machine_spark.functions.urls import (
    cap_per_domain,
    domain_stats,
    normalize_url,
    url_host,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_counts_and_flag(spark):
    df = _docs(spark, [
        (1, "write a@b.co or x.y+z@sub.dom.org and ping 192.168.0.1 then call 555-123-4567"),
        (2, "a perfectly clean document about spark"),
        (3, None),
    ])
    out = {r["doc_id"]: r for r in pii_project(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 1, 1)
    assert out[1]["has_pii"] is True
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["has_pii"] is False
    assert out[2]["text_redacted"] == "a perfectly clean document about spark"
    # null text is empty, not an error
    assert out[3]["has_pii"] is False
    assert out[3]["text_redacted"] == ""


def test_pii_redaction_removes_all_matches(spark):
    df = _docs(spark, [(1, "mail a@b.co and c@d.org ip 10.0.0.1 tel 555 123 4567")])
    red = pii_project(df).collect()[0]["text_redacted"]
    assert red == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"


def test_pii_stats_join_variant_matches_project(spark):
    df = _docs(spark, [(1, "a@b.co"), (2, "clean"), (3, "1.2.3.4")])
    a = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"], r["text_redacted"])
         for r in pii_stats(df).collect()}
    b = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"], r["text_redacted"])
         for r in pii_project(df).collect()}
    assert a == b


def test_normalize_url_rules(spark):
    cases = [
        ("HTTPS://WWW.Example.COM/a/b/?q=1#frag", "example.com/a/b"),
        ("http://example.com", "example.com"),
        ("ftp://files.example.com/x/", "files.example.com/x"),
        ("example.com/path///", "example.com/path"),
        ("www.example.com", "example.com"),
        (None, ""),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i int, url string")
    got = {r["i"]: r["n"] for r in df.select("i", normalize_url(F.col("url")).alias("n")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_host(spark):
    df = spark.createDataFrame([("example.com/a/b",), ("host.only",)], "u string")
    hosts = [r["h"] for r in df.select(url_host(F.col("u")).alias("h")).collect()]
    assert hosts == ["example.com", "host.only"]


def test_cap_per_domain_is_deterministic_and_order_free(spark):
    rows = [(i, "big.com") for i in range(10)] + [(100, "small.com"), (101, "small.com")]
    df = spark.createDataFrame(rows, "doc_id bigint, domain string")
    kept = cap_per_domain(df, "domain", "doc_id", max_per_domain=3)
    got = sorted((r["domain"], r["doc_id"], r["keep_rank"]) for r in kept.collect())
    big = [g for g in got if g[0] == "big.com"]
    small = [g for g in got if g[0] == "small.com"]
    assert len(big) == 3 and [g[2] for g in sorted(big, key=lambda g: g[2])] == [1, 2, 3]
    assert len(small) == 2  # under the cap: all survive
    # survivors are a function of ids, not of input order or partitioning
    df_rev = spark.createDataFrame(list(reversed(rows)), "doc_id bigint, domain string").repartition(7)
    got_rev = sorted((r["domain"], r["doc_id"], r["keep_rank"])
                     for r in cap_per_domain(df_rev, "domain", "doc_id", max_per_domain=3).collect())
    assert got == got_rev


def test_cap_per_domain_rejects_nonpositive_cap(spark):
    import pytest

    df = spark.createDataFrame([(1, "d")], "doc_id bigint, domain string")
    with pytest.raises(ValueError):
        cap_per_domain(df, "domain", "doc_id", max_per_domain=0)


def test_filter_blocked_domains_broadcast_anti(spark):
    from merge_machine_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "spam.com"), (2, "ok.com"), (3, "spam.com"), (4, "fine.org")],
        "doc_id bigint, domain string",
    )
    block = spark.createDataFrame([("spam.com",), ("spam.com",)], "domain string")
    kept = filter_blocked_domains(df, block, "domain")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    # the anti join must be a broadcast, not a shuffle of the corpus side
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [(1, "a.com"), (2, "a.com"), (3, "b.com")], "doc_id bigint, domain string"
    )
    got = {r["domain"]: r["n_docs"] for r in domain_stats(df, "domain").collect()}
    assert got == {"a.com": 2, "b.com": 1}
