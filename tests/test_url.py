"""URL features + domain blocklist (cleaning.url_features /
filter_blocked_domains): known answers, suffix semantics, plan shape."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.cleaning import (
    filter_blocked_domains,
    url_features,
)
from entitylinking_spark.sources.tables import is_exchange_free


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [
            (1, "https://user:pw@Ads.Example.COM:8080/a/b/c?x=1"),
            (2, "http://bbc.co.uk/news"),
            (3, "https://example.com"),
            (4, "ftp://files.archive.org/pub//x/"),
            (5, "not a url"),
            (6, None),
        ],
        "doc_id long, url string",
    )


def test_url_features_known_answers(spark, urls):
    got = {r["doc_id"]: r for r in url_features(urls).collect()}
    r1 = got[1]
    assert (r1["scheme"], r1["host"], r1["domain"], r1["tld"]) == (
        "https", "ads.example.com", "example.com", "com"
    )
    assert r1["path_depth"] == 3 and r1["has_query"]
    assert got[2]["domain"] == "co.uk"  # documented last-2-labels heuristic
    assert got[3]["path_depth"] == 0 and not got[3]["has_query"]
    assert got[4]["path_depth"] == 2  # empty segment from '//' not counted
    assert got[5]["scheme"] == "" and got[5]["host"] == ""
    assert got[6]["host"] is None


def test_url_features_single_scan(spark, urls):
    assert is_exchange_free(url_features(urls))


def test_blocklist_suffix_semantics(spark, urls):
    bl = spark.createDataFrame(
        [("example.com",), ("archive.org",)], "domain string"
    )
    got = {r["doc_id"]: r["url_blocked"]
           for r in filter_blocked_domains(urls, bl).collect()}
    # subdomain blocked by parent entry; exact host blocked; others not
    assert got == {1: True, 2: False, 3: True, 4: True, 5: False, 6: False}


def test_blocklist_deep_host_and_exact_label_bound(spark):
    df = spark.createDataFrame(
        [(1, "https://a.b.c.d.evil.net/x"), (2, "https://evilnet.net/x")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("evil.net",)], "domain string")
    got = {r["doc_id"]: r["url_blocked"]
           for r in filter_blocked_domains(df, bl).collect()}
    # suffix match is per LABEL GROUP: 'evilnet.net' is not 'evil.net'
    assert got == {1: True, 2: False}


def test_blocklist_is_broadcast(spark, urls):
    bl = spark.createDataFrame([("example.com",)], "domain string")
    plan = filter_blocked_domains(urls, bl)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_empty_blocklist(spark, urls):
    bl = spark.createDataFrame([], "domain string")
    out = filter_blocked_domains(urls, bl)
    assert out.filter(F.col("url_blocked")).count() == 0
    assert out.count() == 6
