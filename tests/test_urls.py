"""URL canonicalization edge rules, pinned case by case (the registry
query's planted URLs exercise the happy path; these are the corners a
crawl actually contains)."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.urls import (
    canonicalize_url,
    registered_domain,
)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Ex.COM:443/A/b?x=1#f", "https://ex.com/A/b?x=1"),
    # :443 is NOT http's default port - it must survive
    ("http://ex.com:443/p", "http://ex.com:443/p"),
    ("http://EX.com:80/p", "http://ex.com/p"),
    # empty path -> '/', empty query dropped
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/p?utm_source=a&utm_campaign=b", "https://ex.com/p"),
    # surviving params sorted; utm_ filtered anywhere in the list
    ("https://ex.com/p?z=2&utm_x=t&a=1", "https://ex.com/p?a=1&z=2"),
    # path case preserved, host case folded
    ("https://A.B.ex.com/CaSe", "https://a.b.ex.com/CaSe"),
    # www stripped only as a leading label
    ("https://notwww.ex.com/p", "https://notwww.ex.com/p"),
    # EVERY leading www label collapses (idempotence under re-ingest)
    ("https://www.www.ex.com/p", "https://ex.com/p"),
    # not a URL -> NULL quarantine
    ("no scheme here", None),
    ("", None),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, raw string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("raw")).alias("c")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_registered_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.b.ex.com/p"),
            (1, "https://ex.com/p"),
            (2, "https://localhost/p"),
            # ports and userinfo must not leak into the domain - a
            # canonical URL legitimately keeps a non-default port,
            # and 'ex.com' blocklist entries must still match it
            (3, "http://ex.com:443/p"),
            (4, "https://user:pw@a.ex.com/p"),
        ],
        "i long, u string",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", registered_domain(F.col("u")).alias("d")
        ).collect()
    }
    assert got == {
        0: "ex.com",
        1: "ex.com",
        2: "localhost",
        3: "ex.com",
        4: "ex.com",
    }


def test_canonicalize_is_idempotent(spark):
    raws = [raw for raw, want in CASES if want is not None]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)], "i long, raw string"
    )
    once = df.select(
        "i", canonicalize_url(F.col("raw")).alias("c")
    )
    twice = once.select(
        "i", canonicalize_url(F.col("c")).alias("c2")
    )
    j = once.join(twice, "i")
    assert j.where(F.col("c") != F.col("c2")).count() == 0
