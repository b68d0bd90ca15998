"""Ingest operators (S5-S8, P9, P11) vs reference semantics."""

from deusu_spark import sources


def test_normalize_url():
    # ImportUrls.dpr:195-240
    assert sources.normalize_url("http://Example.com") == "Example.com/"
    assert sources.normalize_url("http://http://a.com/x") == "a.com/x"
    assert sources.normalize_url("a.com//") == "a.com/"
    assert sources.normalize_url("mailto:x@y.com") is None
    assert sources.normalize_url("a.com:8080/x") is None  # ':' before '/'
    assert sources.normalize_url("wiki.com/a:b") == "wiki.com/a:b"  # ':' after '/'
    assert sources.normalize_url("a.com/it's") is None
    assert sources.normalize_url("a" * 100 + ".com/") is None  # > 60 chars
    assert sources.normalize_url("/rooted") is None


def test_make_flat_url():
    # ParserClass.pas:100-149
    assert sources.make_flat_url("a.com/x/../y") == "a.com/y"
    assert sources.make_flat_url("a.com/./x/./y/") == "a.com/x/y/"
    assert sources.make_flat_url("a.com/../../x") == "a.com/x"  # can't climb


def test_normalize_link_url():
    # ParserClass.pas:179-230
    base = "host.com/dir/page.html"
    assert sources.normalize_link_url("http://other.com/a", base) == "other.com/a"
    assert sources.normalize_link_url("/root.html", base) == "host.com/root.html"
    assert sources.normalize_link_url("sub.html", base) == "host.com/dir/sub.html"
    assert sources.normalize_link_url("../up.html", base) == "host.com/up.html"
    assert sources.normalize_link_url("http://bare.com", base) == "bare.com/"


def test_blocked_extensions():
    assert sources.has_blocked_extension("a.com/x.JPG")
    assert sources.has_blocked_extension("a.com/x.pdf?q=1")
    assert not sources.has_blocked_extension("a.com/x.html")
    assert not sources.has_blocked_extension("a.com/dir.zip/page")


def test_normalize_url_col_parity(spark):
    """Column-expression normalizer vs the Python oracle, case by case."""
    from pyspark.sql import functions as F

    cases = [
        "http://Example.com", "http://http://a.com/x", "a.com//", "a.com///",
        "mailto:x@y.com", "a.com:8080/x", "a.com:8080", "wiki.com/a:b",
        "a.com/it's", "a" * 100 + ".com/", "/rooted", "", "   ", "0.com/x",
        "HTTP://UPPER.com", "a.com/file.Z", "a.com/x.z", "tel:123",
        "a.com/cgi-map/x", "  spaced.com/x  ", "a.com", ".dot.com/",
        "a.com/x.htm/y", "9.com/ok",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["url"])
    got = {
        r["url"]: r["norm"]
        for r in df.select(
            "url", sources.normalize_url_col(F.col("url")).alias("norm")
        ).collect()
    }
    for c in cases:
        assert got[c] == sources.normalize_url(c), repr(c)


def test_normalize_url_col_fuzz_parity(spark):
    """400 seeded gnarly URLs through both normalizers — identical."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    pieces = [
        "http://", "HTTP://", "hTtP://", "www.", "a.com", "b.de", "/", "//",
        ":", ":8080", "?q=1", "#f", "'", ".z", ".Z", "mailto:", "tel:",
        "x" * 30, " ", "\t", "..", "9", "0", ".htm/", "/cgi-map/", "~", "%20",
    ]
    cases = [
        "".join(rng.choice(pieces) for _ in range(rng.randint(0, 8)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["url"])
    got = [
        r["norm"]
        for r in df.select(
            sources.normalize_url_col(F.col("url")).alias("norm")
        ).collect()
    ]
    want = [sources.normalize_url(c) for c in cases]
    for c, g, w in zip(cases, got, want):
        assert g == w, (repr(c), g, w)


def test_import_urls_counts_inlinks(spark):
    links = spark.createDataFrame(
        [("http://a.com/x",), ("A.com/x",), ("a.com/y",), ("mailto:z",)],
        ["url"],
    )
    out = {r["url"].lower(): r["in_link_count"] for r in sources.import_urls(links).collect()}
    assert out == {"a.com/x": 2, "a.com/y": 1}


def test_prepare_frontier_caps_per_host(spark):
    urls = spark.createDataFrame(
        [(f"h{i % 2}.com/p{j}",) for i in range(2) for j in range(9)], ["url"]
    )
    out = sources.prepare_frontier(urls, max_urls_per_host=5).collect()
    hosts = [r["host"] for r in out]
    assert hosts.count("h0.com") == 5 and hosts.count("h1.com") == 5


def test_filter_blocked_extensions_spark(spark):
    urls = spark.createDataFrame(
        [("a.com/x.jpg",), ("a.com/x.html",), ("a.com/x",)], ["url"]
    )
    kept = {r["url"] for r in sources.filter_blocked_extensions(urls).collect()}
    assert kept == {"a.com/x.html", "a.com/x"}


def test_web_docmeta_joins(spark):
    docs = spark.createDataFrame(
        [("a.com/x",), ("b.com/y",)], ["url"]
    )
    url_db = spark.createDataFrame(
        [("a.com/x", 17)], ["url", "in_link_count"]
    )
    ranks = spark.createDataFrame([("a.com", 42)], ["domain", "domain_rank"])
    out = {
        r["url"]: (r["backlinks"], r["rank"])
        for r in sources.web_docmeta(docs, url_db, ranks).collect()
    }
    assert out == {"a.com/x": (17, 42), "b.com/y": (1, -1)}
