"""P1 HTML strip goldens — behaviors mirrored from ParserClass.pas:786-1133
(title extraction, implicit body start at </title>, script/style/comment
drop, anchor-text exclusion, low-ASCII squash, '<a ' space quirk)."""

from deusu_spark.htmlparse import as_transcripts, html_docs, html_to_text


def test_title_and_implicit_body():
    t, b = html_to_text("<html><title>My Title</title>Body text here</html>")
    assert t == "My Title"
    assert "Body text here" in b
    assert "My Title" not in b


def test_explicit_body_tag():
    t, b = html_to_text("<html><head>head stuff</head><body>the content</body>")
    assert t == ""
    assert "the content" in b
    # head text outside <title> is not body (InBody only from <body>/</title>)
    assert "head stuff" not in b


def test_script_and_style_dropped():
    _, b = html_to_text(
        "<title>x</title>a <script>var evil=1;</script> b"
        "<style>.c{color:red}</style> c"
    )
    assert "evil" not in b and "color" not in b
    for tok in ("a", "b", "c"):
        assert f" {tok}" in f" {b} " or tok in b.split()


def test_comment_dropped():
    _, b = html_to_text("<title>x</title>vis1 <!-- hidden words --> vis2")
    assert "hidden" not in b and "words" not in b
    assert "vis1" in b and "vis2" in b


def test_anchor_text_excluded_from_body():
    _, b = html_to_text(
        '<title>x</title>before <a href="y">anchor text</a> after'
    )
    assert "anchor" not in b and "text" not in b
    assert "before" in b and "after" in b


def test_bare_anchor_quirk():
    # the reference only matches '<a ' (with space): '<a>' is NOT an anchor
    _, b = html_to_text("<title>x</title><a>kept</a> tail")
    assert "kept" in b


def test_tags_case_insensitive():
    t, b = html_to_text("<TITLE>Up</TITLE>low <SCRIPT>no</SCRIPT>yes")
    assert t == "Up"
    assert "no" not in b.split() and "yes" in b


def test_low_ascii_to_spaces_and_title_cap():
    t, b = html_to_text("<title>a\tb\nc</title>body")
    assert t == "a b c"
    long = "<title>" + "x" * 400 + "</title>body"
    t, _ = html_to_text(long)
    assert len(t) == 255


def test_tag_chars_add_spaces():
    # '<' always appends a body space: tokens split across tags stay split
    _, b = html_to_text("<title>x</title>foo<br>bar")
    assert "foobar" not in b
    assert "foo" in b.split() and "bar" in b.split()


def test_empty_and_none():
    assert html_to_text("") == ("", "")


def test_html_docs_to_tokenizer(spark):
    """Web mode end-to-end: html -> (url, title, text) -> transcript shape ->
    the JVM tokenizer (P1 connecting S5-S8/P9/P11 to the index build)."""
    from pyspark.sql import functions as F

    from deusu_spark.build import tokenized_docs

    pages = spark.createDataFrame(
        [
            ("www.example.com/page1", "<title>Linux Guide</title>Install linux now"),
            ("other.org/x", "<body>Nur ein <b>Beispiel</b> für Text</body>"),
        ],
        ["url", "html"],
    )
    web = html_docs(pages)
    rows = {r["url"]: r for r in web.collect()}
    assert rows["www.example.com/page1"]["title"] == "Linux Guide"
    assert "Install linux now" in rows["www.example.com/page1"]["text"]

    tr = as_transcripts(web).withColumn("rank", F.lit(-1)).withColumn(
        "backlinks", F.lit(1).cast("long")
    )
    docs = {r["conv_id"]: r for r in tokenized_docs(tr).collect()}
    d1 = docs["www.example.com/page1"]
    assert "linux" in d1["terms"] and "guide" in d1["terms"]
    assert d1["url"] == "www.example.com/page1/0"
    d2 = docs["other.org/x"]
    # 'für' folds to 'fuer', which is a reference STOPWORD (Words.pas) —
    # folded, then correctly dropped; 'Beispiel' lowercases and survives
    assert d2["terms"] == ["nur", "beispiel", "text"]
