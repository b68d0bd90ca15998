"""R6 highlighting parity — goldens derived by hand-executing the Pascal
semantics (Highlighter.pas:1-193; byte-level latin-1/UTF-8 hybrid)."""

from deusu_spark.highlight import Highlighter, highlight_results
from deusu_spark.rerank import ResultRow


def hl(query, s):
    return Highlighter(query).highlight(s)


def test_basic_wrap_and_case_insensitive():
    assert (
        hl("linux google", "Linux and Google rock")
        == "<strong>Linux</strong> and <strong>Google</strong> rock"
    )
    assert hl("linux", "LINUX linux LiNuX") == (
        "<strong>LINUX</strong> <strong>linux</strong> <strong>LiNuX</strong>"
    )


def test_partial_words_not_highlighted():
    # token scan is whole-word: 'linux' inside 'linuxes' is one token
    assert hl("linux", "linuxes and linux") == "linuxes and <strong>linux</strong>"


def test_plus_is_separator_and_spaces_collapse():
    assert hl("linux+google", "linux google") == (
        "<strong>linux</strong> <strong>google</strong>"
    )
    assert hl("  linux   ", "linux") == "<strong>linux</strong>"


def test_digits_are_word_chars():
    assert hl("w0042", "w0042 w00421") == "<strong>w0042</strong> w00421"


def test_query_punctuation_splits_keys():
    # SetHighlightSearch: non-word chars are dropped as separators
    assert hl("-linux", "linux") == "<strong>linux</strong>"
    assert hl('host:abc', "host abc") == "<strong>host</strong> <strong>abc</strong>"


def test_utf8_umlaut_folding_quirks():
    # LowerString on the UTF-8 query leaves 0xC3/0xBC as separators:
    # key set of 'über' is {'ber'} (Highlighter.pas:69-91 operates on bytes)
    # and in the text the UTF-8 pair splits the token, then gets
    # entity-escaped (Highlighter.pas:172-179)
    assert hl("über", "über ber") == "&uuml;<strong>ber</strong> <strong>ber</strong>"
    assert hl("x", "Ä ä Ö ö Ü ü") == "&Auml; &auml; &Ouml; &ouml; &Uuml; &uuml;"


def test_utf8_eszett_dropped_by_reference_bug():
    # the reference escapes #195#63, not #195#159 — a real UTF-8 ß loses
    # both bytes in CleanJunkFromResult (Highlighter.pas:180 + :22-54)
    assert hl("x", "große") == "groe"
    # the #195#63 branch itself is unreachable from valid UTF-8 str input
    # (no UTF-8 sequence ends in a bare 0xC3 byte) — it existed for the
    # reference's raw mixed-encoding byte strings; 'Ã?' encodes to
    # 0xC3 0x83 0x3F, whose high bytes CleanJunk drops
    assert hl("x", "Ã?") == "?"


def test_ampersand_escape_rescans():
    # ReplaceAll rescans from the start: overlapping ' & ' all escape
    assert hl("x", "a & & b") == "a &amp; &amp; b"
    assert hl("x", "a&b") == "a&b"  # only the spaced form escapes


def test_clean_junk():
    assert hl("x", "a|b") == "ab"  # '|' dropped
    assert hl("x", "a\tb\x01c") == "abc"  # control bytes dropped
    assert hl("x", "a, , , b") == "a, b"  # ', , ' collapsed (twice)
    assert hl("x", "wh????at") == "what"  # '??' pairs deleted


def test_highlight_inside_strong_markup_unaffected():
    # the injected markup itself is ASCII words 'strong' — a query for
    # 'strong' highlights text occurrences but markup is added after
    # token scanning, so emitted tags are never re-wrapped
    assert hl("strong", "a strong b") == "a <strong>strong</strong> b"


def test_highlight_results_rows():
    rows = [
        ResultRow(url="conv1/0", title="linux tips", snippet="all about Linux"),
        ResultRow(url="conv2/0", title="other", snippet="nothing here"),
    ]
    out = highlight_results(rows, "linux")
    assert out[0].title == "<strong>linux</strong> tips"
    assert out[0].snippet == "all about <strong>Linux</strong>"
    assert out[1].snippet == "nothing here"
    assert out[0].url == "conv1/0"  # url untouched
    assert rows[0].title == "linux tips"  # input rows not mutated
