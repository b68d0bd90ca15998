"""Tokenizer / fold / flag / filter-byte parity tests vs the reference
semantics (ParserClass.pas, ImportData.dpr, GenDb.dpr — see docstrings in
deusu_spark.textproc)."""

from deusu_spark import textproc
from deusu_spark.constants import STOPWORDS, is_fill_word


def test_fold_umlauts():
    assert textproc.fold("Über Straße") == "ueber strasse"
    assert textproc.fold("MÄRZ schön") == "maerz schoen"


def test_fold_entities():
    assert textproc.fold("M&auml;rz &amp; Co &nbsp;x") == "maerz & co  x"


def test_body_tokens():
    # token = [a-z0-9][a-z0-9_-]* (ParserClass.pas:1173-1204)
    assert textproc.body_tokens("foo bar-baz 42x _lead -dash 9_b") == [
        "foo",
        "bar-baz",
        "42x",
        "lead",  # '_' cannot start a token
        "dash",
        "9_b",
    ]


def test_body_token_max_255():
    long = "a" * 300
    toks = textproc.body_tokens(long)
    assert toks == ["a" * 255]


def test_title_tokens_no_digits():
    # title tokens are runs of [a-z_-] only (ParserClass.pas:1136-1149)
    assert textproc.title_tokens("user42 assistant") == ["user", "assistant"]


def test_stopwords_exact():
    for w in ("der", "die", "das", "the", "to", "you", "and", "nicht", "nbsp"):
        assert w in STOPWORDS
    assert is_fill_word("a")  # length < 2 — Words.pas:27-29
    assert not is_fill_word("linux")


def test_doc_terms_dedup_and_order():
    terms, dl, de = textproc.doc_terms("linux the linux kernel", "user", "")
    assert terms == ["user", "linux", "kernel"]  # title first, distinct, no stop
    assert dl == 4  # body token count pre-dedup
    assert not de


def test_doc_terms_german_detection():
    _, _, de = textproc.doc_terms("dies ist eine deutsche seite", "user", "")
    assert de  # 'ist' is in the IsGerman list (Words.pas:92-155)


def test_posting_flags_substring_semantics():
    # Pos() substring test, not token match — ImportData.dpr:316-320
    f = textproc.posting_flags("onv", "conv00000017/3", "user", "some text")
    assert f == 4  # 'onv' is a substring of the url
    f = textproc.posting_flags("use", "conv/1", "user", "a user said")
    assert f == 2 + 1


def test_filter_byte():
    # domain root: first '/' is last char (GenDb.dpr:385-387)
    assert textproc.filter_byte("host.com/", False) & 128
    assert not textproc.filter_byte("host.com/x", False) & 128
    # www prefix with non-dot before first slash (GenDb.dpr:388-390)
    assert textproc.filter_byte("www.host.com/", False) & 64
    assert not textproc.filter_byte("host.com/", False) & 64
    # german bit (GenDb.dpr:391-392)
    assert textproc.filter_byte("x/", True) & 32
    # url length bits after www strip (GenDb.dpr:394-401)
    assert textproc.filter_byte("www.abcd/", False) & 31 == len("abcd/") - 1
    assert textproc.filter_byte("x" * 100, False) & 31 == 31


def test_domain_data_byte():
    # (path_elements << 4) | host_elements, capped 15 (GenDb.dpr:111-156)
    assert textproc.domain_data_byte("a.b.c/x/y") == (3 << 4) | 3
    assert textproc.domain_data_byte("conv00000017/3") == (2 << 4) | 1
    assert textproc.domain_data_byte("host/") == (1 << 4) | 1
