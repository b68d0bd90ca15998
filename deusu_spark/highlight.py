"""R6: query-term highlighting — a byte-faithful port of the reference CGI
highlighter (Highlighter.pas:1-193, called from query.dpr:98,226-243).

The reference operates on raw byte strings in a latin-1/UTF-8 hybrid:
token scanning treats single latin-1 umlaut bytes via a fold that turns
them into two-char sequences (so they FAIL the word-char test and act as
separators), while the final entity escaping matches UTF-8 two-byte pairs.
This port keeps those byte semantics exactly (Python str in, str out, with
an internal UTF-8 encode), including the observable quirks:

  * key extraction folds the query with LowerString (Ä→ä→'ae', ß→'ss', …;
    Highlighter.pas:69-91), so a UTF-8 'über' yields the key 'ber'
  * umlaut bytes split tokens in the text being highlighted, because
    LowerString of a single umlaut char returns a two-char string that is
    never a substring of WordChars (Highlighter.pas:142-146)
  * the ß entity ReplaceAll uses the literal bytes #195#63 ('Ã?') — a bug
    in the reference (UTF-8 ß is #195#159), mirrored here: UTF-8 ß is
    dropped by CleanJunkFromResult instead of escaped (Highlighter.pas:180)
  * CleanJunkFromResult keeps printable ASCII except '|', plus the seven
    latin-1 umlaut bytes, then collapses ', , ' and '??' (Highlighter.pas:22-54)
"""

from __future__ import annotations

# WordChars (Highlighter.pas:16) — latin-1 bytes ä=0xE4 ö=0xF6 ü=0xFC
_WORD_CHARS = b"abcdefghijklmnopqrstuvwxyz\xe4\xf6\xfc0123456789"
_KEEP_HIGH = frozenset(b"\xe4\xf6\xfc\xc4\xd6\xdc\xdf")  # ä ö ü Ä Ö Ü ß
_ASCII_LOWER = bytes(
    c + 32 if 65 <= c <= 90 else c for c in range(256)
)  # Pascal LowerCase: A-Z only


def _lower_string(s: bytes) -> bytes:
    """LowerString (Highlighter.pas:69-91): ASCII lowercase, uppercase
    latin-1 umlauts to lowercase, then ß→ss ä→ae ö→oe ü→ue."""
    s = s.translate(_ASCII_LOWER)
    s = s.translate(bytes.maketrans(b"\xc4\xd6\xdc", b"\xe4\xf6\xfc"))
    for src, dst in ((b"\xdf", b"ss"), (b"\xe4", b"ae"), (b"\xf6", b"oe"), (b"\xfc", b"ue")):
        s = s.replace(src, dst)
    return s


def _is_word_byte_text(c: int) -> bool:
    """HighlightSearchWords' char test (Highlighter.pas:142):
    Pos(LowerString(ch), WordChars) > 0. A folded umlaut becomes a two-char
    string that is not a substring of WordChars, so only ASCII alnum (either
    case) qualifies."""
    low = _lower_string(bytes([c]))
    return len(low) == 1 and low in _WORD_CHARS


_TEXT_WORD = frozenset(c for c in range(256) if _is_word_byte_text(c))
_QUERY_WORD = frozenset(_WORD_CHARS)  # SetHighlightSearch uses the raw char


def _clean_junk(s: bytes) -> bytes:
    """CleanJunkFromResult (Highlighter.pas:22-54)."""
    out = bytes(
        c
        for c in s
        if (c < 128 and c >= 0x20 and c != 0x7C) or c in _KEEP_HIGH
    )
    while b", , " in out:
        i = out.index(b", , ")
        out = out[:i] + out[i + 2 :]
    while b"??" in out:
        i = out.index(b"??")
        out = out[:i] + out[i + 2 :]
    return out


class Highlighter:
    """SetHighlightSearch + HighlightSearchWords as one object (the Pascal
    unit keeps module-level state; query.dpr:98 sets it once per request)."""

    def __init__(self, query: str):
        s = _lower_string(query.encode("utf-8", "surrogateescape"))
        s = s.replace(b"+", b" ")
        while b"  " in s:  # Delete one char per iteration (Pascal :105-108)
            i = s.index(b"  ")
            s = s[:i] + s[i + 1 :]
        s = s.strip(bytes(range(0x21)))  # Pascal Trim strips all <= ' '
        keys: set[bytes] = set()
        token = bytearray()
        for c in s:
            if c in _QUERY_WORD:
                token.append(c)
            elif token:
                keys.add(bytes(token))
                token.clear()
        if token:
            keys.add(bytes(token))
        # sorted TStringList with dupIgnore + case-insensitive IndexOf;
        # tokens from the text contain only ASCII alnum, so the comparison
        # reduces to an ASCII-lowercase set probe
        self._keys = frozenset(k.translate(_ASCII_LOWER) for k in keys)

    def highlight(self, s: str) -> str:
        """HighlightSearchWords (Highlighter.pas:133-186): wrap matched
        words in <strong>, entity-escape UTF-8 umlauts, escape bare ' & ',
        clean junk bytes."""
        data = s.encode("utf-8", "surrogateescape")
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            c = data[i]
            if c in _TEXT_WORD:
                j = i + 1
                while j < n and data[j] in _TEXT_WORD:
                    j += 1
                word = data[i:j]
                if word.translate(_ASCII_LOWER) in self._keys:
                    out += b"<strong>" + word + b"</strong>"
                else:
                    out += word
                i = j
            else:
                out.append(c)
                i += 1
        res = bytes(out)
        for src, dst in (
            (b"\xc3\x9c", b"&Uuml;"),
            (b"\xc3\x96", b"&Ouml;"),
            (b"\xc3\x84", b"&Auml;"),
            (b"\xc3\xa4", b"&auml;"),
            (b"\xc3\xb6", b"&ouml;"),
            (b"\xc3\xbc", b"&uuml;"),
            (b"\xc3?", b"&szlig;"),  # reference's literal #195#63 (see module doc)
            (b" & ", b" &amp; "),
        ):
            # ReplaceAll (Highlighter.pas:57-66) rescans from the start, so
            # overlapping occurrences ("a & & b") are all replaced — a
            # single str.replace pass would miss every second one
            while src in res:
                res = res.replace(src, dst)
        return _clean_junk(res).decode("latin-1")


def highlight_results(results, query: str):
    """query.dpr:226-243: highlight title and snippet of each rendered row
    (the reference also highlights ShowUrl; our ResultRow keeps url raw for
    the downstream consumers and highlights the display fields)."""
    import dataclasses

    h = Highlighter(query)
    return [
        dataclasses.replace(
            r, title=h.highlight(r.title), snippet=h.highlight(r.snippet)
        )
        for r in results
    ]
