"""P1 — HTML strip state machine (ParserClass.pas:786-1133), the piece that
connects the web-mode ingest (sources.py S5-S8/P9/P11) to the tokenizer.

Faithful port of the reference parser's text-extraction core:

  - low-ASCII (< 0x20) bytes become spaces up front
    (MemoryBuffer.pas ConvertLowAsciiToSpaces)
  - '<' ALWAYS appends one space to the body buffer and opens tag state
    (ParserClass.pas:786-792); tag-name peeks are lowercased ASCII
    (MemoryBuffer.pas PeekAhead)
  - <title>…</title> accumulates the title (cap 255); '</title'
    also switches InBody on (ParserClass.pas:817-826) — pages without an
    explicit <body> still index their text
  - <script>/<style> contents are dropped (:828,:842,:827,:871)
  - anchor text (inside <a …>…</a>) is link text, NOT body text
    (:803-808, :955-960); note the reference only recognizes '<a ' (with a
    space), so a bare '<a>' does not open anchor state
  - '<!--' opens comment state; regular characters inside comments are
    dropped, but '<'/'>' STILL drive the tag state machine (the reference's
    main loop only gates HandleRegularCharacter on InComment,
    :947,:992-996) — quirks preserved
  - entity / umlaut decoding is deliberately NOT done here: the reference
    decodes during GetCharacter (:436-528), but in this engine the
    downstream fold() (textproc.py / build.tokenized_docs) applies the
    identical decode at tokenize time, so indexed TERMS are identical
    either way and the raw markup survives into the stored title/snippet
    exactly once

The per-document parse is inherently stateful and runs inside Arrow-batched
mapInPandas (html_docs) — this is web-mode INGEST, not the transcript
tokenize hot path, and matches the reference's own per-document parser
loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_TITLE = 255


def html_to_text(html: str) -> tuple[str, str]:
    """(title, body_text) of one HTML document — ParserClass.pas:786-1133."""
    if not html:
        return "", ""
    # ConvertLowAsciiToSpaces
    s = "".join(" " if c < " " else c for c in html)
    low = s.lower()
    n = len(s)

    in_tag = in_title = in_body = in_script = in_style = in_comment = False
    somewhere_in_anchor = False
    title: list[str] = []
    body: list[str] = []
    title_len = 0

    def peek(i: int, k: int) -> str:
        # PeekAhead: the k chars AFTER position i, lowercased, truncated at
        # the buffer end (MemoryBuffer.pas PeekAhead)
        return low[i + 1 : i + 1 + k]

    for i in range(n):
        if in_comment and peek(i, 3) == "-->":
            in_comment = False
        c = s[i]
        if c == "<":
            body.append(" ")  # :791-792, unconditional
            in_tag = True
            if peek(i, 2) == "a ":
                somewhere_in_anchor = True
            else:
                p4 = peek(i, 4)
                if p4 == "body":
                    in_body = True
                if peek(i, 5) == "title":
                    in_title = True
                else:
                    p6 = peek(i, 6)
                    if p6 == "/title":
                        in_title = False
                        in_body = True
                    elif p6 == "/style":
                        in_style = False
                    elif p6 == "script":
                        in_script = True
                    else:
                        p5 = peek(i, 5)
                        if p5 == "style":
                            in_style = True
                        else:
                            p3 = peek(i, 3)
                            if p3 == "!--":
                                in_comment = True
                            if p3 == "/a>":
                                somewhere_in_anchor = False
                            if peek(i, 7) == "/script":
                                in_script = False
        elif c == ">":
            in_tag = False
        elif not in_tag and not in_comment:
            if in_title and title_len + 1 <= MAX_TITLE:
                title.append(c)
                title_len += 1
            elif in_body and not somewhere_in_anchor and not in_script and not in_style:
                body.append(c)
    return "".join(title).strip(), "".join(body)


HTML_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def html_docs(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """(url, title, text) from raw HTML pages — Arrow-batched mapInPandas."""

    def fn(iterator):
        for pdf in iterator:
            titles, bodies = [], []
            for h in pdf[html_col]:
                t, b = html_to_text(h or "")
                titles.append(t)
                bodies.append(b)
            yield pd.DataFrame(
                {"url": pdf[url_col], "title": titles, "text": bodies}
            )

    return df.select(url_col, html_col).mapInPandas(fn, schema=HTML_DOCS_SCHEMA)


def as_transcripts(web: DataFrame) -> DataFrame:
    """Adapt web-mode (url, title, text) docs to the transcript build input
    (conv_id, turn_idx, role, text, tool) — the SURVEY §7.4 mapping run in
    reverse: one page = one single-turn conversation whose conv_id is the
    URL, so the indexed doc url becomes '<url>/0' and per-host collapse
    groups by site."""
    from pyspark.sql import functions as F

    return web.select(
        F.col("url").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("title").alias("role"),
        "text",
        F.lit("").alias("tool"),
    )
