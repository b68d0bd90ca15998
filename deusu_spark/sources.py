"""Ingest-side operators (SURVEY §2.1 S5-S8, §2.2 P9/P11) re-expressed as
DataFrame transformations: URL import/normalization with in-link counting,
exact-duplicate removal, rank-list import, crawl-frontier selection, link
URL normalization, and the blocked-extension gate.

The crawler itself (S1-S3) is out of scope — input arrives as a table — but
everything the reference's import pipeline computes from a URL stream is
reproduced here so a web-mode corpus can be prepared entirely in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ImportUrls.dpr:246-261: scheme/junk prefixes that discard a URL.
_BLOCKED_SUBSTRINGS = (
    "mailto:",
    "tel:",
    "ftp:",
    "telnet:",
    "news:",
    "gopher:",
    ".htm/",
    ".html/",
    "/cgi-map/",
)

MAX_URL_LENGTH = 60  # DbTypes.pas:59 (cMaxUrlLength)


def normalize_url(url: str) -> str | None:
    """ImportUrls.dpr:195-240 (AddUrl) normalization, returning None for
    discarded URLs: strip http://, require no ':' before the first '/',
    ensure a path slash, collapse a trailing '//', length cap, junk-scheme
    and quote filters."""
    url = url.strip()
    while url.lower().startswith("http://"):
        url = url[7:]
    colon = url.find(":") + 1
    slash = url.find("/") + 1
    if colon > 0 and colon < slash:
        return None
    if not url:
        return None
    if "/" not in url:
        url += "/"
    if url.endswith("//"):
        url = url[:-1]
    if len(url) > MAX_URL_LENGTH:
        return None
    low = url.lower()
    if url[0] == "/" or url[0] < "1":
        return None
    if any(b in low for b in _BLOCKED_SUBSTRINGS):
        return None
    if "'" in low or low.endswith(".z"):
        return None
    return url


def normalize_url_col(c):
    """Column-expression twin of normalize_url() — the URL stream is the
    largest web-mode input, so normalization must stay JVM-side (no
    EvalPython node; gated by tests/test_plans.py). Returns NULL for
    discarded URLs, exactly like the Python oracle returns None."""
    from .colfns import strip_col

    u = strip_col(c)
    u = F.regexp_replace(u, "(?i)^(http://)+", "")
    slash = F.locate("/", u)
    colon = F.locate(":", u)
    bad_colon = (colon > 0) & (colon < slash)
    empty = F.length(u) == 0
    u = F.when(slash == 0, F.concat(u, F.lit("/"))).otherwise(u)
    u = F.regexp_replace(u, "//$", "/")
    low = F.lower(u)
    first = F.substring(u, 1, 1)
    discard = bad_colon | empty | (F.length(u) > MAX_URL_LENGTH)
    discard = discard | (first == "/") | (first < "1")
    for b in _BLOCKED_SUBSTRINGS:
        discard = discard | low.contains(b)
    discard = discard | low.contains("'") | low.endswith(".z")
    return F.when(discard, F.lit(None).cast("string")).otherwise(u)


def import_urls(links: DataFrame, url_col: str = "url") -> DataFrame:
    """S5 (ImportUrls): normalize + dedupe URLs and count in-links — the
    reference increments InLinkCount on every re-encounter of a URL
    (ImportUrls.dpr:141-145), i.e. in_link_count = occurrences in the link
    stream. One hash aggregation; map-side combine handles hot URLs.
    Normalization is pure column expressions (whole-stage codegen)."""
    return (
        links.select(normalize_url_col(F.col(url_col)).alias("url"))
        .where(F.col("url").isNotNull())
        .groupBy(F.lower("url").alias("url_key"))
        .agg(
            F.first("url").alias("url"),
            F.count("*").alias("in_link_count"),
        )
        .drop("url_key")
    )


def clean_urls(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """S6 (CleanUrlsTxt): exact-duplicate removal on lowercase URL
    (CleanUrlsTxt.dpr:29-80)."""
    return urls.withColumn("_k", F.lower(F.col(url_col))).dropDuplicates(
        ["_k"]
    ).drop("_k")


def import_rank_list(csv_df: DataFrame, domain_col: str = "domain") -> DataFrame:
    """S7 (ImportAlexa): rank = line/row number of the list
    (ImportAlexa.dpr:29-77). Input must carry an explicit order column
    ('line_no'); a file line number is not a distributed concept, so the
    caller materializes it at read time.

    Two-phase zip-with-index (docids.assign_doc_ids) instead of a global
    row_number() window — a no-partition window funnels the whole list
    through one task, which a 10^9-row rank list would not survive."""
    from .docids import assign_doc_ids

    return assign_doc_ids(csv_df, order_cols=("line_no",)).select(
        domain_col, (F.col("doc_id") + 1).cast("int").alias("domain_rank")
    )


def prepare_frontier(
    urls: DataFrame,
    max_urls_per_host: int = 5,
    url_col: str = "url",
) -> DataFrame:
    """S8 (PrepareRobot): cap URLs per host (deusu.config.default
    MaxUrlsPerHost=5, PrepareRobot.dpr:189-195) and scatter the output order
    by crc32(url) for crawl politeness (:215-235)."""
    host = F.lower(F.split(F.col(url_col), "/").getItem(0))
    w = Window.partitionBy("host").orderBy(url_col)
    # scatter order: range-partition on the crc + sort within partitions —
    # the partition-local form of orderBy(crc32), stated explicitly so the
    # materialized output is parallel-written in scatter order at any scale
    scatter = F.crc32(F.encode(F.col(url_col), "UTF-8"))
    return (
        urls.withColumn("host", host)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_urls_per_host)
        .drop("_rn")
        .withColumn("_scatter", scatter)
        .repartitionByRange("_scatter")
        .sortWithinPartitions("_scatter")
        .drop("_scatter")
    )


# ---------------------------------------------------------------------------
# P9: link URL normalization (relative resolution + ../. flattening)
# ---------------------------------------------------------------------------


def make_flat_url(s: str) -> str:
    """ParserClass.pas:100-149 (MakeFlatUrl): resolve '.' and '..' path
    segments, depth-capped at 50; '..' never climbs above the host."""
    ends_slash = s.endswith("/")
    steps: list[str] = []
    parts = s.split("/")
    for part in parts:
        if part == "..":
            if len(steps) > 1:
                steps.pop()
        elif part != ".":
            steps.append(part)
            if len(steps) > 50:
                return ""
    out = steps[0] if steps else ""
    for p in steps[1:]:
        if len(out) + len(p) < 254:
            out += "/" + p
    if ends_slash and not out.endswith("/"):
        out += "/"
    return out


def normalize_link_url(link: str, base_url: str) -> str:
    """ParserClass.pas:179-230 (NormalizeLinkUrl): strip http://, resolve
    '/'-rooted and relative links against base_url, flatten, ensure a path
    slash. base_url is scheme-less (host/path)."""
    link = link.strip()
    if len(link) >= 7 and link[4] == ":" and link[:7].lower() == "http://":
        while link[:7].lower() == "http://":
            link = link[7:]
    elif link.startswith("/"):
        host = base_url.split("/", 1)[0]
        if len(host) + len(link) > 255:
            return ""
        link = host + link
    else:
        base = base_url
        i = base.rfind("/")
        base = base[: i + 1] if i >= 0 else ""
        if len(base) + len(link) > 255:
            return ""
        link = base + link
    link = make_flat_url(link)
    if link and "/" not in link:
        link += "/"
    return link


# ---------------------------------------------------------------------------
# P11: blocked-extension gate — UrlDatabase.pas:43-62 + BlockedExtensions.txt
# (the reference ships a 209-entry list; this is that list's semantics with
# the common entries inlined; pass a custom set to override)
# ---------------------------------------------------------------------------

DEFAULT_BLOCKED_EXTENSIONS = frozenset(
    """
    jpg jpeg gif png bmp tif tiff ico svg webp
    zip gz tgz bz2 xz 7z rar arj lha z
    exe com dll bin iso img dmg msi apk jar
    mp3 mp2 wav ogg flac aac wma mid midi
    mp4 avi mov wmv mpg mpeg mkv flv webm
    pdf ps eps doc docx xls xlsx ppt pptx odt ods odp rtf
    css js json xml rss atom
    tar swf fla ttf otf woff woff2 eot
    """.split()
)


def has_blocked_extension(url: str, blocked=DEFAULT_BLOCKED_EXTENSIONS) -> bool:
    path = url.split("?", 1)[0].split("#", 1)[0]
    dot = path.rfind(".")
    slash = path.rfind("/")
    if dot <= slash:
        return False
    return path[dot + 1 :].lower() in blocked


def filter_blocked_extensions(
    urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Column-expression version of the extension gate (stays JVM-side)."""
    path = F.split(F.split(F.col(url_col), r"\?").getItem(0), "#").getItem(0)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    return urls.where(
        (ext == "") | ~ext.isin(*DEFAULT_BLOCKED_EXTENSIONS)
    )


# ---------------------------------------------------------------------------
# G3/G4: web-mode doc-metadata joins (backlink + domain-rank lookup)
# ---------------------------------------------------------------------------


def web_docmeta(
    docs: DataFrame,
    url_db: DataFrame,
    domain_ranks: DataFrame | None = None,
) -> DataFrame:
    """GenDb.dpr:160-197,362-370: per document, look up InLinkCount from the
    URL DB (default 1 when absent, floor 1 — GenDb.dpr:158,364-365) and the
    domain rank (-1 when absent). Broadcast the rank list (small dim);
    the URL join shuffles on lower(url) — AQE splits skewed hosts."""
    bl = url_db.select(
        F.lower("url").alias("_u"), F.col("in_link_count").alias("backlinks")
    )
    out = (
        docs.withColumn("_u", F.lower("url"))
        .join(bl, "_u", "left")
        .drop("_u")
        .withColumn(
            "backlinks", F.greatest(F.coalesce("backlinks", F.lit(1)), F.lit(1))
        )
    )
    if domain_ranks is not None:
        host = F.lower(F.split(F.col("url"), "/").getItem(0))
        dr = domain_ranks.select(
            F.lower("domain").alias("_h"), "domain_rank"
        )
        out = (
            out.withColumn("_h", host)
            .join(F.broadcast(dr), "_h", "left")
            .drop("_h")
            .withColumn("rank", F.coalesce("domain_rank", F.lit(-1)))
            .drop("domain_rank")
        )
    return out
