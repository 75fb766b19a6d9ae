"""URL / domain operators for web-scale training-data curation.

North-star extension (not in the reference, SURVEY.md §2.7): C4-style
pipelines filter by domain blocklist, deduplicate by canonical URL, and
report per-domain composition before sampling. Everything here is
whole-stage-codegen column expressions plus (for the blocklist) one
broadcast anti-join — zero Python in the hot path, no shuffle of the
corpus beyond what the caller asks for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[userinfo@]HOST[:port][/...]; host = everything up to the
# first '/', ':', '?' or '#'. Deliberately RE2/Java-compatible (no
# lookbehind) so a DuckDB oracle can run the same pattern.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def extract_domain_col(url_col) -> Column:
    """Lowercased registered host of a URL ('' for non-URLs) — pure
    codegen (`regexp_extract`), identical semantics in DuckDB."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def canonical_url_col(url_col) -> Column:
    """Canonical form for URL-level dedup: lowercase the scheme+host,
    strip the fragment and common tracking params (utm_*, fbclid,
    gclid), drop a trailing '?' or lone trailing '/'. Pure codegen."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    # lowercase scheme://host prefix, keep path case (paths are
    # case-sensitive; hosts are not)
    head = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*)", 1)
    tail = F.substring(url, F.length(head) + F.lit(1), F.lit(1 << 30))
    c = F.concat(F.lower(head), tail)
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(c, r"([?&])(utm_[^=&]*|fbclid|gclid)=[^&]*", "$1")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    return F.regexp_replace(c, r"(://[^/?#]+)/$", "$1")


def url_dedup(df: DataFrame, url_col: str, *, tie_breaker: str | None = None) -> DataFrame:
    """Keep one row per canonical URL (see ``canonical_url_col``);
    deterministic winner via ``tie_breaker`` (smallest wins)."""
    from plateau_spark.operators.dedup import exact_dedup

    tagged = df.withColumn("__curl__", canonical_url_col(url_col))
    return exact_dedup(tagged, ["__curl__"], tie_breaker=tie_breaker).drop("__curl__")


def domain_suffixes_col(domain_col) -> Column:
    """All registrable suffixes of a dotted host, most-specific first:
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com]. Array functions only (codegen); used to match a blocklist
    entry against any subdomain of it."""
    from plateau_spark.core.exprs import bind_col

    dom = F.col(domain_col) if isinstance(domain_col, str) else domain_col
    # parts bound once per row: inline, the split re-ran per suffix
    return bind_col(
        F.split(dom, r"\."),
        lambda parts: F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
        ),
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocklist: Sequence[str],
    *,
    keep_domain_col: str | None = None,
    literal_threshold: int = 2000,
) -> DataFrame:
    """Drop rows whose URL host is a blocklisted domain OR any subdomain
    of one (C4-style blocklist semantics: blocking ``example.com`` also
    blocks ``ads.example.com``).

    Shape: for typical blocklists (≤ ``literal_threshold`` entries) the
    list is baked into the plan and the filter is a single codegen
    ``arrays_overlap(suffix_chain, blocked)`` — ONE scan, zero joins,
    zero shuffles of the corpus. Beyond the threshold it degrades to a
    suffix-explode + broadcast semi-join to find blocked hosts, then a
    broadcast anti-join — the corpus still never shuffles.
    ``keep_domain_col`` optionally emits the extracted host on the
    surviving rows.
    """
    dom = "__domain__"
    tagged = df.withColumn(dom, extract_domain_col(url_col))
    entries = sorted({b.lower() for b in blocklist})
    if len(entries) <= literal_threshold:
        blocked = F.array(*[F.lit(b) for b in entries])
        out = tagged.where(~F.arrays_overlap(domain_suffixes_col(dom), blocked))
    else:  # pragma: no cover - exercised at real blocklist scale
        spark = df.sparkSession
        block = F.broadcast(
            spark.createDataFrame([(b,) for b in entries], "__blocked__ string")
        )
        hit = (
            tagged.select(dom)
            .distinct()
            .withColumn("__sfx__", F.explode(domain_suffixes_col(dom)))
            .join(block, F.col("__sfx__") == F.col("__blocked__"), "left_semi")
            .select(dom)
            .distinct()
        )
        out = tagged.join(F.broadcast(hit), dom, "left_anti")
    if keep_domain_col is not None:
        return out.withColumnRenamed(dom, keep_domain_col)
    return out.drop(dom)


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-domain corpus composition: document count and total chars —
    the pre-sampling report a curation pipeline runs first. One keyed
    aggregation (map-side combined)."""
    return (
        df.withColumn("__domain__", extract_domain_col(url_col))
        .groupBy(F.col("__domain__").alias("domain"))
        .agg(F.count("*").alias("n_docs"))
    )


# Raw-HTML text extraction: deliberately a regexp-rule chain (not a DOM
# parser) — trafilatura-class extraction needs an HTML library this
# container doesn't ship, and a rule chain is what stays whole-stage
# codegen at corpus scale. Patterns are RE2/Java-compatible (inline
# (?is) flags, non-greedy spans, no lookaround) so a DuckDB oracle runs
# the same chain verbatim.
_HTML_DROP_BLOCKS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST, so '&amp;lt;' decodes to '&lt;' not '<'
)


def html_text_col(html_col) -> Column:
    """Visible text of an HTML payload — the ingest step between a raw
    crawl and every text operator in this package: drop script/style/
    comment blocks, strip remaining tags to spaces, decode the common
    entities, collapse whitespace. Pure codegen regexp chain with an
    identical DuckDB spelling (see _HTML_DROP_BLOCKS note); NULL html
    yields NULL."""
    t = F.col(html_col) if isinstance(html_col, str) else html_col
    for pat in _HTML_DROP_BLOCKS:
        t = F.regexp_replace(t, pat, " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_boilerplate_signals(df: DataFrame, html_col: str) -> DataFrame:
    """Page-level boilerplate signals next to the extracted text:
    ``n_tags`` / ``n_links`` (markup density), ``text_ratio``
    (extracted/raw chars — jusText-style content-vs-chrome signal,
    rounded to 6). One narrow codegen pass, no shuffle."""
    raw = F.col(html_col)
    extracted = html_text_col(html_col)
    return df.select(
        "*",
        extracted.alias("extracted_text"),
        F.size(F.regexp_extract_all(raw, F.lit(r"<[^>]+>"), F.lit(0))).alias("n_tags"),
        F.size(F.regexp_extract_all(raw, F.lit(r"(?i)<a\b"), F.lit(0))).alias(
            "n_links"
        ),
        F.round(
            F.length(extracted) / F.nullif(F.length(raw).cast("double"), F.lit(0.0)),
            6,
        ).alias("text_ratio"),
    )
