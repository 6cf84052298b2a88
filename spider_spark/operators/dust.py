"""DUST rule learning — Different URLs with Similar Text (Bar-Yossef,
Keidar & Schonfeld, WWW 2007): learn which query parameters are
content-irrelevant (session ids, tracking tags, cache busters) from the
crawl's own (url, content_fp) ledger, so the canonicalizer can strip
them and the frontier stops refetching aliases.

The classic formulation pairs URLs; pairing is quadratic inside hot
groups. This restatement is pair-free: for every URL and every query
parameter k it carries, build the REMAINDER key (host, path, the other
parameters sorted) — all URLs that differ only in k's value/presence
collapse onto one remainder group. Then per group count distinct
content fingerprints:

- group has ≥2 URLs and ONE distinct fp → evidence k doesn't affect
  content;
- group has ≥2 distinct fps → a counterexample (k DOES select content).

Per (host, param): junk ⇔ evidence ≥ min_support AND zero
counterexamples. Everything is one explode (bounded by Σ params per
URL, not URL pairs) + two partial-agg groupBys — no self-join, no hot
group blowup, engine-portable enough to restate in SQL verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one 'k=v' unit in a query string; '#' ends the query (fragment)
_PAIR_RE = r"[?&]([^=&#]+)=([^&#]*)"


def _url_parts(url: Column) -> tuple[Column, Column]:
    """(base before '?', array of raw 'k=v' pair strings)."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    pairs = F.regexp_extract_all(url, F.lit(_PAIR_RE), 0)
    # the regexp captures the leading ?/& — strip it so pairs compare flat
    pairs = F.transform(pairs, lambda p: F.substring(p, 2, 1 << 30))
    return base, pairs


def dust_param_rules(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_support: int = 2,
) -> DataFrame:
    """Learn per-(host, param) content-irrelevance verdicts from a
    (url, content_fp) table. Returns (host, param, evidence_groups,
    counter_groups, is_junk) — ``is_junk`` only ever true with zero
    counterexamples, so applying the rule can't merge distinct content.
    """
    url = F.col(url_col)
    base, pairs = _url_parts(url)
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    exploded = (
        pages.select(
            F.col(fp_col).alias("fp"),
            host.alias("host"),
            base.alias("base"),
            pairs.alias("pairs"),
        )
        .where(F.col("host") != "")
        .select(
            "fp",
            "host",
            "base",
            "pairs",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.col("pairs"), lambda p: F.split(p, "=", 2).getItem(0)
                    )
                )
            ).alias("param"),
        )
        .select(
            "fp",
            "host",
            "param",
            F.concat(
                F.col("base"),
                F.lit("?"),
                F.array_join(
                    F.array_sort(
                        F.filter(
                            F.col("pairs"),
                            lambda p: ~p.startswith(
                                F.concat(F.col("param"), F.lit("="))
                            ),
                        )
                    ),
                    "&",
                ),
            ).alias("remainder"),
        )
    )
    groups = exploded.groupBy("host", "param", "remainder").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("fp").alias("n_fps"),
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.sum(
                F.when((F.col("n_urls") >= 2) & (F.col("n_fps") == 1), 1).otherwise(0)
            ).alias("evidence_groups"),
            F.sum(F.when(F.col("n_fps") >= 2, 1).otherwise(0)).alias("counter_groups"),
        )
        .select(
            "host",
            "param",
            "evidence_groups",
            "counter_groups",
            (
                (F.col("evidence_groups") >= min_support)
                & (F.col("counter_groups") == 0)
            ).alias("is_junk"),
        )
    )


def strip_junk_params(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply learned DUST rules: remove every is_junk param of the URL's
    host, keeping the surviving params in original order (the
    canonicalizer owns any further normalization). Hosts with no rules
    pass through untouched. The rules side is a per-host array built by
    ONE partial-agg and joined on host — broadcastable (hosts × params,
    not URLs). Adds ``url_dusted``."""
    junk = (
        rules.where(F.col("is_junk"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("junk_params"))
    )
    url = F.col(url_col)
    base, pairs = _url_parts(url)
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    with_rules = urls.withColumn("__host", host).join(
        F.broadcast(junk.withColumnRenamed("host", "__host")), "__host", "left"
    )
    kept = F.filter(
        pairs,
        lambda p: ~F.array_contains(
            F.col("junk_params"), F.split(p, "=", 2).getItem(0)
        ),
    )
    dusted = F.when(F.col("junk_params").isNull(), url).otherwise(
        F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&")))
        .otherwise(base)
    )
    return with_rules.withColumn("url_dusted", dusted).drop("__host", "junk_params")


# date-in-path conventions, tightest first; RE2-safe (no backreferences —
# the separator is per-alternative, not captured-and-reused), shared
# verbatim with the DuckDB oracle. Anchored between '/'es so numeric ids
# (/p/20240512999/) don't false-positive.
_URL_DATE_YMD_SLASH_RE = r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)"
_URL_DATE_YMD_DASH_RE = r"/((?:19|20)\d{2})-(\d{2})-(\d{2})(?:[/.]|$)"
_URL_DATE_YM_RE = r"/((?:19|20)\d{2})/(\d{2})(?:/|$)"


def url_path_dates(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Publication-date prior from URL path conventions: blog/news CMSes
    overwhelmingly stamp /YYYY/MM/DD/, /YYYY-MM-DD or /YYYY/MM/ into
    permalinks. At crawl scale that is a free freshness signal available
    BEFORE fetch — the recrawl scheduler can deprioritize a 2009 archive
    permalink sight-unseen, where http_freshness/sitemap lastmod need a
    prior capture. (SIGIR/WWW date-extraction literature treats URL dates
    as the highest-precision field next to structured metadata.)

    Adds (url_year, url_month, url_day, url_date_kind): kind ∈
    {'ymd','ym',null}; day is null for 'ym'. Month/day are RANGE-CHECKED
    in the projection (01-12 / 01-31) — a /2024/99/ path is a section
    number, not a date, and surfaces as kind null. A valid-month path
    with a junk day (/2024/05/99/) degrades to its monthly prefix
    ('ym') rather than null — the weaker prior is still real. Map-only codegen
    projection; no UDF, no shuffle."""
    u = F.col(url_col)
    ymd_y = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 1), F.lit(""))
    ymd_m = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 2), F.lit(""))
    ymd_d = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_SLASH_RE, 3), F.lit(""))
    dash_y = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 1), F.lit(""))
    dash_m = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 2), F.lit(""))
    dash_d = F.nullif(F.regexp_extract(u, _URL_DATE_YMD_DASH_RE, 3), F.lit(""))
    ym_y = F.nullif(F.regexp_extract(u, _URL_DATE_YM_RE, 1), F.lit(""))
    ym_m = F.nullif(F.regexp_extract(u, _URL_DATE_YM_RE, 2), F.lit(""))

    def _valid(m: Column, d: Column | None) -> Column:
        ok = m.cast("int").between(1, 12)
        if d is not None:
            ok = ok & d.cast("int").between(1, 31)
        return ok

    y = (
        F.when(ymd_y.isNotNull() & _valid(ymd_m, ymd_d), ymd_y)
        .when(dash_y.isNotNull() & _valid(dash_m, dash_d), dash_y)
        .when(ym_y.isNotNull() & _valid(ym_m, None), ym_y)
    )
    m = (
        F.when(ymd_y.isNotNull() & _valid(ymd_m, ymd_d), ymd_m)
        .when(dash_y.isNotNull() & _valid(dash_m, dash_d), dash_m)
        .when(ym_y.isNotNull() & _valid(ym_m, None), ym_m)
    )
    d = F.when(ymd_y.isNotNull() & _valid(ymd_m, ymd_d), ymd_d).when(
        dash_y.isNotNull() & _valid(dash_m, dash_d), dash_d
    )
    kind = (
        F.when(
            (ymd_y.isNotNull() & _valid(ymd_m, ymd_d))
            | (dash_y.isNotNull() & _valid(dash_m, dash_d)),
            F.lit("ymd"),
        )
        .when(ym_y.isNotNull() & _valid(ym_m, None), F.lit("ym"))
    )
    return df.select(
        "*",
        y.cast("int").alias("url_year"),
        m.cast("int").alias("url_month"),
        d.cast("int").alias("url_day"),
        kind.alias("url_date_kind"),
    )


# normalization chain for path templates — order matters (hex before
# digits: a hex run contains digit runs); RE2-safe, shared with the oracle
_TPL_HEX_RE = r"[0-9a-fA-F]{8,}"   # long hex runs: ids, hashes, uuid parts
_TPL_NUM_RE = r"\d+"


def path_template_census(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    min_urls: int = 2,
) -> DataFrame:
    """Per-host URL path-template census: collapse volatile path tokens
    (long hex runs → ``{h}``, digit runs → ``{n}``) and count URLs per
    resulting template — the structural map of a site
    (``/product/{n}``, ``/2020/{n}/{n}/``, ``/cache/{h}/``).

    Where `dust_param_rules` learns junk QUERY params, this is the PATH
    analog, and it feeds three consumers: trap triage (a template with
    10^6 instances on one host is a calendar/session generator —
    `traps` catches known shapes, this surfaces novel ones), crawl
    sampling (cap fetches per template instead of per host to cover a
    site's structure before its volume), and dedup priors (same
    template ⇒ same DOM shape, usually — join against
    `content.template_shapes` to confirm).

    Output: (host, template, n_urls, n_distinct_paths, first_url) with
    n_urls ≥ min_urls. The query string is ignored (param rules own
    it); host defaults to parse_url(url, 'HOST') when host_col is None.

    Scale shape: two chained regexp_replace in the scan projection, one
    partial-agg census keyed (host, template). No UDF, no joins."""
    u = F.col(url_col)
    # parse_url yields '' (not null) for a bare-host URL — both normalize
    # to the root template
    path = F.coalesce(
        F.nullif(F.parse_url(u, F.lit("PATH")), F.lit("")), F.lit("/")
    )
    tpl = F.regexp_replace(
        F.regexp_replace(path, _TPL_HEX_RE, "{h}"), _TPL_NUM_RE, "{n}"
    )
    host = F.col(host_col) if host_col else F.parse_url(u, F.lit("HOST"))
    return (
        urls.select(
            host.alias("host"),
            tpl.alias("template"),
            path.alias("_path"),
            u.alias("_url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_path").alias("n_distinct_paths"),
            F.min("_url").alias("first_url"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )
