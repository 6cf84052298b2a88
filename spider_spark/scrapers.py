"""Scraper strategy surface — ScrapeResult-shaped output with strategy /
metrics structs and the tree scraper's selector-precedence semantics
(/root/reference/src/scrapers/basic.ts:92-138, tree.ts:55-70,280-410).

The reference's two scrapers differ only in HOW links are revealed:

- basic: one fetch, confidence 1.0, interactionCount 0, complete true
  (basic.ts:107-122),
- tree: iterative expansion clicking elements matching a 9-selector
  precedence list (most-specific tree structures before generic buttons,
  tree.ts:55-70); confidence 0.9 when interactions happened else 0.5
  (tree.ts:343-348), 0.8 for the download-fallback result (tree.ts:370-377).

In the engine, a browser click cannot run per row; the *semantics* carried
over are: the ordered selector precedence (which selector family a page's
expandables belong to), the interaction count (distinct expandable elements
— each is clicked exactly once thanks to the clickedSelectors seen-set,
tree.ts:151,179-196), and the ScrapeResult shape. Expandable elements are
counted by a vectorized scan for the selector patterns in static HTML; the
crawl loop (crawler.py) is the distributed generalization of the expansion
iteration itself (SURVEY.md §3.4).

``duration`` is null by design: per-row wall clock is meaningless in a
vectorized engine — stage wall time lives in the tick metrics/Observation
nodes instead (the distributed ScrapeMetrics, §2.7).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from . import udfs
from .scrape import parse_pages

# The 9 default selectors, verbatim order = precedence (tree.ts:55-70):
# specific tree/directory structures, then accordion triggers, then generic
# expandable buttons.
TREE_DEFAULT_SELECTORS = [
    "li.directory.collapsed > a",
    "li.collapsed > a",
    "details summary",
    "[data-accordion-trigger]",
    '[data-toggle="collapse"]',
    ".accordion-button",
    ".expand-button",
    '[role="button"][aria-expanded]',
    "button[aria-expanded]",
]

# Static-HTML pattern per selector: which start tags would match it. A class
# selector matches the token inside the class attribute; attribute selectors
# match the attribute's presence/value in the tag. (The subset of CSS these
# 9 selectors actually use.)
_CLS = lambda c: rf'class\s*=\s*["\'][^"\']*\b{c}\b[^"\']*["\']'
_SELECTOR_PATTERNS: list[tuple[str, re.Pattern]] = [
    (
        "li.directory.collapsed > a",
        re.compile(
            rf"<li\b[^>]*{_CLS('directory')}[^>]*>\s*<a\b|<li\b[^>]*class\s*=\s*[\"'][^\"']*\bdirectory\b[^\"']*\bcollapsed\b[^\"']*[\"'][^>]*>\s*<a\b",
            re.IGNORECASE,
        ),
    ),
    ("li.collapsed > a", re.compile(rf"<li\b[^>]*{_CLS('collapsed')}[^>]*>\s*<a\b", re.IGNORECASE)),
    ("details summary", re.compile(r"<details\b[^>]*>(?:(?!</details>).)*?<summary\b", re.IGNORECASE | re.DOTALL)),
    ("[data-accordion-trigger]", re.compile(r"<[a-z][^>]*\bdata-accordion-trigger\b", re.IGNORECASE)),
    ('[data-toggle="collapse"]', re.compile(r'<[a-z][^>]*\bdata-toggle\s*=\s*["\']collapse["\']', re.IGNORECASE)),
    (".accordion-button", re.compile(rf"<[a-z][^>]*{_CLS('accordion-button')}", re.IGNORECASE)),
    (".expand-button", re.compile(rf"<[a-z][^>]*{_CLS('expand-button')}", re.IGNORECASE)),
    (
        '[role="button"][aria-expanded]',
        re.compile(r'<[a-z][^>]*\brole\s*=\s*["\']button["\'][^>]*\baria-expanded\b|<[a-z][^>]*\baria-expanded\b[^>]*\brole\s*=\s*["\']button["\']', re.IGNORECASE),
    ),
    ("button[aria-expanded]", re.compile(r"<button\b[^>]*\baria-expanded\b", re.IGNORECASE)),
]

# double-count guard: an element matching a higher-precedence selector is
# clicked under that selector; later selectors skip it via the seen-set.
# Statically we approximate element identity by the matched tag text span.


def count_expandables(html: str) -> tuple[int, str | None, int | None]:
    """(interaction_count, matched_selector, selector_rank): distinct
    expandable elements across the precedence list — each element clicked
    once (clickedSelectors seen-set, tree.ts:179-196); the reported
    selector is the highest-precedence one that matched anything."""
    seen_spans: set[tuple[int, int]] = set()
    total = 0
    first_sel, first_rank = None, None
    for rank, (sel, pat) in enumerate(_SELECTOR_PATTERNS):
        n_here = 0
        for m in pat.finditer(html):
            span = m.span()
            if any(s <= span[0] < e for s, e in seen_spans):
                continue  # already clicked under a more specific selector
            seen_spans.add(span)
            n_here += 1
        if n_here and first_sel is None:
            first_sel, first_rank = sel, rank
        total += n_here
    return total, first_sel, first_rank


TREE_EXPAND_STRUCT = StructType(
    [
        StructField("interaction_count", IntegerType()),
        StructField("matched_selector", StringType()),
        StructField("selector_rank", IntegerType()),
    ]
)


@pandas_udf(TREE_EXPAND_STRUCT)
def tree_expand(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """html → expandable-element census under the 9-selector precedence."""
    for htmls in it:
        rows = []
        for h in htmls:
            if isinstance(h, (bytes, bytearray)):
                h = bytes(h).decode("utf-8", errors="replace")
            c, sel, rank = count_expandables(h or "")
            rows.append({"interaction_count": c, "matched_selector": sel, "selector_rank": rank})
        yield pd.DataFrame(rows)


def col_selector_rank(selector_col):
    """Precedence rank of a selector string (0 = most specific); custom
    selectors (not in the default list) rank after all defaults, mirroring
    [...DEFAULT_SELECTORS, ...customSelectors] (tree.ts:144-147)."""
    arr = F.array(*[F.lit(s) for s in TREE_DEFAULT_SELECTORS])
    pos = F.array_position(arr, selector_col)
    return F.when(pos > 0, pos - 1).otherwise(F.lit(len(TREE_DEFAULT_SELECTORS)))


def scrape_result(
    pages: DataFrame,
    scraper_type: str = "basic",
    spider: str = "simple",
    config: dict | None = None,
    url_col: str = "url",
    html_col: str = "html",
    downloads_col: str | None = None,
) -> DataFrame:
    """pages → ScrapeResult rows (types.ts:318-373): url, content, links,
    strategy struct(type, spider, config, confidence), metrics struct
    (duration, link_count, interaction_count, complete), downloads.

    Confidence: basic 1.0 (basic.ts:113); tree 0.9 if interactions else 0.5
    (tree.ts:343-348); tree download-fallback 0.8 (tree.ts:370-377)."""
    parsed = parse_pages(pages, url_col, html_col)
    link_count = F.size(F.coalesce(F.col("parsed.links"), F.array()))

    has_download = (
        (F.size(F.coalesce(F.col(downloads_col), F.array())) > 0)
        if downloads_col
        else F.lit(False)
    )

    if scraper_type == "tree":
        parsed = parsed.withColumn("_exp", tree_expand(F.col(html_col)))
        ic = F.col("_exp.interaction_count")
        confidence = (
            F.when(has_download, F.lit(0.8))
            .when(ic > 0, F.lit(0.9))
            .otherwise(F.lit(0.5))
        )
        spider = spider if spider != "simple" else "crawlee"  # tree runs in-browser
    else:
        ic = F.lit(0)
        confidence = F.lit(1.0)  # basic is always confident (basic.ts:113)

    cfg_map = (
        F.create_map(*[F.lit(x) for kv in (config or {}).items() for x in (kv[0], str(kv[1]))])
        if config
        else F.create_map().cast("map<string,string>")
    )
    strategy = F.struct(
        F.lit(scraper_type).alias("type"),
        F.lit(spider).alias("spider"),
        cfg_map.alias("config"),
        confidence.alias("confidence"),
    )
    metrics = F.struct(
        F.lit(None).cast("long").alias("duration"),
        # download fallback yields no links/interactions (tree.ts:368-383)
        F.when(has_download, F.lit(0)).otherwise(link_count).alias("link_count"),
        F.when(has_download, F.lit(0)).otherwise(ic).alias("interaction_count"),
        F.lit(True).alias("complete"),
    )
    out = [
        F.col(url_col).alias("url"),
        F.when(has_download, F.lit("")).otherwise(F.col(html_col).cast("string")).alias("content"),
        F.when(has_download, F.array().cast(ArrayType(udfs.LINK_STRUCT)))
        .otherwise(F.col("parsed.links"))
        .alias("links"),
        strategy.alias("strategy"),
        metrics.alias("metrics"),
    ]
    if downloads_col:
        out.append(F.col(downloads_col).alias("downloads"))
    if scraper_type == "tree":
        out.append(F.col("_exp.matched_selector").alias("matched_selector"))
    return parsed.select(*out)
