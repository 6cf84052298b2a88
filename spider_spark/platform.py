"""Platform adapter registry — two-phase detection as declarative column
expressions (/root/reference/src/platform/registry.ts:35-188).

The reference keeps an ordered adapter list (ascending ``priority``,
registry.ts:71-76) and resolves a source in two phases:

- phase 1: ``detectUrl`` per adapter, priority order, NO network
  (registry.ts:94-104) — here a ``coalesce`` of URL-pattern expressions,
- phase 2: ONE shared page fetch, then ``detectHtml`` per adapter
  (registry.ts:106-132) — here more expressions over the single ``html``
  column (the "fetch once, probe many" sharing is a plain column reuse),
- fallback type at confidence 'low' (registry.ts:134-147).

Semantics preserved: duplicate type registration rejected
(registry.ts:46-52); a throwing detector is skipped — expressions cannot
throw, mis-matches just yield null (the same observable behavior,
registry.ts:98-104); an adapter cannot spoof another's type
(registry.ts:97) because the type literal comes from the registry row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# confidence bands mirror src/platform/types.ts:61-66 / registry.ts defaults
CONF_HIGH, CONF_MEDIUM, CONF_LOW = "high", "medium", "low"


@dataclass
class PlatformAdapter:
    """Declarative adapter: regex/contains patterns instead of callbacks —
    the whole registry stays inside Catalyst.

    ``item_href_pattern`` is the adapter's ``fetch(source, ctx) → TItem[]``
    contract (types.ts:67-91) in declarative form: which anchor hrefs on the
    source page become normalized item rows (see
    ``AdapterRegistry.fetch_items``)."""

    type: str
    name: str
    priority: int = 200  # registry.ts:10 default; bands types.ts:61-66
    url_pattern: str | None = None  # rlike on the URL (phase 1)
    html_pattern: str | None = None  # rlike on the HTML (phase 2)
    item_href_pattern: str | None = None  # hrefs that become items (fetch stage)

    def detect_url_expr(self, url: Column) -> Column:
        if not self.url_pattern:
            return F.lit(None).cast("string")
        return F.when(url.rlike(self.url_pattern), F.lit(self.type))

    def detect_html_expr(self, html: Column) -> Column:
        if not self.html_pattern:
            return F.lit(None).cast("string")
        return F.when(html.rlike(self.html_pattern), F.lit(self.type))


class AdapterRegistry:
    def __init__(self, fallback_type: str | None = None):
        self._adapters: dict[str, PlatformAdapter] = {}
        self.fallback_type = fallback_type

    # -- registration (registry.ts:40-66) ---------------------------------
    def register(self, adapter: PlatformAdapter) -> None:
        if adapter.type in self._adapters:
            raise ValueError(f"adapter type already registered: {adapter.type}")
        self._adapters[adapter.type] = adapter

    def unregister(self, type_: str) -> bool:
        return self._adapters.pop(type_, None) is not None

    def has(self, type_: str) -> bool:
        return type_ in self._adapters

    def all(self) -> list[PlatformAdapter]:
        """Ascending priority, stable on insertion order for ties —
        registry.ts:71-76."""
        return sorted(self._adapters.values(), key=lambda a: a.priority)

    # -- detection (registry.ts:87-149) -----------------------------------
    def detect(self, sources: DataFrame, url_col: str = "url",
               html_col: str | None = "html") -> DataFrame:
        """Adds (detected_type, detected_confidence). Phase 1 = URL
        patterns (no html access); phase 2 = html patterns, evaluated only
        where phase 1 missed (the single shared fetch of registry.ts:113);
        fallback at 'low'."""
        url = F.col(url_col)
        ordered = self.all()
        phase1 = F.coalesce(
            *[a.detect_url_expr(url) for a in ordered], F.lit(None).cast("string")
        )
        out = sources.withColumn("_p1", phase1)
        if html_col is not None:
            html = F.col(html_col).cast("string")
            phase2 = F.coalesce(
                *[a.detect_html_expr(html) for a in ordered], F.lit(None).cast("string")
            )
            out = out.withColumn("_p2", F.when(F.col("_p1").isNull(), phase2))
        else:
            out = out.withColumn("_p2", F.lit(None).cast("string"))
        detected = F.coalesce(F.col("_p1"), F.col("_p2"), F.lit(self.fallback_type))
        confidence = (
            F.when(F.col("_p1").isNotNull(), CONF_HIGH)
            .when(F.col("_p2").isNotNull(), CONF_MEDIUM)
            .when(F.lit(self.fallback_type is not None), CONF_LOW)
        )
        return out.withColumn("detected_type", detected).withColumn(
            "detected_confidence", confidence
        ).drop("_p1", "_p2")

    def resolve(self, sources: DataFrame, url_col: str = "url",
                html_col: str | None = "html", type_col: str | None = None) -> DataFrame:
        """registry.ts:156-168: a preset source.type naming a REGISTERED
        adapter bypasses detection entirely (registry.ts:161-162); an
        unregistered preset falls through to detection."""
        detected = self.detect(sources, url_col, html_col)
        if type_col is None:
            return detected
        preset = F.col(type_col)
        valid_preset = preset.isin(list(self._adapters)) if self._adapters else F.lit(False)
        return detected.withColumn(
            "detected_type", F.when(valid_preset, preset).otherwise(F.col("detected_type"))
        ).withColumn(
            "detected_confidence",
            F.when(valid_preset, F.lit(CONF_HIGH)).otherwise(F.col("detected_confidence")),
        )

    # -- item extraction (registry.ts:174-187 fetchItems) ------------------

    ITEM_STRUCT = StructType(
        [
            StructField("url", StringType()),
            StructField("detected_type", StringType()),
            StructField("item_pos", IntegerType()),
            StructField("item_url", StringType()),
            StructField("item_text", StringType()),
            StructField("error", StringType()),
        ]
    )

    def fetch_items(self, sources: DataFrame, url_col: str = "url",
                    html_col: str = "html", type_col: str | None = None) -> DataFrame:
        """``AdapterRegistry.fetchItems`` (registry.ts:174-187) as a UDTF:
        resolve each source (preset-type bypass included), then run the
        resolved adapter's item extraction — one source row → N item rows
        via ``mapInPandas`` flat-map (the ``PlatformAdapter.fetch`` contract,
        types.ts:67-91).

        Items are the anchors whose resolved absolute href matches the
        adapter's ``item_href_pattern``, document order, keep-first dedupe
        on the absolute href (the reference adapters' universal discipline,
        links.ts:31-35). A source no adapter resolves yields ONE row with
        ``error='validation_error'`` and null item fields — the row-wise
        form of the ValidationError throw (registry.ts:181-185); exceptions
        don't scale row-wise.

        Scale: the per-source work is bounded by page size; the flat-map
        keeps the page's partitioning (no shuffle), and only (url, html,
        detected_type) ride the Arrow transfer."""
        import pandas as pd

        from . import textops

        resolved = self.resolve(sources, url_col, html_col, type_col)
        patterns = {
            a.type: a.item_href_pattern for a in self.all() if a.item_href_pattern
        }
        registered = set(self._adapters)
        schema = self.ITEM_STRUCT

        def extract(batches):
            compiled = {t: re.compile(p, re.IGNORECASE) for t, p in patterns.items()}
            for pdf in batches:
                out = []
                for url, html, typ in zip(
                    pdf["__url"], pdf["__html"], pdf["detected_type"]
                ):
                    url = "" if url is None else str(url)
                    if typ is None or typ not in registered:
                        # no registered adapter resolves (a fallback type is
                        # not an adapter) ⇒ ValidationError row
                        out.append(
                            {
                                "url": url,
                                "detected_type": typ,
                                "item_pos": None,
                                "item_url": None,
                                "item_text": None,
                                "error": "validation_error",
                            }
                        )
                        continue
                    if typ not in compiled:
                        continue  # registered adapter with no items ⇒ []
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", errors="replace")
                    html = "" if html is None else str(html)
                    pat = compiled[typ]
                    pos = 0
                    for link in textops.extract_html_links(html, url):
                        if not pat.search(link.href):
                            continue
                        out.append(
                            {
                                "url": url,
                                "detected_type": typ,
                                "item_pos": pos,
                                "item_url": link.href,
                                "item_text": link.text,
                                "error": None,
                            }
                        )
                        pos += 1
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

        narrow = resolved.select(
            F.col(url_col).alias("__url"),
            F.col(html_col).alias("__html"),
            "detected_type",
        )
        return narrow.mapInPandas(extract, schema)


@dataclass
class AdapterContext:
    """The injected I/O surface platform adapters receive
    (src/platform/types.ts:46-55; wiring src/platform/context.ts:46-59:
    ``fetchPage`` mirrors the spider adapter, ``scrapeIndex`` the scraper).

    Spark-first translation: the context carries DataFrame-level
    capabilities, not per-row I/O — ``fetch_page`` resolves a urls frame
    against the engine's page store (the sandbox "network": equi-join on
    url, exactly the fetch-stage contract of frontier.fetch_and_parse),
    ``scrape_index`` runs the link-extraction entry point, ``log`` is
    driver-side.

    ``ai`` is the reference's optional untyped AI-client slot
    (types.ts:52: "Optional AI client for discoverOptions (untyped to
    avoid a hard dep)") made DataFrame-shaped: an optional callable
    ``(df: DataFrame, prompt: str) -> DataFrame`` that an adapter may
    use to enrich/label a frame. None by default — adapters must treat
    it as absent-capable exactly as the reference's ``ai?`` is, and
    ``ask_ai`` raises a clear error when unbound rather than guessing."""

    pages: DataFrame | None = None
    log: object = print
    ai: object | None = None

    def ask_ai(self, df: DataFrame, prompt: str) -> DataFrame:
        if self.ai is None:
            raise ValueError("AdapterContext has no ai client bound (types.ts:52 'ai?')")
        return self.ai(df, prompt)

    def fetch_page(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        if self.pages is None:
            raise ValueError("AdapterContext has no page store bound")
        return urls.join(self.pages, urls[url_col] == self.pages["url"], "left").select(
            urls[url_col].alias("url"), self.pages["html"].alias("html")
        )

    def scrape_index(self, pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
        from .scrape import scrape_index

        return scrape_index(pages, url_col, html_col)


def default_registry() -> AdapterRegistry:
    """The reference's built-in platforms as declarative adapters (document
    detectors, detectors.ts:142-179), priority bands preserved."""
    r = AdapterRegistry(fallback_type="generic")
    r.register(PlatformAdapter(
        type="wordpress-download-manager", name="WordPress Download Manager",
        priority=100, url_pattern=r"/download/",
        html_pattern=r"wpdm-download-link|wpdm_view_count",
        item_href_pattern=r"wpdmdl=\d+|\.pdf",  # detectors.ts:53,66
    ))
    r.register(PlatformAdapter(
        type="civicweb", name="CivicWeb", priority=110,
        url_pattern=r"/filepro/documents/\?preview=|civicweb\.net",
        html_pattern=r"/filepro/document/",
        item_href_pattern=r"/filepro/document/\d+/[^\"']+\.pdf",  # detectors.ts:100-102
    ))
    r.register(PlatformAdapter(
        type="docushare", name="DocuShare", priority=120,
        url_pattern=r"/docushare/dsweb/|DocuShare",
        html_pattern=r"DocuShare|/dsweb/Get/|/dsweb/ServicesLib/",
        # detectors.ts:126-130 href alternation over office extensions
        item_href_pattern=r"/dsweb/(Get|ServicesLib)/Document-\d+/.+\.(pdf|doc|docx|xls|xlsx|ppt|pptx)",
    ))
    return r
