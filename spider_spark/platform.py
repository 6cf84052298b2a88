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

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# confidence bands mirror src/platform/types.ts:61-66 / registry.ts defaults
CONF_HIGH, CONF_MEDIUM, CONF_LOW = "high", "medium", "low"


@dataclass
class PlatformAdapter:
    """Declarative adapter: regex/contains patterns instead of callbacks —
    the whole registry stays inside Catalyst."""

    type: str
    name: str
    priority: int = 200  # registry.ts:10 default; bands types.ts:61-66
    url_pattern: str | None = None  # rlike on the URL (phase 1)
    html_pattern: str | None = None  # rlike on the HTML (phase 2)

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
        """registry.ts:156-168: a preset source.type bypasses detection."""
        detected = self.detect(sources, url_col, html_col)
        if type_col is None:
            return detected
        preset = F.col(type_col)
        return detected.withColumn(
            "detected_type", F.coalesce(preset, F.col("detected_type"))
        ).withColumn(
            "detected_confidence",
            F.when(preset.isNotNull(), F.lit(CONF_HIGH)).otherwise(F.col("detected_confidence")),
        )


def default_registry() -> AdapterRegistry:
    """The reference's built-in platforms as declarative adapters (document
    detectors, detectors.ts:142-179), priority bands preserved."""
    r = AdapterRegistry(fallback_type="generic")
    r.register(PlatformAdapter(
        type="wordpress-download-manager", name="WordPress Download Manager",
        priority=100, url_pattern=r"/download/",
        html_pattern=r"wpdm-download-link|wpdm_view_count",
    ))
    r.register(PlatformAdapter(
        type="civicweb", name="CivicWeb", priority=110,
        url_pattern=r"/filepro/documents/\?preview=|civicweb\.net",
        html_pattern=r"/filepro/document/",
    ))
    r.register(PlatformAdapter(
        type="docushare", name="DocuShare", priority=120,
        url_pattern=r"/docushare/dsweb/|DocuShare",
        html_pattern=r"DocuShare|/dsweb/Get/|/dsweb/ServicesLib/",
    ))
    return r
