"""robots.txt parsing + rule evaluation (RFC 9309 Robots Exclusion Protocol).

The reference treats robots compliance as caller policy (explicit non-goal,
SPEC.md:254-255; README.md:597); this engine makes it first-class per the
north rule ("politeness, robots"). Round 1 modeled robots as a pre-parsed
rules table `(host, disallow_prefixes, crawl_delay_ms)`; a real crawl
ingests raw `robots.txt` *bodies* fetched per host. This module closes
that gap:

- ``parse_robots_txt(body, user_agent)`` — scalar RFC 9309 parser: comment
  stripping, ``key: value`` records, user-agent group collection (multiple
  UA lines per group), most-specific-group selection with ``*`` fallback,
  merging of same-token groups (RFC 9309 §2.2.1 "combine"), Allow /
  Disallow rule lists, and the de-facto ``Crawl-delay`` extension
  (seconds → ms). Input capped at 512 000 bytes (RFC 9309 §2.5 requires
  parsers to handle at least 500 KiB; bytes past the cap are ignored,
  matching Google's documented behavior).
- ``robots_allowed(path, allow, disallow)`` — scalar longest-match
  evaluation with ``*`` wildcards and the ``$`` end anchor; ties go to
  Allow (RFC 9309 §2.2.2).
- ``col_robots_allowed`` — the same evaluation as a pure Catalyst
  expression over array columns (no UDF in the gate hot path).
- ``rules_from_bodies`` — vectorized pandas UDF turning a
  ``(host, robots_txt)`` DataFrame into the rules table the politeness
  gate consumes (a superset of ``synth.ROBOTS_SCHEMA``: adds
  ``allow_prefixes``).

Scale notes: robots bodies are one row per *host* (10^7-ish at 10^10
URLs, not 10^10); parsing is a single vectorized pass and the resulting
rules table is the small side of the frontier⋈robots broadcast join.
Rule lists are capped (``MAX_RULES``) so a pathological robots.txt cannot
blow up the broadcast. Deliberate simplifications, documented: patterns
are compared verbatim (no percent-decoding normalization of %2F vs /),
and ``Crawl-delay`` takes the minimum across merged groups (conservative).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAX_BYTES = 512_000  # RFC 9309 §2.5: must process ≥500 KiB; ignore the rest
MAX_RULES = 1000  # bound broadcast-side memory per host
MAX_DELAY_MS = 2**31 - 1  # clamp: survives hostile 'Crawl-delay: 1e306', fits Int32

_LINE_SPLIT = re.compile(r"\r\n|\r|\n")
_RECORD = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


@dataclass
class RobotsRules:
    """Parsed rules for one crawler on one host."""

    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay_ms: int | None = None
    matched_ua: str | None = None  # which group token won (None = no group)


def _normalize_pattern(value: str) -> str:
    """RFC patterns are path-relative; tolerate missing leading '/'."""
    if value.startswith("/") or value.startswith("*"):
        return value
    return "/" + value


def parse_robots_txt(body: str | None, user_agent: str = "*") -> RobotsRules:
    """Parse a robots.txt body and return the rules governing ``user_agent``.

    Group selection (RFC 9309 §2.2.1): a group applies if its user-agent
    token is ``*`` or a case-insensitive prefix of ``user_agent``; among
    applicable groups the most specific (longest token) wins, and *all*
    groups carrying that same token are combined. Rules appearing before
    any ``User-agent`` line are ignored (undefined per RFC).
    """
    if not body:
        return RobotsRules()
    body = body[:MAX_BYTES]
    ua = user_agent.lower()

    # group token (lower) → rules; insertion order preserved for determinism
    groups: dict[str, RobotsRules] = {}
    current: list[str] = []  # tokens of the group being filled
    in_ua_run = False  # consecutive UA lines extend the same group
    for raw in _LINE_SPLIT.split(body):
        line = raw.split("#", 1)[0]
        m = _RECORD.match(line)
        if not m:
            # Blank, comment-only, and unparseable lines are ignored
            # entirely — RFC 9309's ABNF allows emptylines between
            # startgrouplines, so they must NOT end a UA run (a comment
            # between two User-agent lines would otherwise split the group).
            continue
        key, value = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if not in_ua_run:
                current = []
                in_ua_run = True
            tok = value.strip().lower()
            if tok and tok not in current:  # repeated token ≠ doubled rules
                current.append(tok)
                groups.setdefault(tok, RobotsRules(matched_ua=tok))
            continue
        in_ua_run = False  # only a rule line ends a UA run
        if not current:
            continue  # rules before any group: ignored
        for tok in current:
            g = groups[tok]
            if key == "disallow":
                if value and len(g.disallow) < MAX_RULES:
                    g.disallow.append(_normalize_pattern(value))
            elif key == "allow":
                if value and len(g.allow) < MAX_RULES:
                    g.allow.append(_normalize_pattern(value))
            elif key == "crawl-delay":
                try:
                    ms = int(min(float(value), MAX_DELAY_MS / 1000) * 1000)
                except (ValueError, OverflowError):  # 'soon', 'inf', 'nan', 1e306
                    continue
                if ms >= 0 and (g.crawl_delay_ms is None or ms < g.crawl_delay_ms):
                    g.crawl_delay_ms = ms

    # pick the most specific applicable token; '*' has specificity 0
    best: str | None = None
    best_spec = -1
    for tok in groups:
        if tok == "*":
            spec = 0
        elif ua.startswith(tok):
            spec = len(tok)
        else:
            continue
        if spec > best_spec:
            best, best_spec = tok, spec
    if best is None:
        return RobotsRules()
    return groups[best]


# ---------------------------------------------------------------------------
# Rule evaluation (longest-match, '*' wildcard, '$' anchor)
# ---------------------------------------------------------------------------


def _pattern_matches(path: str, pattern: str) -> bool:
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(part) for part in core.split("*"))
    if anchored:
        rx += "$"
    return re.match(rx, path) is not None


def robots_allowed(path: str, allow: list[str], disallow: list[str]) -> bool:
    """Longest-match evaluation: the most specific matching rule wins
    (specificity = pattern length); a tie goes to Allow (RFC 9309 §2.2.2)."""
    dis = max((len(p) for p in disallow if _pattern_matches(path, p)), default=-1)
    if dis < 0:
        return True
    alw = max((len(p) for p in allow if _pattern_matches(path, p)), default=-1)
    return alw >= dis


def _col_pattern_matches(path: Column, pattern: Column) -> Column:
    """Catalyst twin of ``_pattern_matches``: build the regex from the
    pattern *as data* (escape metachars, '*'→'.*', keep a trailing '$')."""
    anchored = pattern.endswith("$")
    core = F.when(anchored, F.substring(pattern, F.lit(1), F.length(pattern) - 1)).otherwise(pattern)
    escaped = F.regexp_replace(core, r"([\\^$.|?+()\[\]{}])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(escaped, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.rlike(path, rx)


def col_robots_allowed(path: Column, allow: Column, disallow: Column) -> Column:
    """Pure-Catalyst longest-match robots evaluation over array columns.

    Null/empty rule arrays ⇒ allowed. Stays inside codegen (higher-order
    array functions + rlike); no Python in the politeness gate."""
    def max_match_len(arr: Column) -> Column:
        return F.array_max(
            F.transform(
                F.filter(F.coalesce(arr, F.array()), lambda p: _col_pattern_matches(path, p)),
                F.length,
            )
        )

    dis = max_match_len(disallow)
    alw = max_match_len(allow)
    return dis.isNull() | (alw.isNotNull() & (alw >= dis))


# ---------------------------------------------------------------------------
# Vectorized parsing: (host, robots_txt) bodies → politeness rules table
# ---------------------------------------------------------------------------

RULES_STRUCT = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType()), False),
        StructField("allow_prefixes", ArrayType(StringType()), False),
        StructField("crawl_delay_ms", IntegerType(), True),
        StructField("matched_ua", StringType(), True),
    ]
)


def robots_rules_udf(user_agent: str = "*"):
    """pandas UDF: robots.txt body column → parsed-rules struct column."""

    @pandas_udf(RULES_STRUCT)
    def parse(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for bodies in batches:
            parsed = [parse_robots_txt(b, user_agent) for b in bodies]
            yield pd.DataFrame(
                {
                    "disallow_prefixes": [r.disallow for r in parsed],
                    "allow_prefixes": [r.allow for r in parsed],
                    "crawl_delay_ms": pd.array(
                        [r.crawl_delay_ms for r in parsed], dtype="Int32"
                    ),
                    "matched_ua": [r.matched_ua for r in parsed],
                }
            )

    return parse


def rules_from_bodies(
    bodies: DataFrame,
    user_agent: str = "*",
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Turn a ``(host, robots_txt)`` DataFrame into the rules table the
    politeness gate consumes (drop-in for ``synth.generate_robots`` output,
    plus ``allow_prefixes``). One vectorized pass; rows stay per-host."""
    parsed = bodies.select(
        F.col(host_col).alias("host"),
        robots_rules_udf(user_agent)(F.col(body_col)).alias("r"),
    )
    return parsed.select(
        "host",
        F.col("r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("r.allow_prefixes").alias("allow_prefixes"),
        F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
    )


def robots_policy_diff(
    old_rules: DataFrame,
    new_rules: DataFrame,
    probes: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Policy drift between two robots.txt snapshots — the recrawl-wave
    hygiene check: which frontier URLs flipped allowed↔denied (and which
    hosts changed their Crawl-delay) when the robots files were
    re-fetched. A URL that turns ``newly_denied`` must be dropped from
    the pending frontier; ``newly_allowed`` URLs are recrawl candidates.

    Inputs: two rules tables as produced by ``rules_from_bodies``
    (host, disallow_prefixes, allow_prefixes, crawl_delay_ms) and a
    ``probes`` frame of (host, path) — typically the pending frontier
    projected to its path. A host absent from a snapshot evaluates as
    all-allowed (RFC 9309 §2.3.1: unavailable robots.txt imposes no
    restrictions) — ``col_robots_allowed`` already yields allowed on
    null rule arrays, so the left joins need no special casing.

    Physical shape: rules tables are one row per HOST — orders of
    magnitude smaller than the frontier — so both joins broadcast under
    AQE and the evaluation (codegen rlike over array columns) is
    map-only over the probe side; a mega-host's probe skew never
    matters because the host key is only ever the small side's join
    key. Returns (host, path, allowed_old, allowed_new,
    crawl_delay_ms_old, crawl_delay_ms_new, verdict) with verdict in
    {still_allowed, newly_denied, newly_allowed, still_denied}.
    """
    def leg(rules: DataFrame, tag: str) -> DataFrame:
        return rules.select(
            F.col("host").alias(f"_h_{tag}"),
            F.col("allow_prefixes").alias(f"_al_{tag}"),
            F.col("disallow_prefixes").alias(f"_dis_{tag}"),
            F.col("crawl_delay_ms").alias(f"crawl_delay_ms_{tag}"),
        )

    base = probes.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("path")
    )
    joined = (
        base.join(leg(old_rules, "old"), F.col("host") == F.col("_h_old"), "left")
        .join(leg(new_rules, "new"), F.col("host") == F.col("_h_new"), "left")
    )
    a_old = col_robots_allowed(
        F.col("path"), F.col("_al_old"), F.col("_dis_old")
    )
    a_new = col_robots_allowed(
        F.col("path"), F.col("_al_new"), F.col("_dis_new")
    )
    return joined.select(
        "host",
        "path",
        a_old.alias("allowed_old"),
        a_new.alias("allowed_new"),
        "crawl_delay_ms_old",
        "crawl_delay_ms_new",
        F.when(a_old & a_new, F.lit("still_allowed"))
        .when(a_old & ~a_new, F.lit("newly_denied"))
        .when(~a_old & a_new, F.lit("newly_allowed"))
        .otherwise(F.lit("still_denied"))
        .alias("verdict"),
    )


# --- Sitemap directive (RFC 9309 §2.3: a non-group record — applies to the
# whole file regardless of user-agent groups) ------------------------------

_SITEMAP_LINE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"


def sitemap_urls(body: str | None) -> list[str]:
    """Scalar: ordered, keep-first-deduped Sitemap URLs from a robots.txt
    body (same MAX_BYTES truncation as the rule parser)."""
    if not body:
        return []
    out: list[str] = []
    for m in re.finditer(_SITEMAP_LINE, body[:MAX_BYTES]):
        u = m.group(1)
        if u not in out:
            out.append(u)
    return out


def col_sitemap_urls(body: Column) -> Column:
    """Pure-Catalyst form of ``sitemap_urls`` (``array_distinct`` keeps the
    first occurrence in order, matching the scalar's keep-first)."""
    truncated = F.substring(body, 1, MAX_BYTES)
    return F.array_distinct(
        F.regexp_extract_all(truncated, F.lit(_SITEMAP_LINE), F.lit(1))
    )


def sitemap_urls_from_bodies(
    bodies: DataFrame, body_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """(host, robots_txt) → one row per declared sitemap URL, document
    order, keep-first per host. Feed the ``loc`` output of
    ``sitemap.sitemap_entries`` after fetching these URLs — robots.txt is
    how a crawl discovers the sitemaps in the first place."""
    return bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(col_sitemap_urls(F.col(body_col))).alias("pos", "sitemap_url"),
    )


#: The training-data crawler user-agents publishers gate in robots.txt —
#: each vendor's documented token (OpenAI GPTBot, Anthropic ClaudeBot,
#: Google-Extended = Google's AI-training control distinct from
#: Googlebot, Common Crawl's CCBot, Apple's Applebot-Extended).
AI_CRAWLER_UAS = (
    "GPTBot",
    "ClaudeBot",
    "Google-Extended",
    "CCBot",
    "Applebot-Extended",
)


def ai_crawler_policy(
    bodies: DataFrame,
    user_agents: tuple[str, ...] = AI_CRAWLER_UAS,
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Per-host training-crawler policy census — the robots.txt side of
    the ML opt-out story (`metarobots.screen_ai_optout` reads the
    in-page side): one row per (host, agent) with ``root_allowed`` =
    may that agent fetch "/" under RFC 9309 group selection (specific
    UA group beats ``*``, longest-match precedence, unavailable ⇒
    allow), plus the group's rule counts for auditing. A corpus export
    gate ANDs this with the page-level screen: a host that disallows
    GPTBot/ClaudeBot/Google-Extended at the root has opted its whole
    site out of training crawls, whatever the individual pages say.

    One vectorized parse per agent (the `rules_from_bodies` pass — the
    scalar RFC 9309 parser already handles group selection per UA),
    unioned; rows = hosts × |agents|, politeness-table-sized."""
    out = None
    for ua in user_agents:
        rules = rules_from_bodies(
            bodies, user_agent=ua, body_col=body_col, host_col=host_col
        )
        leg = rules.select(
            "host",
            F.lit(ua).alias("agent"),
            col_robots_allowed(
                F.lit("/"),
                F.col("allow_prefixes"),
                F.col("disallow_prefixes"),
            ).alias("root_allowed"),
            F.size(F.coalesce("disallow_prefixes", F.array())).alias(
                "n_disallow"
            ),
            F.size(F.coalesce("allow_prefixes", F.array())).alias("n_allow"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out
