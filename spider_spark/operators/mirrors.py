"""Mirror-host detection — find host pairs serving (near-)identical
content so the frontier can collapse them and stop paying fetch budget
for the same bytes twice (classic crawler concern: Heritrix/UbiCrawler
both ship mirror heuristics; at 10^10-URL scale a mirrored site family
wastes politeness budget AND poisons dedup statistics).

Content-overlap formulation over exact fingerprints:

    overlap(a, b) = |fp(a) ∩ fp(b)| / min(|fp(a)|, |fp(b)|)

computed with ONE self-equi-join on the fingerprint — never a host×host
comparison. Scale discipline (same shape as the LSH band join in
`dedup.py`):

- the profile is distinct (host, fp) pairs, so a host re-serving one
  page a million times contributes one row;
- fingerprints shared by more than ``max_hosts_per_fp`` hosts are
  dropped BEFORE the self-join (boilerplate — empty pages, "under
  construction", shared CMS defaults — would otherwise blow the join
  up quadratically in the number of hosts carrying it);
- the join emits (host_a < host_b) ordered pairs only, and only the
  two host ids cross the shuffle.

Everything is pure Catalyst and SQL-expressible; the DuckDB oracle
replays profile → hot-fp guard → pair census → overlap end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: A fingerprint carried by more hosts than this is boilerplate, not
#: mirrored content — joining it contributes O(hosts²) pairs for zero
#: mirror signal. Dropped pre-join (counted in `mirror_guard_stats`).
MAX_HOSTS_PER_FP = 16


def host_content_profile(
    pages: DataFrame, host_col: str = "host", fp_col: str = "content_fp"
) -> DataFrame:
    """Distinct (host, fp) pairs — the unit the overlap is defined on."""
    return (
        pages.select(
            F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
        )
        .where(F.col("fp").isNotNull())
        .distinct()
    )


def mirror_candidates(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "content_fp",
    min_overlap: float = 0.8,
    min_shared: int = 3,
    max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
) -> DataFrame:
    """Host pairs whose content overlap clears ``min_overlap`` with at
    least ``min_shared`` shared fingerprints: (host_a, host_b, shared,
    size_a, size_b, overlap_r).

    ``min_shared`` keeps two one-page hosts that happen to share their
    single page from reading as a 100% mirror; ``size_*`` are the
    UN-guarded profile sizes so a host that is mostly boilerplate still
    reports its true page count.
    """
    prof = host_content_profile(pages, host_col, fp_col)
    sizes = prof.groupBy("host").agg(F.count(F.lit(1)).alias("size"))
    fp_spread = prof.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    quiet = prof.join(
        fp_spread.where(F.col("n_hosts") <= max_hosts_per_fp).select("fp"),
        "fp",
        "left_semi",
    )
    a = quiet.select(F.col("host").alias("host_a"), "fp")
    b = quiet.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("size").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("size").alias("size_b")),
            "host_b",
        )
        .withColumn(
            "overlap_r",
            F.round(F.col("shared") / F.least("size_a", "size_b"), 4),
        )
        .where(F.col("overlap_r") >= min_overlap)
    )
    return out.select(
        "host_a", "host_b", "shared", "size_a", "size_b", "overlap_r"
    )


def mirror_guard_stats(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "content_fp",
    max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
) -> DataFrame:
    """Audit row for the hot-fp guard (no silent caps): how many
    distinct fingerprints the guard dropped and how many (host, fp)
    profile rows they accounted for."""
    prof = host_content_profile(pages, host_col, fp_col)
    spread = prof.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    return spread.agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.sum((F.col("n_hosts") > max_hosts_per_fp).cast("long")).alias(
            "dropped_fps"
        ),
        F.sum(
            F.when(F.col("n_hosts") > max_hosts_per_fp, F.col("n_hosts")).otherwise(
                F.lit(0)
            )
        ).alias("dropped_profile_rows"),
    )


def amp_variant_pairs(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Pair AMP page variants with their canonical siblings by URL
    convention ALONE — no content comparison: the two dominant
    publisher layouts are the ``amp.`` subdomain (amp.site.example/a)
    and the ``/amp`` path suffix (site.example/a/amp). Every AMP page
    is by definition a near-duplicate of its canonical, so the pair
    table feeds dedup (keep canonical, drop AMP) and the URL-seen layer
    (an AMP variant of a seen page is not new content) without paying a
    MinHash pass — the cheap structural sibling of
    `mirror_candidates`' content profiles.

    Returns (base_key, plain_url, amp_url): one row per AMP url whose
    de-AMPed base matches a non-AMP url in the same table (ties: the
    lexicographically smallest plain url — deterministic). AMP pages
    with no crawled canonical are absent (nothing to pair).

    Pure projection (host/path regexes from `traps`) + one partial-agg
    min per base + one equi-join on the base key — shuffle ∝ pages,
    keyed on the de-AMPed identity."""
    from .traps import col_url_host, col_url_path

    u = F.col(url_col)
    host = F.lower(col_url_host(u))
    path = col_url_path(u)
    amp_host = host.startswith("amp.")
    amp_path = path.rlike("/amp/?$")
    base_host = F.when(amp_host, F.substring(host, 5, 100000)).otherwise(host)
    base_path = F.regexp_replace(path, "/amp/?$", "")
    keyed = pages.select(
        u.alias("url"),
        F.concat(base_host, base_path).alias("base_key"),
        (amp_host | amp_path).alias("is_amp"),
    )
    plain = (
        keyed.filter(~F.col("is_amp"))
        .groupBy("base_key")
        .agg(F.min("url").alias("plain_url"))
    )
    return (
        keyed.filter(F.col("is_amp"))
        .join(plain, "base_key")
        .select("base_key", "plain_url", F.col("url").alias("amp_url"))
    )
