"""Mirror-host detection (operators/mirrors.py): planted mirror pair,
overlap arithmetic, hot-fingerprint guard, min_shared floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import mirrors


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, content_fp long")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # a.example and mirror-of-a share 9 of 10 pages
    for i in range(10):
        rows.append(("a.example", 1000 + i))
        if i < 9:
            rows.append(("mirror-of-a", 1000 + i))
    rows.append(("mirror-of-a", 9999))
    # b.example unrelated but shares 2 pages with a (below min_shared=3)
    rows += [("b.example", 1000), ("b.example", 1001)] + [
        ("b.example", 2000 + i) for i in range(8)
    ]
    # boilerplate fp carried by 20 hosts (over the guard) — including a/mirror
    for h in range(20):
        rows.append((f"h{h:02d}.example", 77))
    rows += [("a.example", 77), ("mirror-of-a", 77)]
    # duplicates in the raw pages must not inflate profiles
    rows += [("a.example", 1000)] * 5
    return _pages(spark, rows)


def test_planted_mirror_found_with_exact_overlap(spark, corpus):
    got = mirrors.mirror_candidates(corpus, min_overlap=0.5).collect()
    pairs = {(r.host_a, r.host_b): r for r in got}
    assert ("a.example", "mirror-of-a") in pairs
    r = pairs[("a.example", "mirror-of-a")]
    assert r.shared == 9  # fp 77 guarded out, dup rows collapsed
    # sizes are UN-guarded profile sizes (include the boilerplate fp)
    assert r.size_a == 11 and r.size_b == 11
    assert r.overlap_r == pytest.approx(round(9 / 11, 4))


def test_min_shared_floor_blocks_small_overlap(spark, corpus):
    got = mirrors.mirror_candidates(corpus, min_overlap=0.0, min_shared=3).collect()
    assert not any({"b.example"} & {r.host_a, r.host_b} for r in got)
    got2 = mirrors.mirror_candidates(corpus, min_overlap=0.0, min_shared=2).collect()
    assert any({"b.example"} & {r.host_a, r.host_b} for r in got2)


def test_hot_fp_guard_prevents_boilerplate_pairs(spark, corpus):
    # with the guard OFF the 22-host boilerplate fp creates hundreds of pairs
    off = mirrors.mirror_candidates(
        corpus, min_overlap=0.0, min_shared=1, max_hosts_per_fp=10**6
    ).count()
    on = mirrors.mirror_candidates(
        corpus, min_overlap=0.0, min_shared=1
    ).count()
    assert off > 200 and on < 10


def test_guard_stats_audit(spark, corpus):
    st = mirrors.mirror_guard_stats(corpus).collect()[0]
    assert st.dropped_fps == 1
    assert st.dropped_profile_rows == 22
    assert st.n_fps == 10 + 1 + 1 + 8  # a's 10, mirror's 9999, fp77, b's 8


def test_null_fp_ignored(spark):
    pages = spark.createDataFrame(
        [("x", None), ("y", None), ("x", 1), ("y", 1), ("x", 2), ("y", 2), ("x", 3), ("y", 3)],
        "host string, content_fp long",
    )
    got = mirrors.mirror_candidates(pages, min_overlap=0.9, min_shared=3).collect()
    assert len(got) == 1 and got[0].shared == 3 and got[0].size_a == 3


def test_amp_variant_pairs(spark):
    from spider_spark.operators.mirrors import amp_variant_pairs

    pages = spark.createDataFrame(
        [
            ("https://site.example/story",),
            ("https://site.example/story/amp",),
            ("https://amp.site.example/story",),
            ("https://other.example/a/amp/",),
            ("https://other.example/a",),
            ("https://lonely.example/amp-only/amp",),  # no canonical crawled
            ("https://plain.example/x",),              # no amp variant
            ("https://site.example/amplifier",),       # 'amp' not a suffix
        ],
        "url string",
    )
    got = sorted(
        (r["base_key"], r["plain_url"], r["amp_url"])
        for r in amp_variant_pairs(pages).collect()
    )
    assert got == sorted([
        ("other.example/a", "https://other.example/a",
         "https://other.example/a/amp/"),
        ("site.example/story", "https://site.example/story",
         "https://site.example/story/amp"),
        ("site.example/story", "https://site.example/story",
         "https://amp.site.example/story"),
    ])
