"""Live HTTP fetch adapter (spider_spark.fetch): the simple.ts:94-120
contract as a mapInPandas stage with an injectable one-hop transport —
unit semantics (redirects, final URL, status rows, headers) plus the
differential test the r02 verdict asked for: the crawl tick under
adapter='live' (fake transport) must produce the same Page rows as the
pages-table join on the same synthetic corpus."""

from __future__ import annotations

import pandas as pd

from spider_spark import fetch, synth
from spider_spark.crawler import Crawler
from spider_spark.frontier import CrawlConfig


# --- transport-level unit tests (no Spark) ---------------------------------


def test_fetch_one_follows_redirects_to_final_url():
    tp = fetch.make_table_transport(
        {"https://a.test/page": b"<html>hi</html>"},
        {"https://a.test/r1": "https://a.test/r2", "https://a.test/r2": "https://a.test/page"},
    )
    final, html, status, err, _etag, _lm = fetch.fetch_one(
        "https://a.test/r1", tp, fetch.DEFAULT_HEADERS, 5.0
    )
    assert (final, html, status, err) == ("https://a.test/page", b"<html>hi</html>", 200, None)


def test_fetch_one_redirect_limit_is_599():
    # a 6-hop chain: five follows allowed, the 6th response still redirects
    chain = {f"https://a.test/h{i}": f"https://a.test/h{i+1}" for i in range(6)}
    tp = fetch.make_table_transport({"https://a.test/h6": b"x"}, chain)
    final, html, status, err, _etag, _lm = fetch.fetch_one(
        "https://a.test/h0", tp, fetch.DEFAULT_HEADERS, 5.0
    )
    assert status == 599 and html is None and "redirect" in err
    # exactly at the limit (5 hops) still succeeds
    chain5 = {f"https://a.test/h{i}": f"https://a.test/h{i+1}" for i in range(5)}
    tp5 = fetch.make_table_transport({"https://a.test/h5": b"x"}, chain5)
    assert fetch.fetch_one("https://a.test/h0", tp5, fetch.DEFAULT_HEADERS, 5.0)[2] == 200


def test_fetch_one_http_error_is_status_row():
    tp = fetch.make_table_transport({})
    final, html, status, err, _etag, _lm = fetch.fetch_one(
        "https://a.test/missing", tp, fetch.DEFAULT_HEADERS, 5.0
    )
    assert status == 404 and html is None and err == "HTTP 404"


def test_fetch_one_transport_exception_is_599():
    def boom(url, headers, timeout):
        raise TimeoutError("connect timed out")

    final, html, status, err, _etag, _lm = fetch.fetch_one("https://a.test/", boom, {}, 1.0)
    assert status == 599 and "TimeoutError" in err


def test_fetch_one_relative_location_resolves_against_current_hop():
    def tp(url, headers, timeout):
        if url == "https://a.test/dir/start":
            return 302, {"location": "../other/page"}, b""
        if url == "https://a.test/other/page":
            return 200, {}, b"ok"
        return 404, {}, b""

    final, html, status, err, _etag, _lm = fetch.fetch_one(
        "https://a.test/dir/start", tp, {}, 5.0
    )
    assert (final, status) == ("https://a.test/other/page", 200)


def test_default_headers_match_reference_and_user_wins():
    h = fetch.merge_headers({"Accept-Language": "de"}, user_agent=None)
    assert h["User-Agent"].startswith("Mozilla/5.0 (compatible; HappyVertical Spider/2.0")
    assert h["Accept"] == "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"
    assert h["DNT"] == "1" and h["Upgrade-Insecure-Requests"] == "1"
    assert h["Accept-Language"] == "de"  # user header wins (JS spread)
    assert fetch.merge_headers({}, user_agent="custom/1.0")["User-Agent"] == "custom/1.0"


# --- DataFrame-level + differential tests ----------------------------------


def _transport_from_corpus(pages_df, redirects_df):
    pages = {r.url: bytes(r.html) for r in pages_df.select("url", "html").collect()}
    redirs = {r.src: r.location for r in redirects_df.select("src", "location").collect()}
    return fetch.make_table_transport(pages, redirs)


def test_live_fetch_dataframe_contract(spark):
    tp = fetch.make_table_transport(
        {"https://a.test/x": b"<html><a href='/y'>y</a></html>"},
        {"https://a.test/r": "https://a.test/x"},
    )
    urls = spark.createDataFrame(
        pd.DataFrame({"url_canon": ["https://a.test/r", "https://a.test/gone"]})
    )
    rows = {r.url_canon: r for r in fetch.live_fetch(urls, tp).collect()}
    hit = rows["https://a.test/r"]
    assert hit.final_url == "https://a.test/x" and hit.status == 200
    assert bytes(hit.html) == b"<html><a href='/y'>y</a></html>"
    miss = rows["https://a.test/gone"]
    assert miss.status == 404 and miss.html is None and miss.fetch_error == "HTTP 404"


def test_registry_dispatches_live_adapter(spark):
    from spider_spark import scrape

    fn = scrape.get_fetch_adapter("live")
    tp = fetch.make_table_transport({"https://a.test/x": b"<html></html>"})
    urls = spark.createDataFrame(pd.DataFrame({"url_canon": ["https://a.test/x"]}))
    assert fn(urls, tp).collect()[0].status == 200


def test_crawl_tick_live_adapter_matches_join_adapter(spark, tmp_path):
    """The differential the verdict ordered: same synthetic corpus (pages +
    redirect chains + dead links) crawled via the pages-table join and via
    adapter='live' with a fake transport over the SAME tables must agree on
    every Page row — url, final_url, status, content fingerprint, extracted
    text, links, title."""
    n, hosts = 250, 6
    pages = synth.generate_pages(spark, n, n_hosts=hosts)
    redirects = synth.generate_redirects(spark, n, n_hosts=hosts)
    seeds = synth.seed_urls(n, hosts)
    cfg = dict(per_host_budget=8)

    cj = Crawler(
        spark, pages, str(tmp_path / "join"), CrawlConfig(**cfg), redirects=redirects
    )
    stats_j = cj.run(seeds, max_ticks=4)

    tp = _transport_from_corpus(pages, redirects)
    cl = Crawler(
        spark,
        pages,  # unused by the live fetch stage; kept for revalidation APIs
        str(tmp_path / "live"),
        CrawlConfig(adapter="live", **cfg),
        transport=tp,
    )
    stats_l = cl.run(seeds, max_ticks=4)

    # identical per-tick fetch accounting
    assert [(s.fetched, s.ok, s.missing) for s in stats_j] == [
        (s.fetched, s.ok, s.missing) for s in stats_l
    ]

    cols = [
        "tick",
        "url_canon",
        "final_url",
        "status",
        "content_fp",
        "title",
        "link_count",
        "text",
    ]
    j = {(r.tick, r.url_canon): r for r in cj.results().filter("status = 200").select(*cols).collect()}
    l = {(r.tick, r.url_canon): r for r in cl.results().filter("status = 200").select(*cols).collect()}
    assert j.keys() == l.keys() and len(j) > 50
    for k in j:
        assert tuple(j[k]) == tuple(l[k]), k
    # misses agree on identity and status (the join path synthesizes 404
    # rows with final_url = url_canon; the live path reports the real
    # final hop — identity and status must still match)
    jm = {(r.tick, r.url_canon, r.status) for r in cj.results().filter("status != 200").select("tick", "url_canon", "status").collect()}
    lm = {(r.tick, r.url_canon, r.status) for r in cl.results().filter("status != 200").select("tick", "url_canon", "status").collect()}
    assert jm == lm
    # and the final URL-seen sets are identical (north-rule invariant)
    sj = {r.url_canon for r in cj.seen().collect()}
    sl = {r.url_canon for r in cl.seen().collect()}
    assert sj == sl


# --- content-encoding + conditional revalidation ----------------------------


def test_fetch_one_decodes_gzip_and_deflate():
    import gzip as _gzip
    import zlib as _zlib

    def tp(url, headers, timeout):
        if url.endswith("/gz"):
            return 200, {"Content-Encoding": "gzip"}, _gzip.compress(b"<html>gz</html>")
        if url.endswith("/zl"):
            return 200, {"content-encoding": "deflate"}, _zlib.compress(b"<html>zl</html>")
        if url.endswith("/raw-deflate"):
            co = _zlib.compressobj(wbits=-_zlib.MAX_WBITS)
            return 200, {"Content-Encoding": "deflate"}, co.compress(b"<html>raw</html>") + co.flush()
        if url.endswith("/bad"):
            return 200, {"Content-Encoding": "gzip"}, b"not gzip at all"
        if url.endswith("/br"):
            return 200, {"Content-Encoding": "br"}, b"\x00"
        return 404, {}, b""

    assert fetch.fetch_one("https://a.test/gz", tp, {}, 5.0)[1] == b"<html>gz</html>"
    assert fetch.fetch_one("https://a.test/zl", tp, {}, 5.0)[1] == b"<html>zl</html>"
    assert fetch.fetch_one("https://a.test/raw-deflate", tp, {}, 5.0)[1] == b"<html>raw</html>"
    # undecodable body → 599 status row, never a raised task failure
    assert fetch.fetch_one("https://a.test/bad", tp, {}, 5.0)[2] == 599
    # unadvertised/unsupported coding (brotli absent in this container) → 599
    _, body, status, err, _, _ = fetch.fetch_one("https://a.test/br", tp, {}, 5.0)
    assert status == 599 and "content-encoding" in err


def test_fetch_one_captures_validators_and_304():
    tp = fetch.make_table_transport(
        {"https://a.test/x": b"<html>v1</html>"},
        etags={"https://a.test/x": '"abc123"'},
        last_modified={"https://a.test/x": "Mon, 02 Jan 2006 15:04:05 GMT"},
    )
    final, html, status, err, etag, lm = fetch.fetch_one(
        "https://a.test/x", tp, fetch.DEFAULT_HEADERS, 5.0
    )
    assert status == 200 and etag == '"abc123"' and lm.startswith("Mon, 02 Jan")
    # send the stored validator back → 304, no body, no error
    cond = dict(fetch.DEFAULT_HEADERS, **{"If-None-Match": '"abc123"'})
    final, html, status, err, etag, lm = fetch.fetch_one("https://a.test/x", tp, cond, 5.0)
    assert (status, html, err) == (304, None, None)
    assert etag == '"abc123"'  # origin repeats validators on 304 (RFC 9110)
    # a STALE validator refetches in full
    stale = dict(fetch.DEFAULT_HEADERS, **{"If-None-Match": '"old"'})
    assert fetch.fetch_one("https://a.test/x", tp, stale, 5.0)[2] == 200
    # If-Modified-Since alone also revalidates
    ims = dict(fetch.DEFAULT_HEADERS, **{"If-Modified-Since": "Mon, 02 Jan 2006 15:04:05 GMT"})
    assert fetch.fetch_one("https://a.test/x", tp, ims, 5.0)[2] == 304


def test_live_fetch_conditional_columns(spark):
    tp = fetch.make_table_transport(
        {"https://a.test/a": b"<html>a</html>", "https://a.test/b": b"<html>b</html>"},
        etags={"https://a.test/a": '"ea"', "https://a.test/b": '"eb"'},
    )
    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "url_canon": ["https://a.test/a", "https://a.test/b"],
                "stored_etag": ['"ea"', None],  # a: current validator; b: none stored
            }
        )
    )
    rows = {
        r.url_canon: r
        for r in fetch.live_fetch(urls, tp, etag_col="stored_etag").collect()
    }
    a, b = rows["https://a.test/a"], rows["https://a.test/b"]
    assert a.status == 304 and a.html is None and a.etag == '"ea"'
    assert b.status == 200 and bytes(b.html) == b"<html>b</html>" and b.etag == '"eb"'


def test_live_fetch_serves_gzip_transparently(spark):
    tp = fetch.make_table_transport(
        {"https://a.test/x": b"<html>zipped</html>"}, gzip_urls={"https://a.test/x"}
    )
    urls = spark.createDataFrame(pd.DataFrame({"url_canon": ["https://a.test/x"]}))
    row = fetch.live_fetch(urls, tp).collect()[0]
    assert row.status == 200 and bytes(row.html) == b"<html>zipped</html>"


def test_accept_encoding_advertised_but_user_header_wins():
    captured = {}

    def tp(url, headers, timeout):
        captured.update(headers)
        return 200, {}, b"ok"

    # default: advertised with stdlib-decodable codings only
    h = fetch.merge_headers(None)
    assert "Accept-Encoding" not in h  # NOT in the verbatim simple.ts set
    # live_fetch adds it (checked via the behavior-level test above); at
    # the merge level a user-supplied value must survive
    user = fetch.merge_headers({"Accept-Encoding": "identity"})
    assert user["Accept-Encoding"] == "identity"


# --- intra-partition fetch concurrency (fetch.fetch_rows) ------------------


def _latency_transport(pages, delay_s):
    base = fetch.make_table_transport(pages)

    def tp(url, headers, timeout):
        import time

        time.sleep(delay_s)
        return base(url, headers, timeout)

    return tp


def test_fetch_rows_overlap_proven_by_barrier():
    """Deterministic overlap proof (no timing): the transport blocks on a
    Barrier(8) — only 8 truly concurrent requests can release each other.
    Sequential execution would deadlock; passing at concurrency=8 proves
    8 requests were in flight simultaneously."""
    import threading

    barrier = threading.Barrier(8)
    pages = {f"https://a.test/p{i}": f"<html>{i}</html>".encode() for i in range(8)}
    base = fetch.make_table_transport(pages)

    def tp(url, headers, timeout):
        barrier.wait(timeout=10)
        return base(url, headers, timeout)

    urls = sorted(pages)
    hdrs = [fetch.DEFAULT_HEADERS] * len(urls)
    got = fetch.fetch_rows(urls, hdrs, tp, 5.0, concurrency=8)
    assert [r[2] for r in got] == [200] * 8
    assert [r[1] for r in got] == [pages[u] for u in urls]  # order preserved


def test_fetch_rows_concurrent_speedup_and_row_identity():
    """The reference batches fetches with Promise.all (README.md:488-502);
    fetch_rows at concurrency N must (a) beat sequential by a wide margin
    on a latency-injected transport and (b) return byte-identical rows in
    the same order."""
    import time

    pages = {f"https://a.test/p{i}": f"<html>{i}</html>".encode() for i in range(24)}
    urls = sorted(pages)
    hdrs = [fetch.DEFAULT_HEADERS] * len(urls)

    tp = _latency_transport(pages, 0.1)
    t0 = time.perf_counter()
    seq = fetch.fetch_rows(urls, hdrs, tp, 5.0, concurrency=1)
    t_seq = time.perf_counter() - t0  # ~2.4 s: 24 × 0.1 s serialized

    t0 = time.perf_counter()
    conc = fetch.fetch_rows(urls, hdrs, tp, 5.0, concurrency=8)
    t_conc = time.perf_counter() - t0  # ideal 0.3 s: 3 rounds of 8

    assert conc == seq  # byte-identical, order-preserving
    assert t_seq / t_conc >= 5, (t_seq, t_conc)


def test_live_fetch_concurrency_rows_identical_on_spark(spark):
    """End-to-end through mapInPandas: live_fetch(concurrency=8) equals
    live_fetch(concurrency=1) row-for-row on the same fake corpus —
    redirects, misses, and transport errors included."""
    pages = {f"https://a.test/p{i}": f"<html><a href='/p0'>x</a>{i}</html>".encode() for i in range(20)}
    redirects = {"https://a.test/r": "https://a.test/p0"}
    tp = fetch.make_table_transport(pages, redirects)
    urls = spark.createDataFrame(
        pd.DataFrame({"url_canon": sorted(pages) + ["https://a.test/r", "https://a.test/gone"]})
    ).repartition(4)

    def snap(df):
        return sorted(
            (r.url_canon, r.final_url, None if r.html is None else bytes(r.html), r.status, r.fetch_error)
            for r in df.collect()
        )

    assert snap(fetch.live_fetch(urls, tp, concurrency=8)) == snap(
        fetch.live_fetch(urls, tp, concurrency=1)
    )
