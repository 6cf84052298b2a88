"""Curation operators: decontamination, deterministic splits, stratified
sampling, per-source quota (operators/curation.py)."""

import hashlib

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from spider_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def test_word_ngrams_short_text_yields_empty(spark):
    # Guards the Spark sequence(1, 0)-descends pitfall: texts shorter than
    # n must produce [] — not a bogus gram from a [1, 0] index sequence.
    df = _docs(
        spark,
        [
            {"doc_id": 1, "text": "one two"},
            {"doc_id": 2, "text": "one two three"},
            {"doc_id": 3, "text": "   "},
        ],
    ).select("doc_id", curation.word_ngrams("text", 3).alias("g"))
    got = {r.doc_id: r.g for r in df.collect()}
    assert got[1] == []
    assert got[2] == ["one two three"]
    assert got[3] == []


def test_decontaminate_counts_distinct_matched_grams(spark):
    bench = _docs(spark, [{"doc_id": 0, "text": "alpha beta gamma delta"}])
    docs = _docs(
        spark,
        [
            # shares "alpha beta gamma" and "beta gamma delta" → 2 matches
            {"doc_id": 10, "text": "alpha beta gamma delta epsilon"},
            # repeated occurrences of one gram still count once (distinct per doc)
            {"doc_id": 11, "text": "alpha beta gamma zz alpha beta gamma"},
            {"doc_id": 12, "text": "totally unrelated words here"},
        ],
    )
    grams = curation.benchmark_ngrams(bench, n=3)
    out = {
        r.doc_id: r.n_matched_grams
        for r in curation.decontaminate(docs, grams, n=3).collect()
    }
    assert out == {10: 2, 11: 1}


def test_decontaminate_shuffle_join_matches_broadcast(spark):
    bench = _docs(spark, [{"doc_id": 0, "text": "a b c d e f"}])
    docs = _docs(
        spark,
        [{"doc_id": i, "text": f"a b c pad{i} d e f"} for i in range(10, 20)],
    )
    grams = curation.benchmark_ngrams(bench, n=3)
    bc = sorted(curation.decontaminate(docs, grams, n=3, broadcast=True).collect())
    sj = sorted(curation.decontaminate(docs, grams, n=3, broadcast=False).collect())
    assert bc == sj and len(bc) == 10


def _py_bucket(key, n=100):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % n


def test_assign_splits_matches_portable_md5_and_is_exhaustive(spark):
    docs = _docs(spark, [{"doc_id": i, "text": "x"} for i in range(200)])
    rows = curation.assign_splits(docs, val_pct=5, test_pct=5).collect()
    assert len(rows) == 200
    for r in rows:
        b = _py_bucket(r.doc_id)
        assert r.bucket == b
        expect = "test" if b < 5 else ("val" if b < 10 else "train")
        assert r.split == expect


def test_stratified_sample_rates_and_missing_stratum(spark):
    docs = _docs(
        spark,
        [{"doc_id": i, "lang": ["en", "de", "xx"][i % 3], "text": "x"} for i in range(300)],
    )
    out = curation.stratified_hash_sample(docs, "lang", {"en": 100, "de": 50}).collect()
    langs = {r.lang for r in out}
    assert "xx" not in langs  # missing stratum → rate 0 → dropped
    en = [r for r in out if r.lang == "en"]
    assert len(en) == 100  # rate 100 keeps every en row
    de_ids = {r.doc_id for r in out if r.lang == "de"}
    # exactly the de rows whose portable bucket < 50, nothing else
    expect = {
        i for i in range(300) if i % 3 == 1 and _py_bucket(i) < 50
    }
    assert de_ids == expect


def test_per_source_quota_matches_naive_window_on_skew(spark):
    # one mega-source (200 rows) + two small ones; two-phase salted top-k
    # must equal the naive single-window answer exactly.
    rows = [
        {"doc_id": i, "source": "mega", "text": "w " * (i % 37), "n_chars": (i * 13) % 997}
        for i in range(200)
    ]
    rows += [
        {"doc_id": 1000 + i, "source": f"s{i % 2}", "text": "y", "n_chars": i}
        for i in range(6)
    ]
    docs = _docs(spark, rows)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = {
        (r.source, r.quota_rank): r.doc_id
        for r in curation.per_source_quota(docs, k=4, order_by=order).collect()
    }
    w = Window.partitionBy("source").orderBy(*order)
    naive = {
        (r.source, r.rk): r.doc_id
        for r in docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .collect()
    }
    assert got == naive
    assert max(rk for (_, rk) in got) <= 4
    assert len([1 for (s, _) in got if s == "mega"]) == 4


def _redact_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return curation.redact_pii(df).collect()[0]


def test_pii_redact_all_three_classes(spark):
    r = _redact_one(
        spark, "mail a.b+c@sub.example.org from 192.168.0.254 call 202-555-0142 now"
    )
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    assert r.redacted == (
        "mail |||EMAIL_ADDRESS||| from |||IP_ADDRESS||| call |||PHONE_NUMBER||| now"
    )


def test_pii_ip_octet_bounds_and_word_boundaries(spark):
    # 256 is not an octet; 999.1.1.1 is not an IP; digits glued to a quad
    # fail the boundary
    r = _redact_one(spark, "a 256.1.1.1 b 999.1.1.1 c 12.3.4.56 d")
    assert r.n_ips == 1
    assert "12.3.4.56" not in r.redacted and "999.1.1.1" in r.redacted
    # five dotted groups: the leftmost four-octet extent masks, tail stays
    r2 = _redact_one(spark, "x 1.2.3.4.5 y")
    assert r2.redacted == "x |||IP_ADDRESS|||.5 y"


def test_pii_phone_requires_uniform_shape(spark):
    r = _redact_one(spark, "call 2025550142 or 202 555 0142 or 202-555-014")
    # bare 10 digits and a 3-3-3 tail don't match; spaced 3-3-4 does
    assert r.n_phones == 1
    assert "|||PHONE_NUMBER|||" in r.redacted and "2025550142" in r.redacted


def test_pii_counts_on_original_text_not_cascaded(spark):
    # counts are measured on the ORIGINAL text (the phone-shaped local part
    # counts as both), but redaction is ordered: email masks first, so the
    # phone pattern never sees those digits
    r = _redact_one(spark, "doc 202-555-0142@example.com")
    assert (r.n_emails, r.n_phones) == (1, 1)
    assert r.redacted == "doc |||EMAIL_ADDRESS|||"


def test_url_filters_suffix_dot_boundary(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://evil.casino.test/page"),       # blocked (suffix)
            (2, "https://casino.test/page"),            # blocked (exact)
            (3, "https://notcasino.test/page"),         # NOT blocked
            (4, "https://ok.test/phishing-kit.html"),   # badword
            (5, "https://ok.test/theme/app.css"),       # non_content
            (6, "https://ok.test/article/42?x=.js"),    # query doesn't count as ext
            (7, "https://ok.test/a"),                   # clean
        ],
        "id long, url string",
    )
    out = {r.id: r.url_drop_reason for r in curation.url_filters(urls).collect()}
    assert out == {
        1: "blocked_domain",
        2: "blocked_domain",
        3: None,
        4: "badword",
        5: "non_content",
        6: None,
        7: None,
    }


def test_url_filters_custom_lists_and_chain_order(spark):
    urls = spark.createDataFrame(
        [(1, "https://bad.example/phishing/app.js")], "id long, url string"
    )
    # domain rule fires first even though badword and ext would also match
    r = curation.url_filters(urls, blocked_suffixes=[".example"]).collect()[0]
    assert r.url_drop_reason == "blocked_domain"
    r2 = curation.url_filters(urls, blocked_suffixes=[]).collect()[0]
    assert r2.url_drop_reason == "badword"
    r3 = curation.url_filters(urls, blocked_suffixes=[], badwords=[]).collect()[0]
    assert r3.url_drop_reason == "non_content"
    r4 = curation.url_filters(
        urls, blocked_suffixes=[], badwords=[], non_content_exts=[]
    ).collect()[0]
    assert r4.url_drop_reason is None and r4.url_ok


def test_temperature_mixture_rates(spark):
    import math

    from spider_spark.operators import curation as cu

    rows = (
        [(i, "web", 100) for i in range(40)]       # 4000 tokens
        + [(100 + i, "code", 100) for i in range(9)]  # 900 tokens
        + [(200, "tail", 100)]                      # 100 tokens
        + [(300, "empty", 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        r["source"]: r
        for r in cu.temperature_mixture_rates(
            df, alpha=0.5, budget_tokens=3000, max_epochs=2.0
        ).collect()
    }
    avail = {"web": 4000, "code": 900, "tail": 100, "empty": 0}
    tw = sum(v**0.5 for v in avail.values() if v > 0)
    for s, a in avail.items():
        w = a**0.5 if a > 0 else 0.0
        share = w / tw
        target = share * 3000
        raw = target / a if a > 0 else 0.0
        assert got[s]["tokens_available"] == a
        assert got[s]["share_r"] == round(share, 6)
        assert got[s]["target_tokens"] == round(target, 2)
        assert got[s]["capped"] == (raw > 2.0)
        assert got[s]["sample_rate"] == round(min(raw, 2.0), 6)
    # alpha=0.5 lifts the tail: its rate far exceeds its natural share
    assert got["tail"]["sample_rate"] > got["web"]["sample_rate"]
    # the scarce tail source is upsample-capped at max_epochs
    assert got["tail"]["capped"] and got["tail"]["sample_rate"] == 2.0
    # alpha=1 reproduces natural proportions: equal rates everywhere
    nat = {
        r["source"]: r["sample_rate"]
        for r in cu.temperature_mixture_rates(
            df, alpha=1.0, budget_tokens=2000
        ).collect()
    }
    assert len({nat[s] for s in ("web", "code", "tail")}) == 1

    with pytest.raises(ValueError):
        cu.temperature_mixture_rates(df, alpha=-1, budget_tokens=10)


def test_luhn_and_credit_card_signals(spark):
    from spider_spark.operators import curation as cu

    # classic test PANs: 4532015112830366 (valid Visa test), off-by-one
    # sibling invalid; grouped form; 13-digit valid (4222222222222)
    rows = [
        (0, "pay 4532015112830366 now"),
        (1, "pay 4532015112830367 now"),          # fails Luhn
        (2, "card 4532-0151-1283-0366 on file"),
        (3, "call 555-123-4567 ok"),              # phone, not a candidate
        (4, "num 4222222222222 short-form"),
        (5, None),
        (6, "ts 20240101123045998877 too long"),  # 20 digits: no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_cc_candidates"], r["n_cc_valid"])
        for r in cu.credit_card_signals(df).collect()
    }
    assert got[0] == (1, 1)
    assert got[1] == (1, 0)
    assert got[2] == (1, 1)
    assert got[3] == (0, 0)
    assert got[4] == (1, 1)
    assert got[5] == (0, 0)
    assert got[6] == (0, 0)

    red = {
        r["doc_id"]: r["text"]
        for r in cu.redact_credit_cards(df).collect()
    }
    assert red[0] == "pay |||CREDIT_CARD||| now"
    assert red[2] == "card |||CREDIT_CARD||| on file"
    assert red[1] == "pay |||CREDIT_CARD||| now"  # conservative: masked too
    assert red[3] == "call 555-123-4567 ok"

    # pure-Python Luhn differential over random digit strings
    import random as _r

    rng = _r.Random(3)

    def luhn(ds):
        tot = 0
        for i, ch in enumerate(reversed(ds), 1):
            d = int(ch)
            tot += d if i % 2 == 1 else (d * 2 - 9 if d * 2 > 9 else d * 2)
        return tot % 10 == 0

    samples = ["".join(str(rng.randrange(10)) for _ in range(16)) for _ in range(40)]
    sdf = spark.createDataFrame([(s,) for s in samples], "d string")
    from pyspark.sql import functions as _F

    got_l = {
        r["d"]: r["ok"]
        for r in sdf.select("d", cu.col_luhn_valid(_F.col("d")).alias("ok")).collect()
    }
    assert got_l == {s: luhn(s) for s in samples}


# ---- fuzzy (MinHash) decontamination -----------------------------------


def _fz_corpus(spark):
    body = "the quick brown fox jumps over the lazy dog again and again today"
    return spark.createDataFrame(
        [
            (100, body),                                   # contaminated: verbatim
            (200, body.replace("today", "tomorrow")),      # near-dup variant
            (300, "completely unrelated text about spark shuffles and joins ok"),
        ],
        "doc_id long, text string",
    )


def _fz_benchmark(spark):
    body = "the quick brown fox jumps over the lazy dog again and again today"
    return spark.createDataFrame(
        [(7, body), (8, body + " extra")],  # two near-dup benchmark docs
        "doc_id long, text string",
    )


def test_fuzzy_decontaminate_finds_near_and_exact(spark):
    out = curation.fuzzy_decontaminate(
        _fz_corpus(spark), _fz_benchmark(spark), jaccard_threshold=0.5
    ).collect()
    got = {(r["doc_id"], r["benchmark_id"]): r["est_jaccard"] for r in out}
    # verbatim copy estimated at exactly 1.0 against benchmark doc 7
    assert got.get((100, 7)) == pytest.approx(1.0)
    # the near-dup variant is caught too
    assert (200, 7) in got or (200, 8) in got
    # the unrelated doc never appears
    assert all(d != 300 for d, _ in got)
    # benchmark-internal similarity (7 vs 8) is NOT contamination
    assert all(d in (100, 200) for d, _ in got)
    assert all(b in (7, 8) for _, b in got)


def test_fuzzy_decontaminate_keyspaces_cannot_collide(spark):
    # corpus and benchmark SHARE raw ids — the keyspace tagging must keep
    # them apart and decode back to the original ids on both columns
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame([(5, body)], "doc_id long, text string")
    bench = spark.createDataFrame([(5, body)], "doc_id long, text string")
    out = curation.fuzzy_decontaminate(docs, bench, jaccard_threshold=0.5).collect()
    assert len(out) == 1
    assert (out[0]["doc_id"], out[0]["benchmark_id"]) == (5, 5)
    assert out[0]["est_jaccard"] == pytest.approx(1.0)


def test_fuzzy_decontaminate_string_and_mixed_id_types(spark):
    """ADVICE r04: url/string-keyed corpora must work — the keyspace tag
    is type-agnostic and each output column keeps its own side's type."""
    body = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            ("https://a.example/page", body),
            ("https://b.example/other", "completely unrelated text about joins"),
        ],
        "doc_id string, text string",
    )
    # benchmark keeps LONG ids — mixed types across the two sides
    bench = spark.createDataFrame([(7, body)], "doc_id long, text string")
    out = curation.fuzzy_decontaminate(docs, bench, jaccard_threshold=0.5)
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["benchmark_id"] == "bigint"
    rows = out.collect()
    assert {(r["doc_id"], r["benchmark_id"]) for r in rows} == {
        ("https://a.example/page", 7)
    }
    assert rows[0]["est_jaccard"] == pytest.approx(1.0)


def test_fuzzy_decontaminate_threshold_screens(spark):
    out = curation.fuzzy_decontaminate(
        _fz_corpus(spark), _fz_benchmark(spark), jaccard_threshold=0.999
    ).collect()
    # only the verbatim copy survives a ~exact threshold
    assert {(r["doc_id"], r["benchmark_id"]) for r in out} == {(100, 7)}
