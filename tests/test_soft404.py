"""Soft-404 detection (textqc.soft404_flags): phrase catalogue, head
window, status gating, tiny-page audit column."""

from __future__ import annotations

import pytest

from spider_spark.operators import textqc


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, status int, text string")
    out = textqc.soft404_flags(df)
    return {r.doc_id: r for r in out.collect()}


def test_planted_phrases_caught_only_at_200(spark):
    got = _flags(
        spark,
        [
            (1, 200, "Oops! Page Not Found. Try the homepage."),
            (2, 404, "Oops! Page Not Found. Try the homepage."),
            (3, 200, "ERROR 404 - nothing here"),
            (4, 200, "perfectly fine article about the 1404 siege of somewhere"),
        ],
    )
    assert got[1].soft404 is True
    assert got[2].soft404 is False and got[2].s404_phrase is True
    assert got[3].soft404 is True
    # \b keeps '1404' from matching 'error 404'/'http 404' phrases
    assert got[4].soft404 is False


def test_phrase_deep_in_body_is_not_a_verdict(spark):
    filler = "word " * 120  # ~600 chars, pushes the phrase past head
    got = _flags(
        spark,
        [
            (1, 200, filler + " the server said page not found"),
            (2, 200, "page not found " + filler),
        ],
    )
    assert got[1].soft404 is False
    assert got[2].soft404 is True


def test_tiny_audit_column_and_null_text(spark):
    got = _flags(
        spark,
        [
            (1, 200, "short"),
            (2, 200, "w " * 50),
            (3, 200, None),
            (4, 503, "x"),
        ],
    )
    assert got[1].suspect_tiny is True and got[1].soft404 is False
    assert got[2].suspect_tiny is False
    assert got[3].suspect_tiny is True and got[3].soft404 is False
    assert got[4].suspect_tiny is False  # not a 200


def test_case_insensitive(spark):
    got = _flags(spark, [(1, 200, "PAGE NOT FOUND"), (2, 200, "No Longer Available")])
    assert got[1].soft404 is True and got[2].soft404 is True


def test_parked_domain_flags(spark):
    from spider_spark.operators.textqc import parked_domain_flags

    rows = [
        (0, "This domain is for sale. Contact the broker."),
        (1, "Domain parked free courtesy of registrar related searches"),
        (2, "An article about how domain parking works " + "word " * 100),
        (3, "tiny legit landing page"),
        (4, None),
        (5, "Interested in this domain? Renew this domain today"),
        (6, "THIS DOMAIN MAY BE FOR SALE"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["parked_phrase"], r["suspect_tiny"], r["parked"])
        for r in parked_domain_flags(df).collect()
    }
    assert got[0] == (True, True, True)
    assert got[1] == (True, True, True)
    assert got[2] == (True, False, False)   # long article quoting the phrase
    assert got[3] == (False, True, False)   # tiny but no phrase
    assert got[4] == (False, True, False)   # null text
    assert got[5] == (True, True, True)
    assert got[6] == (True, True, True)     # case-insensitive
