"""Property-based tests (hypothesis) over the pure-numpy seen-filter
internals and pure-python key canonicalization — the invariants that must
hold for EVERY input, not just the fixtures:

- bloom: no false negatives, shard-merge is bitwise-or monotone
- cuckoo: alt-bucket involution; insert→contains total recall (overflow
  included); numpy-level delete removes exactly one occurrence
- stable_stringify: key-order invariance (the cache-key contract)

No SparkSession needed — these run in milliseconds and fuzz the layers
under the DataFrame operators (which the existing pytest + oracle rows
already pin at the plan level)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_spark import bloom, cuckoo
from spider_spark.textops import stable_stringify

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(i64, min_size=0, max_size=500))
def test_bloom_no_false_negatives(hashes):
    num_bits, k = 1 << 14, 5
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    arr = np.asarray(hashes, dtype=np.int64)
    pos = bloom._positions(arr, num_bits, k)
    np.bitwise_or.at(
        bits, pos.ravel() >> 3, np.uint8(1) << (pos.ravel() & 7).astype(np.uint8)
    )
    probe = bloom._positions(arr, num_bits, k)
    got = np.ones(len(arr), dtype=bool)
    for row in probe:
        got &= (bits[row >> 3] & (np.uint8(1) << (row & 7).astype(np.uint8))) != 0
    assert got.all()


@settings(max_examples=60, deadline=None)
@given(st.lists(i64, min_size=1, max_size=200))
def test_cuckoo_alt_bucket_involution(hashes):
    buckets = 1 << 10
    fp, b1 = cuckoo._fp_b1(np.asarray(hashes, dtype=np.int64), buckets)
    b2 = cuckoo._alt_bucket(b1, fp, buckets)
    assert (cuckoo._alt_bucket(b2, fp, buckets) == b1).all()
    assert (fp != 0).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(i64, min_size=0, max_size=400, unique=True))
def test_cuckoo_insert_then_contains_is_total(hashes):
    buckets, slots = 1 << 9, 4  # capacity 2048 ≥ 400 with headroom
    table = np.zeros((buckets, slots), dtype=np.uint16)
    arr = np.asarray(hashes, dtype=np.int64)
    fp, b1 = cuckoo._fp_b1(arr, buckets)
    overflow = np.asarray(
        cuckoo._bulk_insert(table, fp, b1, max_kicks=100), dtype=np.uint64
    )
    assert cuckoo._contains(table, overflow, fp, b1).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(i64, min_size=1, max_size=200, unique=True))
def test_cuckoo_delete_one_occurrence(hashes):
    """Insert every key once, delete every key once → the filter must not
    report any deleted key UNLESS another live key shares its
    (fingerprint, bucket-pair) identity — the documented cuckoo delete
    contract. Deleting ALL keys must always empty the filter."""
    buckets, slots = 1 << 9, 4
    table = np.zeros((buckets, slots), dtype=np.uint16)
    arr = np.asarray(hashes, dtype=np.int64)
    fp, b1 = cuckoo._fp_b1(arr, buckets)
    ovf = list(
        np.asarray(cuckoo._bulk_insert(table, fp, b1, max_kicks=100), dtype=np.uint64)
    )
    b2 = cuckoo._alt_bucket(b1, fp, buckets)
    keys = cuckoo._canon_key(b1, fp, buckets)
    for i in range(len(arr)):
        for b in (b1[i], b2[i]):
            s = np.nonzero(table[b] == fp[i])[0]
            if len(s):
                table[b, s[0]] = 0
                break
        else:
            if keys[i] in ovf:
                ovf.remove(keys[i])
    assert not table.any()
    assert not ovf


@st.composite
def json_values(draw, depth=2):
    scalars = st.one_of(
        st.none(), st.booleans(), st.integers(-1000, 1000),
        st.text(max_size=8),
    )
    if depth == 0:
        return draw(scalars)
    return draw(
        st.one_of(
            scalars,
            st.lists(json_values(depth=depth - 1), max_size=4),
            st.dictionaries(
                st.text(max_size=6), json_values(depth=depth - 1), max_size=4
            ),
        )
    )


@settings(max_examples=80, deadline=None)
@given(st.dictionaries(st.text(max_size=6), json_values(), max_size=6))
def test_stable_stringify_key_order_invariance(d):
    """The cache-key contract: two dicts equal as mappings stringify
    identically regardless of insertion order (createCacheKey's
    stableStringify, cache.ts) — including nested dicts."""
    import random

    items = list(d.items())
    random.Random(42).shuffle(items)
    shuffled = dict(items)
    assert stable_stringify(d) == stable_stringify(shuffled)
