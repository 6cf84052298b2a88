"""Content-defined chunking (operators/chunking.py).

Key properties: the vectorized chunker equals a naive per-byte reference;
chunks tile the input exactly within the size clamps; boundaries
resynchronize after an insertion (the reason CDC exists) while fixed-size
chunking does not; the census arithmetic matches brute force.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators import chunking as ck

P = 0x9E3779B97F4A7C15
W = 16
M64 = (1 << 64) - 1


def ref_boundaries(data: bytes, mask_bits=6, min_size=32, max_size=1024):
    """Naive O(n·w) restatement of the boundary rule: per position, hash
    the 16-byte window with the frozen polynomial, cut on masked zero,
    honoring the min/max clamps."""
    n = len(data)
    if n == 0:
        return []
    if n <= W:
        return [n]
    cands = []
    for end in range(W, n):  # end offset (exclusive) of a full window
        h = 0
        for j in range(W):
            h = (h + data[end - W + j] * pow(P, W - 1 - j, 1 << 64)) & M64
        if h & ((1 << mask_bits) - 1) == 0:
            cands.append(end)
    ends, prev, ci = [], 0, 0
    while prev < n:
        while ci < len(cands) and cands[ci] < prev + min_size:
            ci += 1
        if ci < len(cands) and cands[ci] < n and cands[ci] <= prev + max_size:
            prev = cands[ci]
            ci += 1
        elif n - prev > max_size:
            prev += max_size
        else:
            prev = n
        ends.append(prev)
    return ends


def _payload(seed: bytes, n: int) -> bytes:
    out = bytearray()
    h = seed
    while len(out) < n:
        h = hashlib.sha256(h).digest()
        out.extend(h)
    return bytes(out[:n])


def test_boundaries_match_naive_reference():
    for seed, n in [(b"a", 300), (b"b", 2048), (b"c", 5000)]:
        data = _payload(seed, n)
        got = ck.cdc_boundaries(data, mask_bits=5, min_size=16, max_size=200)
        want = ref_boundaries(data, mask_bits=5, min_size=16, max_size=200)
        assert got == want, (seed, n)


def test_chunks_tile_input_and_respect_clamps():
    data = _payload(b"tile", 4096)
    chunks = ck.cdc_chunks(data, mask_bits=5, min_size=16, max_size=200)
    assert chunks[0][0] == 0
    pos = 0
    for off, ln, h in chunks:
        assert off == pos
        assert 1 <= ln <= 200
        assert h == hashlib.md5(data[off : off + ln]).hexdigest()
        pos = off + ln
    assert pos == len(data)
    # every chunk except the last honors the min clamp
    assert all(ln >= 16 for _, ln, _ in chunks[:-1])


def test_edge_sizes():
    assert ck.cdc_boundaries(b"") == []
    assert ck.cdc_boundaries(b"x" * 10) == [10]  # <= window: one chunk
    assert ck.cdc_chunks(b"x" * 10)[0][1] == 10
    with pytest.raises(ValueError):
        ck.cdc_boundaries(b"abc", min_size=10, max_size=10)


def test_insertion_resynchronizes_cdc_but_not_fixed():
    data = _payload(b"resync", 6000)
    shifted = b"INSERTED" + data
    kw = dict(mask_bits=5, min_size=16, max_size=200)
    h0 = {h for _, _, h in ck.cdc_chunks(data, **kw)}
    h1 = {h for _, _, h in ck.cdc_chunks(shifted, **kw)}
    shared = len(h0 & h1) / len(h0)
    assert shared >= 0.6, shared  # most chunks survive the shift
    # fixed-size chunking loses (almost) everything under the same shift
    fixed0 = {
        hashlib.md5(data[i : i + 64]).hexdigest() for i in range(0, len(data), 64)
    }
    fixed1 = {
        hashlib.md5(shifted[i : i + 64]).hexdigest()
        for i in range(0, len(shifted), 64)
    }
    assert len(fixed0 & fixed1) / len(fixed0) < 0.05


def test_chunk_table_and_census(spark):
    a = _payload(b"doc-a", 3000)
    b = a[:1500] + b"EDITED-IN-THE-MIDDLE" + a[1500:]  # near-dup of a
    c = _payload(b"doc-c", 1000)  # unrelated
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4], "content": [a, b, c, None]})
    df = spark.createDataFrame(pdf).repartition(3)
    kw = dict(mask_bits=5, min_size=16, max_size=200)
    chunks = ck.chunk_table(df, "content", "doc_id", **kw)
    rows = chunks.collect()
    # matches the local chunker per doc; null doc contributes nothing
    for doc_id, payload in [(1, a), (2, b), (3, c)]:
        got = sorted(
            (r["chunk_idx"], r["offset"], r["length"], r["chunk_hash"])
            for r in rows
            if r["doc_id"] == doc_id
        )
        want = [
            (i, off, ln, h)
            for i, (off, ln, h) in enumerate(ck.cdc_chunks(payload, **kw))
        ]
        assert got == want, doc_id
    assert not [r for r in rows if r["doc_id"] == 4]
    # census equals brute force over the local chunk lists
    allc = [ch for p in (a, b, c) for ch in ck.cdc_chunks(p, **kw)]
    by_hash = {}
    for _, ln, h in allc:
        by_hash.setdefault(h, []).append(ln)
    stats = ck.chunk_dedup_stats(chunks).collect()[0]
    assert stats["total_chunks"] == len(allc)
    assert stats["distinct_chunks"] == len(by_hash)
    assert stats["total_bytes"] == sum(ln for _, ln, _ in allc)
    assert stats["distinct_bytes"] == sum(lns[0] for lns in by_hash.values())
    # the near-dup pair must make dedup pay: distinct < total
    assert stats["distinct_bytes"] < stats["total_bytes"]
    assert 0 < stats["dedup_ratio_r"] < 1


def test_fixed_chunk_stats_bruteforce(spark):
    texts = ["alpha beta gamma " * 20, "alpha beta gamma " * 20, "zq " * 5, ""]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "text": texts})
    )
    got = ck.fixed_chunk_stats(df, "text", chunk_chars=64).collect()[0]
    allc = []
    for t in texts:
        for i in range(0, len(t), 64):
            allc.append(t[i : i + 64])
    assert got["total_chunks"] == len(allc)
    assert got["distinct_chunks"] == len(set(allc))
    assert got["total_chars"] == sum(len(c) for c in allc)
    assert got["distinct_chars"] == sum(len(c) for c in set(allc))
    with pytest.raises(ValueError):
        ck.fixed_chunk_stats(df, "text", chunk_chars=0)


def test_capture_delta_small_edit_small_delta(spark):
    base = _payload(b"page", 4000)
    edited = base[:2000] + b"NEW-AD-BLOCK-INSERTED" + base[2000:]
    rewritten = _payload(b"other", 4000)
    prev = spark.createDataFrame(
        pd.DataFrame({"url": ["a", "b", "gone"], "content": [base, base, base]})
    )
    curr = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["a", "b", "new"], "content": [edited, rewritten, base]}
        )
    )
    kw = dict(mask_bits=5, min_size=16, max_size=200)
    got = {
        r["url"]: r
        for r in ck.capture_delta_stats(prev, curr, **kw).collect()
    }
    # small edit → most bytes shared
    assert got["a"]["changed_frac_r"] < 0.3
    assert got["a"]["shared_bytes"] > 3000
    # full rewrite → (almost) nothing shared
    assert got["b"]["changed_frac_r"] > 0.95
    # one-sided URLs are all-change with the other side at 0
    assert got["gone"]["curr_bytes"] == 0 and got["gone"]["changed_frac_r"] == 1.0
    assert got["new"]["prev_bytes"] == 0 and got["new"]["changed_frac_r"] == 1.0
    # byte accounting: prev/curr byte totals equal payload lengths
    assert got["a"]["prev_bytes"] == len(base)
    assert got["a"]["curr_bytes"] == len(edited)


def test_capture_delta_identical_is_zero(spark):
    p = _payload(b"same", 1500)
    prev = spark.createDataFrame(pd.DataFrame({"url": ["x"], "content": [p]}))
    got = ck.capture_delta_stats(prev, prev).collect()[0]
    assert got["changed_frac_r"] == 0.0
    assert got["shared_bytes"] == got["prev_bytes"] == got["curr_bytes"]


def test_fixed_capture_delta_bruteforce(spark):
    prev = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["aaaa" * 40, "bbbb" * 40]}
        )
    )
    curr = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["aaaa" * 40, "cccc" * 40]}
        )
    )
    got = {
        r["doc_id"]: r
        for r in ck.fixed_capture_delta(prev, curr, chunk_chars=64).collect()
    }
    assert got[1]["changed_frac_r"] == 0.0  # identical
    assert got[2]["changed_frac_r"] == 1.0  # disjoint
    assert got[1]["shared_chars"] == 160
    with pytest.raises(ValueError):
        ck.fixed_capture_delta(prev, curr, chunk_chars=0)
