"""Byte-level (GPT-2-style) BPE vs a pure-Python reference.

Public knowledge under test: the GPT-2 split regex, the byte→unicode
remap, and rank-greedy byte-level encoding (Radford et al. 2019; the
openai/gpt-2 encoder is public). No training iteration is SQL-expressible,
so — like word-level BPE — correctness is pinned by an exact differential
against an independent scalar implementation; the deterministic
oracle-backed query (`gpt2_bpe_encode_fixed`) covers the encode path in
the driver gate."""

from __future__ import annotations

from collections import Counter

import pytest

from spider_spark.operators import bpe


# --- pure-Python reference ---------------------------------------------------


def ref_pretokens(text):
    import regex

    return regex.findall(bpe.GPT2_SPLIT_PATTERN, text or "")


def ref_mapped(tok, byte_map):
    return "".join(byte_map[b] for b in tok.encode("utf-8"))


def ref_census(texts):
    byte_map = bpe.gpt2_bytes_to_unicode()
    counts = Counter()
    for t in texts:
        for tok in ref_pretokens(t):
            counts[ref_mapped(tok, byte_map)] += 1
    return {w: (list(w), c) for w, c in counts.items()}


def ref_pair_counts(census):
    pairs = Counter()
    for syms, c in census.values():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    return pairs


def ref_train(texts, num_merges):
    census = ref_census(texts)
    merges = []
    for _ in range(num_merges):
        pairs = ref_pair_counts(census)
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        out = {}
        for w, (syms, c) in census.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[w] = (res, c)
        census = out
    return merges


def ref_encode(text, merges):
    byte_map = bpe.gpt2_bytes_to_unicode()
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    total = 0
    for tok in ref_pretokens(text):
        syms = list(ref_mapped(tok, byte_map))
        while len(syms) >= 2:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        total += len(syms)
    return total


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "I'm sure they're lower than the newest estimate.",
    "Hello  world — naïve café au lait, price 42€!",
    "don't stop; we'll see 1234 and 99 red balloons",
    "low lower lowest lowly low-key",
    "tabs\tand\nnewlines   spaced out   ",
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_bytes_to_unicode_is_the_public_mapping():
    m = bpe.gpt2_bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # bijective
    # the 188 printable/latin bytes map to themselves
    for b in range(ord("!"), ord("~") + 1):
        assert m[b] == chr(b)
    # published landmark values: space → Ġ, newline → Ċ, tab → ĉ
    assert m[0x20] == "Ġ"
    assert m[0x0A] == "Ċ"
    assert m[0x09] == "ĉ"


def test_pretokenizer_published_semantics():
    """Documented behaviors of the GPT-2 split regex (public)."""
    cases = {
        "Hello world": ["Hello", " world"],
        "I'm happy": ["I", "'m", " happy"],
        # the \s+(?!\S) backtracking: a mid-text run yields all but its
        # last space; the last space glues to the next token
        "Hello  world": ["Hello", " ", " world"],
        "a   b": ["a", "  ", " b"],
        "abc123 def!": ["abc", "123", " def", "!"],
        "hi  ": ["hi", "  "],  # trailing run taken whole
        "don't": ["don", "'t"],
        "x 42": ["x", " 42"],
        "we'll они're": ["we", "'ll", " они", "'re"],  # \p{L} is unicode
    }
    for text, want in cases.items():
        got = bpe.gpt2_pretokenize(text)
        assert got == want, (text, got)
        assert "".join(got) == text  # pre-tokenization is lossless


def test_census_matches_reference(spark, docs):
    got = {
        r.word: (list(r.syms), r["count"])
        for r in bpe.gpt2_pretoken_census(docs).collect()
    }
    assert got == ref_census(CORPUS)


def test_train_bpe_bytes_matches_reference(spark, docs):
    got = bpe.train_bpe_bytes(docs, num_merges=20, checkpoint_every=4)
    want = ref_train(CORPUS, 20)
    assert got == want
    assert len(got) >= 10


def test_encode_gpt2_matches_reference(spark, docs):
    merges = bpe.train_bpe_bytes(docs, num_merges=15)
    enc = {r.id: r for r in bpe.encode_gpt2(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        assert enc[i].n_tokens == ref_encode(t, merges), t
        assert enc[i].n_pretoks == len(ref_pretokens(t))
    # with NO merges every token is its byte count
    raw = {r.id: r for r in bpe.encode_gpt2(docs, []).collect()}
    for i, t in enumerate(CORPUS):
        assert raw[i].n_tokens == len(t.encode("utf-8"))


def test_multibyte_utf8_is_byte_level(spark):
    # '€' is 3 UTF-8 bytes, 'é' is 2 — unmerged token counts see BYTES
    docs = spark.createDataFrame([(0, "€ é")], ["doc_id", "text"])
    r = bpe.encode_gpt2(docs, []).collect()[0]
    assert r.n_pretoks == 2
    assert r.n_tokens == 3 + (1 + 2)  # '€' + ' é'


def test_parallelism_invariance(spark, docs):
    got1 = bpe.train_bpe_bytes(docs.repartition(1), num_merges=10)
    got8 = bpe.train_bpe_bytes(docs.repartition(8), num_merges=10)
    assert got1 == got8


def test_rank_greedy_equals_sequential_for_fixed_table(spark):
    """The equivalence the gpt2_bpe_encode_fixed oracle rests on: for the
    well-formed literal table, rank-greedy encoding equals sequential
    replay of the merges in rank order — checked over the real sf0.001
    documents vocabulary."""
    from __spark_entry__ import GPT2_FIXED_MERGES

    byte_map = bpe.gpt2_bytes_to_unicode()
    ranks = {m: i for i, m in enumerate(GPT2_FIXED_MERGES)}

    def sequential(mapped):
        syms = list(mapped)
        for ml, mr in GPT2_FIXED_MERGES:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == ml and syms[i + 1] == mr:
                    res.append(ml + mr)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    def greedy(mapped):
        syms = list(mapped)
        while len(syms) >= 2:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = {
        ref_mapped(tok, byte_map)
        for (t,) in docs.select("text").collect()
        for tok in ref_pretokens(t)
    }
    assert vocab  # the corpus genuinely exercises the table
    for w in vocab:
        assert sequential(w) == greedy(w), w
