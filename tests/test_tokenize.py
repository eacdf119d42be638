"""Distributed BPE training and encoding (operators/tokenize.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.operators.tokenize import (SEP, bpe_apply_merges_col,
                                              bpe_encode, bpe_train,
                                              encode_word, pre_tokens_py,
                                              word_counts)

CORPUS = [("u1", "the thin thing then"),
          ("u2", "the other brother, the!"),
          ("u3", "thermal the the the")]

# hand-traced merges for CORPUS (word counts: the*6, thin, thing,
# then, other, brother, thermal, ',', '!'):
#   (t,h)=12  (th,e)=10  (the,r)=3  then 2-count ties resolved
#   lexicographically: (i,n) < (o,ther) < (th,in)
EXPECTED = [(0, "t", "h", 12), (1, "th", "e", 10), (2, "the", "r", 3),
            (3, "i", "n", 2), (4, "o", "ther", 2), (5, "th", "in", 2)]


def replace_mirror(word: str, merges) -> list[str]:
    """Independent mirror of the column twin: literal str.replace
    over the SEP-delimited symbol string (Python's replace is also
    leftmost non-overlapping)."""
    s = SEP + (SEP + SEP).join(list(word)) + SEP
    for m in merges:
        left, right = (m[1], m[2]) if len(m) == 4 else (m[0], m[1])
        s = s.replace(SEP + left + SEP + SEP + right + SEP,
                      SEP + left + right + SEP)
    return s.strip(SEP).split(SEP + SEP) if word else []


def test_bpe_train_hand_traced_with_ties(spark):
    docs = spark.createDataFrame(CORPUS, "url string, text string")
    assert bpe_train(docs, 6, min_pair_freq=2) == EXPECTED
    # deterministic replay
    assert bpe_train(docs, 6, min_pair_freq=2) == EXPECTED
    # accepts a prebuilt (word, wcount) table identically
    assert bpe_train(word_counts(docs), 3, min_pair_freq=2) \
        == EXPECTED[:3]


def test_bpe_train_driver_equals_distributed(spark):
    """The driver fast path (collect + incremental in-memory loop)
    and the distributed per-merge loop are the same algorithm: equal
    merge lists on corpora exercising ties, overlapping pairs
    (aaaa), early stops, and multi-round chains."""
    import random
    rng = random.Random(20260821)
    vocab = ["the", "then", "aaaa", "aab", "brother", "xy", "x", "!",
             "thin", "other", "in", "banana", "ananas", "bb", "ab"]
    for trial in range(6):
        n_docs = rng.randint(1, 8)
        docs = spark.createDataFrame(
            [(f"u{i}",
              " ".join(rng.choices(vocab, k=rng.randint(1, 30))))
             for i in range(n_docs)],
            "url string, text string")
        for n_merges, floor in ((5, 2), (12, 1), (3, 3)):
            fast = bpe_train(docs, n_merges, min_pair_freq=floor)
            slow = bpe_train(docs, n_merges, min_pair_freq=floor,
                             driver_threshold=0)
            assert fast == slow, (trial, n_merges, floor)


def test_bpe_train_min_freq_stops_early(spark):
    docs = spark.createDataFrame(
        [("u", "ab cd ef gh")], "url string, text string")
    # every pair is a hapax: no merge clears min_pair_freq=2
    assert bpe_train(docs, 5, min_pair_freq=2) == []
    # with the floor lowered, merges happen and are deterministic
    got = bpe_train(docs, 2, min_pair_freq=1)
    assert got == [(0, "a", "b", 1), (1, "c", "d", 1)]


@given(st.text(alphabet="theinorb", min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_encode_word_equals_replace_mirror(word):
    # the greedy fold and the delimiter-replace chain are the same
    # algorithm — on every word, under the hand-traced merge table
    assert encode_word(word, EXPECTED) == replace_mirror(word, EXPECTED)


def test_encode_word_rank_order_is_exact():
    # 'thermal': t+h → th, th+e → the, the+r → ther; later rules
    # never resurrect earlier pairs
    assert encode_word("thermal", EXPECTED) == ["ther", "m", "a", "l"]
    assert encode_word("thethe", EXPECTED) == ["the", "the"]
    # repeated-symbol merge is greedy leftmost, non-overlapping
    assert encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert encode_word("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_column_twin_matches_python_twin(spark):
    from pyspark.sql import functions as F
    words = ["the", "thermal", "brother", "aaaa", "x", "thethe",
             "ththth", "otherother"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select(
        "w", bpe_apply_merges_col(F.col("w"), EXPECTED).alias("t")
    ).collect()
    for r in rows:
        assert r["t"] == encode_word(r["w"], EXPECTED), r["w"]
    # pure codegen: no UDF/python eval in the plan
    plan = df.select(bpe_apply_merges_col(F.col("w"), EXPECTED)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bpe_encode_spark_and_compression(spark):
    docs = spark.createDataFrame(CORPUS, "url string, text string")
    merges = EXPECTED
    out = {r["url"]: r for r in bpe_encode(docs, merges).collect()}
    for url, text in CORPUS:
        expected = []
        for w in pre_tokens_py(text):
            expected.extend(encode_word(w, merges))
        assert out[url]["tokens"] == expected
        assert out[url]["n_tokens"] == len(expected)
    # more merges never increase token count (compression monotone)
    n_none = {r["url"]: r["n_tokens"]
              for r in bpe_encode(docs, []).collect()}
    for url in out:
        assert out[url]["n_tokens"] <= n_none[url]
    # embarrassingly parallel: no Exchange in the encode plan
    plan = bpe_encode(docs, merges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pre_tokens_portable_semantics():
    assert pre_tokens_py("The thin-thing! x2") == \
        ["the", "thin", "-", "thing", "!", "x", "2"]
    # non-ASCII letters degrade to single punct-class tokens (the
    # documented engine-portable contract), never crash
    assert pre_tokens_py("héj") == ["h", "é", "j"]
    assert pre_tokens_py(None) == []


def test_bpe_train_rejects_bad_args(spark):
    docs = spark.createDataFrame(CORPUS, "url string, text string")
    with pytest.raises(ValueError):
        bpe_train(docs, 0)
