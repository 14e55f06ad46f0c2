"""bpe_encode_words / bpe_token_count (round 13) vs a python fold.

The encode half of the tokenizer pair: word TYPES encode once under
the trained merge table with the exact left-to-right non-overlapping
fold training used; per-doc counts come from an exploded-word join.
"""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.text import (
    bpe_encode_words, bpe_token_count, bpe_train)


def _py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_encode(word, merges):
    syms = list(word)
    for m in merges:
        syms = _py_merge(syms, m[1], m[2])
    return syms


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the theme there is that"),
    (2, "aaaa aaa banana bandana"),
    (3, "thethethe"),
    (4, ""),
]


class TestBpeEncode:
    def test_words_match_python_fold(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=6,
                           max_word_types=None, min_pair_count=1)
        assert merges
        got = {r["word"]: (list(r["tokens"]), r["n_tokens"]) for r in
               bpe_encode_words(df, "text", merges).collect()}
        words = {w for _, t in CORPUS for w in t.split(" ") if w}
        assert set(got) == words
        for w in words:
            exp = _py_encode(w, merges)
            assert got[w][0] == exp, w
            assert got[w][1] == len(exp)

    def test_overlap_fold_semantics(self, spark):
        """'aaaa' under merge (a,a) -> [aa, aa]; 'aaa' -> [aa, a]
        (left-to-right non-overlapping, the training fold)."""
        df = spark.createDataFrame([(0, "aaaa aaa")],
                                   "doc_id long, text string")
        got = {r["word"]: list(r["tokens"]) for r in
               bpe_encode_words(df, "text",
                                [(1, "a", "a", "aa", 9)]).collect()}
        assert got["aaaa"] == ["aa", "aa"]
        assert got["aaa"] == ["aa", "a"]

    def test_token_count_per_doc(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=4,
                           max_word_types=None, min_pair_count=1)
        got = {r["doc_id"]: r["n_tokens_bpe"] for r in
               bpe_token_count(df, "text", merges,
                               "doc_id").collect()}
        for doc_id, text in CORPUS:
            exp = sum(len(_py_encode(w, merges))
                      for w in text.split(" ") if w)
            assert got[doc_id] == exp, doc_id
        assert got[4] == 0   # empty doc present with 0

    def test_checkpoint_cadence_identical(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges = bpe_train(df, "text", n_merges=5,
                           max_word_types=None, min_pair_count=1)
        a = sorted((r["word"], r["n_tokens"]) for r in
                   bpe_encode_words(df, "text", merges,
                                    checkpoint_every=1).collect())
        b = sorted((r["word"], r["n_tokens"]) for r in
                   bpe_encode_words(df, "text", merges,
                                    checkpoint_every=100).collect())
        assert a == b

    def test_guards(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError, match="non-empty"):
            bpe_encode_words(df, "text", [])
        with pytest.raises(ValueError, match="merge rows"):
            bpe_encode_words(df, "text", [("a", "b")])
        with pytest.raises(ValueError, match="missing column"):
            bpe_token_count(df, "text", [(1, "a", "b")], "nope")
