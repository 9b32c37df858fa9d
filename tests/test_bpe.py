"""Distributed BPE trainer: differential parity vs a brute-force
pure-Python reference (subword-nmt-style get_stats/merge loop), merge
greediness on repeated symbols, tiebreak determinism, and the
broadcast-encode plan."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.bpe import bpe_doc_tokens, bpe_train


def _ref_bpe(texts, n_merges):
    """Reference trainer: overlapping pair counts, (freq DESC, pair ASC)
    tiebreak, greedy left-to-right merge — the standard algorithm."""
    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for k in range(1, n_merges + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), f = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((k, a, b, a + b, f))
        new = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    return merges, vocab


TEXTS = [
    "the low lower lowest bird",
    "the newest newer new bird flies low",
    "a bb ccc the the lowest newest",
    "ba ba ba banana and the low river",
    "aaa aaaa aa aaa the repeated aaa runs",  # repeated-symbol greediness
    "Mixed CASE and punct!! 123 numbers",     # pre-tokenizer folding
]


@pytest.mark.spark
class TestBpe:
    @pytest.fixture(autouse=True)
    def _release(self, spark):
        # unit-of-work owner contract: the trainer's tracked persists
        # (final words frame under return_words=True) are released here,
        # so the session-wide cache-lifecycle tests see an empty manager
        yield
        from frizbee_spark.util import release_tracked

        release_tracked()

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")

    def test_merges_match_reference(self, docs):
        want, _ = _ref_bpe(TEXTS, 12)
        got = [(r["rank"], r["left_sym"], r["right_sym"], r["merged"],
                r["freq"]) for r in bpe_train(docs, 12).collect()]
        assert got == want

    def test_doc_tokens_match_reference(self, docs):
        _, vocab = _ref_bpe(TEXTS, 12)
        n_sub = {}
        for syms, _c in vocab.items():
            n_sub["".join(syms).replace("</w>", "")] = len(syms)
        want = {}
        for i, t in enumerate(TEXTS):
            ws = re.findall(r"[a-z]+", t.lower())
            if ws:
                want[i] = (len(ws), sum(n_sub[w] for w in ws))
        got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
               for r in bpe_doc_tokens(docs, 12).collect()}
        assert got == want

    def test_repeated_symbol_greedy_merge(self, spark):
        # 'aaaa' under merge (a,a): greedy left-to-right -> (aa)(aa),
        # 2 symbols + </w>; a merge that overlapped would produce 3.
        # Pair counting DOES count overlaps: 'aaaa' contributes (a,a)
        # x3 per occurrence, x2 occurrences = 6.
        df = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
        merges, words = bpe_train(df, 1, return_words=True)
        m = merges.collect()[0]
        assert (m["left_sym"], m["right_sym"], m["freq"]) == ("a", "a", 6)
        segs = words.select("s").collect()[0]["s"].split("\x1f\x1f")
        assert [x.strip("\x1f") for x in segs] == ["aa", "aa", "</w>"]

    def test_tiebreak_lexicographic(self, spark):
        # 'xy' and 'ab' both appear twice -> pairs (a,b),(x,y),(b,</w>),
        # (y,</w>) all freq 2; lexicographic smallest (a,b) must win
        df = spark.createDataFrame(
            [(0, "xy ab"), (1, "ab xy")], "doc_id long, text string")
        m = bpe_train(df, 1).collect()[0]
        assert (m["left_sym"], m["right_sym"]) == ("a", "b")

    def test_merge_exhaustion_stops_early(self, spark):
        # single-letter words exhaust after merging with </w>
        df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
        got = bpe_train(df, 50).collect()
        assert len(got) < 50
        # all words fully merged to one symbol each at the end
        _, words = bpe_train(df, 50, return_words=True)
        for r in words.collect():
            assert "\x1f\x1f" not in r["s"]

    def test_encode_plan_broadcasts_vocab(self, docs):
        df = bpe_doc_tokens(docs, 2)
        explained = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in explained

    def test_random_corpus_differential(self, spark):
        # seeded random corpora: the distributed trainer must equal the
        # brute-force reference on arbitrary word mixes (repeats, short
        # words, heavy ties), not just the curated fixture
        import random

        rng = random.Random(1508)
        for trial in range(3):
            vocab = ["a", "ab", "aab", "the", "lo", "low", "xyz", "zz"]
            texts = [" ".join(rng.choices(vocab, k=rng.randrange(3, 12)))
                     for _ in range(rng.randrange(4, 10))]
            want, _ = _ref_bpe(texts, 6)
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)],
                "doc_id long, text string")
            got = [(r["rank"], r["left_sym"], r["right_sym"], r["merged"],
                    r["freq"]) for r in bpe_train(df, 6).collect()]
            assert got == want, (trial, texts)
