"""Text-analysis operator tests (small literal frames, hand-checked)."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.textstats import (
    bpe_token_stats,
    doc_fingerprint,
    exact_dup_groups,
    language_id,
    length_profile,
    quality_score,
    repetition_stats,
    shingle_jaccard_pairs,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "der hund und die katze mit dem ball"),
            (4, "le chat et la souris avec le fromage"),
            (5, "xyzzy plugh 12345 67890"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.spark
class TestTextStats:
    def test_token_stats(self, docs):
        got = {r["doc_id"]: r for r in token_stats(docs).collect()}
        assert got[1]["n_tokens"] == 9
        assert got[1]["n_distinct_tokens"] == 8  # 'the' twice
        assert got[5]["n_tokens"] == 4

    def test_bpe_token_stats(self, docs):
        got = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
        # plain space-separated words: one BPE pre-token per word
        assert got[1]["n_bpe_tokens"] == got[1]["n_ws_tokens"] == 9
        assert got[1]["tokens_per_word"] == pytest.approx(1.0)

    def test_bpe_token_stats_contractions_digits_punct(self, spark):
        df = spark.createDataFrame(
            [(1, "it's a test-case, isn't it? 123 456")],
            "doc_id long, text string",
        )
        got = bpe_token_stats(df).collect()[0]
        # it|'s| a| test|-|case|,| isn|'t| it|?| 123| 456  -> 13 pre-tokens
        assert got["n_bpe_tokens"] == 13
        assert got["n_ws_tokens"] == 7
        assert got["tokens_per_word"] == pytest.approx(13 / 7, abs=1e-4)

    def test_repetition_stats(self, spark):
        df = spark.createDataFrame(
            [
                # 'buy now' repeated 4x: top unigram 'buy' 4/8; every
                # 3-gram occurs >1x except none — grams: 'buy now buy',
                # 'now buy now' x alternating -> all 6 positions dup
                (1, "buy now buy now buy now buy now"),
                # all-distinct tokens: top 1/5, zero duplicated grams
                (2, "alpha beta gamma delta epsilon"),
                # short doc (2 tokens < k): one clamped gram, not dup
                (3, "tiny doc"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in repetition_stats(df, gram_k=3).collect()}
        assert got[1]["n_tokens"] == 8
        assert got[1]["top_unigram_frac"] == pytest.approx(0.5)
        assert got[1]["dup_gram_frac"] == pytest.approx(1.0)
        assert got[2]["top_unigram_frac"] == pytest.approx(0.2)
        assert got[2]["dup_gram_frac"] == 0.0
        assert got[3]["n_tokens"] == 2 and got[3]["dup_gram_frac"] == 0.0

    def test_length_profile(self, spark):
        df = spark.createDataFrame(
            [(1, "a" * 10), (2, "b" * 12), (3, "c" * 100), (4, "d")],
            "doc_id long, text string",
        )
        got = {r["len_bucket"]: r for r in length_profile(df).collect()}
        # 10,12 -> bucket 3; 100 -> bucket 6; 1 -> bucket 0
        assert got[3]["n_docs"] == 2 and got[3]["total_chars"] == 22
        assert got[3]["min_chars"] == 10 and got[3]["max_chars"] == 12
        assert got[6]["n_docs"] == 1
        assert got[0]["n_docs"] == 1

    def test_exact_dup_groups(self, docs):
        got = {r["text_md5"]: r for r in exact_dup_groups(docs).collect()}
        dups = [r for r in got.values() if r["dup_count"] > 1]
        assert len(dups) == 1
        assert dups[0]["rep_doc_id"] == 1 and dups[0]["dup_count"] == 2

    def test_language_id(self, docs):
        got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
        assert got[1] == "en"
        assert got[3] == "de"
        assert got[4] == "fr"
        assert got[5] == "und"

    def test_quality_score(self, docs):
        got = {r["doc_id"]: r for r in quality_score(docs).collect()}
        assert got[1]["passes_quality"] is False or got[1]["n_tokens"] == 9
        assert got[5]["digit_ratio"] > 0.4
        assert not got[5]["passes_quality"]

    def test_fingerprint_matches_dups(self, docs):
        got = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
        assert got[1] == got[2]
        assert got[1] != got[3]
        assert all(v >= 0 for v in got.values())

    def test_shingle_jaccard(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),
                (2, "a b c d e f g x"),   # shares 5 of the 3-gram shingles
                (3, "q w e r t y u i"),
            ],
            "doc_id long, text string",
        )
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in shingle_jaccard_pairs(df, k=3, threshold=0.1).collect()}
        assert (1, 2) in got and got[(1, 2)] == pytest.approx(5 / 7, abs=1e-4)
        assert (1, 3) not in got

    def test_ngram_contamination(self, spark):
        from frizbee_spark.operators.textstats import ngram_contamination

        # bench doc's 4-gram "a b c d" appears verbatim in doc 1; doc 2
        # shares no 4-gram with the benchmark
        corpus = spark.createDataFrame(
            [(1, "x y a b c d z w"), (2, "p q r s t u v w")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "a b c d e f")], "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in
               ngram_contamination(corpus, bench, k=4).collect()}
        assert set(got) == {1}
        assert got[1]["n_grams"] == 5          # 8 tokens -> 5 distinct 4-grams
        assert got[1]["n_contaminated_grams"] == 1
        assert got[1]["contamination_ratio"] == pytest.approx(0.2)

    def test_ngram_contamination_short_doc_clamp(self, spark):
        from frizbee_spark.operators.textstats import ngram_contamination

        # doc shorter than k contributes its full text as ONE gram (the
        # greatest(..., 1) clamp) — identical on the SQL-oracle side
        corpus = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, "a b")], "doc_id long, text string")
        got = ngram_contamination(corpus, bench, k=4).collect()
        assert len(got) == 1 and got[0]["n_grams"] == 1

    def test_dup_chunks(self, spark):
        from frizbee_spark.operators.textstats import dup_chunks

        # docs 1 and 2 share their first 4-token chunk; doc 3 is unique;
        # doc 4 is too short for any chunk
        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),
                (2, "a b c d x y z w"),
                (3, "q r s t u v w x"),
                (4, "a b"),
            ],
            "doc_id long, text string",
        )
        got = dup_chunks(corpus, chunk_tokens=4).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_docs"] == 2 and r["n_occurrences"] == 2
        assert r["rep_doc_id"] == 1

    def test_dup_chunks_within_doc_repeat(self, spark):
        from frizbee_spark.operators.textstats import dup_chunks

        # the same chunk twice within ONE doc is not a cross-doc dup
        # (n_docs=1 filtered); across docs it counts every occurrence
        corpus = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c d")],
            "doc_id long, text string",
        )
        got = dup_chunks(corpus, chunk_tokens=2).collect()
        assert {(r["n_docs"], r["n_occurrences"]) for r in got} == {(2, 3)}

    def test_dedup_rewrite_keep_first_and_tail(self, spark):
        from frizbee_spark.operators.textstats import dedup_rewrite

        # doc 1 owns the first occurrence of "a b c d"; doc 2 repeats it
        # (removed) but keeps its unique second chunk and 2-token tail;
        # doc 3 is all-tail (shorter than one chunk) and passes through
        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),
                (2, "a b c d x y z w t1 t2"),
                (3, "u v w"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in dedup_rewrite(corpus, chunk_tokens=4).collect()}
        assert got[1]["n_removed"] == 0
        assert got[1]["cleaned_text"] == "a b c d e f g h"
        assert got[2]["n_removed"] == 1 and got[2]["n_chunks"] == 2
        assert got[2]["cleaned_text"] == "x y z w t1 t2"
        assert got[2]["cleaned_tokens"] == 6
        assert got[3]["n_chunks"] == 0 and got[3]["cleaned_text"] == "u v w"

    def test_dedup_rewrite_intra_doc_and_order(self, spark):
        from frizbee_spark.operators.textstats import dedup_rewrite

        # within ONE doc the second occurrence is removed too; across
        # docs first-occurrence order is (doc_id, chunk idx), so doc 2's
        # copy loses to doc 1's even though doc 2 also repeats it
        corpus = spark.createDataFrame(
            [(1, "a b a b c d"), (2, "a b e f a b")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in dedup_rewrite(corpus, chunk_tokens=2).collect()}
        assert got[1]["cleaned_text"] == "a b c d" and got[1]["n_removed"] == 1
        assert got[2]["cleaned_text"] == "e f" and got[2]["n_removed"] == 2

    def test_line_dedup_boilerplate_removed_everywhere(self, spark):
        from frizbee_spark.operators.textstats import line_dedup

        rows = [
            (1, "NAV BAR\nunique one\n\nFOOTER 2020"),
            (2, "NAV BAR\nunique two\nFOOTER 2020"),
            (3, "all original\nnothing shared"),
            (4, "NAV BAR"),           # whole doc is boilerplate
            (5, "   \n\n"),           # whitespace-only lines survive
        ]
        got = {r["doc_id"]: r for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_docs=2).collect()}
        # boilerplate dies EVERYWHERE (no keep-first), blank line kept
        assert got[1]["cleaned_text"] == "unique one\n"
        assert got[1]["n_removed"] == 2 and got[1]["n_lines"] == 4
        assert got[2]["cleaned_text"] == "unique two"
        assert got[3]["n_removed"] == 0
        assert got[4]["cleaned_text"] == "" and got[4]["n_removed"] == 1
        assert got[5]["cleaned_text"] == "   \n\n" and got[5]["n_removed"] == 0

    def test_line_dedup_intra_doc_repeat_not_boilerplate(self, spark):
        from frizbee_spark.operators.textstats import line_dedup

        # a line repeated WITHIN one doc only is not boilerplate
        # (min_docs counts distinct docs); raising min_docs spares a
        # 2-doc line
        rows = [(1, "echo\necho\nmine"), (2, "pair\nx"), (3, "pair\ny")]
        got = {r["doc_id"]: r for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_docs=2).collect()}
        assert got[1]["cleaned_text"] == "echo\necho\nmine"
        assert got[2]["cleaned_text"] == "x"
        got3 = {r["doc_id"]: r for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_docs=3).collect()}
        assert got3[2]["cleaned_text"] == "pair\nx"

    def test_line_dedup_validates_min_docs(self, spark):
        import pytest as _pytest

        from frizbee_spark.operators.textstats import line_dedup

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="min_docs >= 2"):
            line_dedup(df, min_docs=1)

    def test_dedup_rewrite_total_mass_conserved(self, spark):
        from frizbee_spark.operators.textstats import dedup_rewrite, dup_chunks

        # corpus-wide: removed occurrences == dup_chunks' extra
        # occurrences beyond each chunk's first (cross-checks the two
        # operators share one chunking)
        corpus = spark.createDataFrame(
            [
                (1, "a b c d a b c d e f"),
                (2, "a b c d q r s t"),
                (3, "q r s t q r s t"),
            ],
            "doc_id long, text string",
        )
        rw = dedup_rewrite(corpus, chunk_tokens=4).collect()
        removed = sum(r["n_removed"] for r in rw)
        det = dup_chunks(corpus, chunk_tokens=4).collect()
        # dup_chunks only reports cross-doc dups; add intra-doc-only ones
        # manually: chunk "a b c d" occurs 3x (2 removed), "q r s t" 3x
        # (2 removed) -> 4 removals total
        assert removed == 4
        assert sum(r["n_occurrences"] - 1 for r in det) == 4


class TestCorpusFilter:
    def test_reason_precedence_and_keep(self, spark):
        from frizbee_spark.operators.textstats import corpus_filter

        long_ok = " ".join(
            ["the", "and", "of"] + [f"w{i}" for i in range(20)])
        rep_uni = "the " * 30 + " ".join(f"w{i}" for i in range(10))
        rep_gram = "the and of " * 10 + " ".join(f"w{i}" for i in range(10))
        no_lang = " ".join(f"zq{i}" for i in range(30))
        corpus = spark.createDataFrame(
            [
                (1, long_ok),          # passes every gate
                (2, "the and of"),     # too_short (chars AND tokens)
                (3, rep_uni.strip()),  # top unigram 30/40 > 0.125
                (4, rep_gram.strip()), # dup 3-gram coverage > 0.05
                (5, no_lang),          # zero marker hits
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["keep"], r["reason"])
               for r in corpus_filter(corpus).collect()}
        assert got[1] == (True, "ok")
        assert got[2] == (False, "too_short")
        # doc 3 also repeats grams ("the" runs), but gram precedence is
        # higher ONLY when the gram threshold trips; assert the reason
        # is one of the two repetition codes and keep is False
        assert got[3][0] is False and got[3][1].startswith("repetitive")
        assert got[4] == (False, "repetitive_grams")
        assert got[5] == (False, "no_lang_signal")

    def test_fixture_mix_nonvacuous(self, spark):
        from frizbee_spark.operators.textstats import corpus_filter

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        reasons = {
            r["reason"]: r["n"]
            for r in corpus_filter(docs).groupBy("reason")
            .agg(F.count("*").alias("n")).collect()
        }
        # every reason code fires on the fixture (thresholds were chosen
        # against its distribution) — the driver query is non-vacuous
        assert set(reasons) == {"ok", "too_short", "repetitive_grams",
                                "repetitive_unigram", "no_lang_signal"}
        assert reasons["ok"] > 250


class TestHashSplit:
    def test_deterministic_and_leakage_safe(self, spark):
        from frizbee_spark.operators.textstats import hash_split

        rows = [(i, i % 37) for i in range(500)]  # 37 clusters
        df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
        a = hash_split(df, "cluster_id").collect()
        b = hash_split(df, "cluster_id").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # leakage safety: one split per cluster, by construction
        per_cluster = {}
        for r in a:
            per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        assert all(len(s) == 1 for s in per_cluster.values())
        splits = {r["split"] for r in a}
        assert splits == {"train", "val", "test"}
        assert all(0 <= r["split_bucket"] < 10 for r in a)

    def test_bucket_arithmetic_validated(self, spark):
        # train+val >= n_buckets silently yielded an EMPTY test split,
        # n_buckets <= 0 produced nulls (ADVICE r3) — both must raise
        from frizbee_spark.operators.textstats import hash_split

        df = spark.createDataFrame(
            [(i, i) for i in range(5)], "doc_id long, cluster_id long")
        with pytest.raises(ValueError, match="test split"):
            hash_split(df, "cluster_id", n_buckets=10,
                       train_buckets=9, val_buckets=1)
        with pytest.raises(ValueError, match="n_buckets"):
            hash_split(df, "cluster_id", n_buckets=0)
        with pytest.raises(ValueError, match="test split"):
            hash_split(df, "cluster_id", n_buckets=10,
                       train_buckets=0, val_buckets=1)

    def test_stable_under_append(self, spark):
        from frizbee_spark.operators.textstats import hash_split

        small = spark.createDataFrame(
            [(i, i) for i in range(50)], "doc_id long, cluster_id long")
        big = spark.createDataFrame(
            [(i, i) for i in range(100)], "doc_id long, cluster_id long")
        a = {r["cluster_id"]: r["split"]
             for r in hash_split(small, "cluster_id").collect()}
        b = {r["cluster_id"]: r["split"]
             for r in hash_split(big, "cluster_id").collect()}
        assert all(b[k] == v for k, v in a.items())


class TestTfidfTopterms:
    def test_hand_checked_scores(self, spark):
        import math

        from frizbee_spark.operators.textstats import tfidf_topterms

        corpus = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
            "doc_id long, text string",
        )
        got = {(r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
               for r in tfidf_topterms(corpus, top_m=2).collect()}
        idf = lambda dfr: math.log(4 / (dfr + 1)) + 1  # N=3
        assert got[(1, "apple")] == (round(2 * idf(1), 4), 1)
        assert got[(1, "banana")] == (round(1 * idf(2), 4), 2)
        # doc 2: banana and cherry tie (tf=1, df=2) -> term asc breaks it
        assert got[(2, "banana")][1] == 1 and got[(2, "cherry")][1] == 2

    def test_rank_bounds(self, spark):
        from frizbee_spark.operators.textstats import tfidf_topterms

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = tfidf_topterms(docs, top_m=3)
        assert got.filter("rank > 3 or rank < 1").count() == 0
        per_doc = got.groupBy("doc_id").agg(F.count("*").alias("n"))
        assert per_doc.filter("n > 3").count() == 0


class TestLmPerplexity:
    def test_matches_brute_force_reference(self, spark):
        import math
        from collections import Counter

        from frizbee_spark.operators.textstats import lm_perplexity

        rows = [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the cat"),
            (3, "a dog ran past the cat"),
            (4, "gibberish zq xv qq zq"),
            (5, "the the the the"),
        ]
        texts = {i: t.split() for i, t in rows}
        uni = Counter(w for tk in texts.values() for w in tk)
        big = Counter(
            (tk[i], tk[i + 1])
            for tk in texts.values() for i in range(len(tk) - 1)
        )
        V = len(uni)
        # mirror the operator's determinism contract: per-bigram log-prob
        # rounds to 6 decimals before the (exact) sum
        lp = {
            bg: round(math.log2(c + 1) - math.log2(uni[bg[0]] + V), 6)
            for bg, c in big.items()
        }
        expected = {}
        for i, tk in texts.items():
            lps = [lp[(tk[j], tk[j + 1])] for j in range(len(tk) - 1)]
            h = round(-sum(lps) / len(lps), 4)
            expected[i] = (len(lps), h, round(2.0 ** h, 4))

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
            for r in lm_perplexity(df).collect()
        }
        assert got == expected

    def test_short_docs_excluded_and_ordering_signal(self, spark):
        from frizbee_spark.operators.textstats import lm_perplexity

        df = spark.createDataFrame(
            [
                (1, "one"),                       # 1 token -> no bigrams
                (2, ""),                          # empty -> no bigrams
                (3, "the cat sat on the mat and the cat sat again"),
                (4, "the cat sat on the mat and the cat sat again"),
                (5, "zq qq xv jj kk ww yy uu oo pp"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
        assert set(got) == {3, 4, 5}
        # identical docs score identically; the repeated in-distribution
        # doc is less surprising than the one-off junk doc
        assert got[3]["cross_entropy"] == got[4]["cross_entropy"]
        assert got[5]["cross_entropy"] > got[3]["cross_entropy"]
        for r in got.values():
            assert r["perplexity"] == round(2.0 ** r["cross_entropy"], 4)


class TestStratifiedSample:
    def test_rates_and_weights(self, spark):
        from frizbee_spark.operators.textstats import stratified_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = stratified_sample(
            docs, rates={"en": 0.5, "de": 1.0, "fr": 0.25}, default_rate=0.1
        ).select("doc_id", "lang", "sample_u", "sample_weight").collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r)
        # rate-1.0 stratum keeps every row; weights are exactly 1/rate
        n_de = docs.filter("lang = 'de'").count()
        assert len(by_lang["de"]) == n_de
        weights = {r["lang"]: r["sample_weight"] for r in out}
        assert weights["de"] == 1.0 and weights["en"] == 2.0
        assert weights["fr"] == 4.0
        for lang in set(weights) - {"de", "en", "fr"}:
            assert weights[lang] == 10.0
        # every kept row's uniform sits below its stratum rate
        rate = {"en": 0.5, "de": 1.0, "fr": 0.25}
        for r in out:
            assert r["sample_u"] < rate.get(r["lang"], 0.1)

    def test_deterministic_append_stable_and_nested(self, spark):
        from frizbee_spark.operators.textstats import stratified_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        kept_small = {
            r["doc_id"] for r in
            stratified_sample(docs, rates={"en": 0.1}).collect()
        }
        kept_big = {
            r["doc_id"] for r in
            stratified_sample(docs, rates={"en": 0.5}).collect()
        }
        # monotone in the rate: raising it only ADDS rows
        assert kept_small <= kept_big
        # append-stable: sampling half the corpus agrees with sampling
        # all of it on the shared rows (a row's fate ignores the rest)
        half = docs.filter("doc_id % 2 = 0")
        kept_half = {
            r["doc_id"] for r in
            stratified_sample(half, rates={"en": 0.5}).collect()
        }
        assert kept_half == {d for d in kept_big if d % 2 == 0}
        # re-run identical
        assert kept_big == {
            r["doc_id"] for r in
            stratified_sample(docs, rates={"en": 0.5}).collect()
        }

    def test_rate_validation(self, spark):
        import pytest as _pytest

        from frizbee_spark.operators.textstats import stratified_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with _pytest.raises(ValueError):
            stratified_sample(docs, rates={"en": 1.5})
        with _pytest.raises(ValueError):
            stratified_sample(docs, rates={"en": 0.5}, default_rate=-0.1)


class TestShingleContainment:
    def test_quote_caught_containment_not_jaccard(self, spark):
        from frizbee_spark.operators.textstats import (
            shingle_containment_pairs,
            shingle_jaccard_pairs,
        )

        quote = "the quick brown fox jumps over the lazy dog again today"
        filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
        corpus = spark.createDataFrame(
            [
                (1, quote),                     # short doc
                (2, filler + " " + quote),      # quote embedded in long doc
                (3, "completely unrelated text about spark tables and rows"),
            ],
            "doc_id long, text string",
        )
        cont = {
            (r["a"], r["b"]): (r["contain_a_in_b"], r["contain_b_in_a"])
            for r in shingle_containment_pairs(corpus, threshold=0.8).collect()
        }
        # doc 1's shingle set is (almost) fully inside doc 2 ...
        assert (1, 2) in cont and cont[(1, 2)][0] >= 0.8
        # ... while symmetric Jaccard at the same threshold misses it
        jac = shingle_jaccard_pairs(corpus, threshold=0.8).collect()
        assert all((r["a"], r["b"]) != (1, 2) for r in jac)
        assert (1, 3) not in cont and (2, 3) not in cont

    def test_directions_and_bounds(self, spark):
        from frizbee_spark.operators.textstats import shingle_containment_pairs

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = shingle_containment_pairs(docs, threshold=0.8).collect()
        assert rows, "fixture must produce containment pairs"
        for r in rows:
            assert r["a"] < r["b"]
            for c in (r["contain_a_in_b"], r["contain_b_in_a"]):
                assert 0.0 <= c <= 1.0
            assert max(r["contain_a_in_b"], r["contain_b_in_a"]) >= 0.8


class TestCurationRollup:
    def test_engineered_slices(self, spark):
        from frizbee_spark.operators.textstats import curation_rollup

        ok = " ".join(["the", "and", "of"] + [f"w{i}" for i in range(20)])
        ok2 = " ".join(["the", "and", "of"] + [f"v{i}" for i in range(20)])
        rows = [
            # srcA/en: 3 docs, one exact-dup pair (cross-checks dup count
            # includes BOTH members), all keep
            (1, ok, "en", "srcA"),
            (2, ok, "en", "srcA"),
            (3, ok2, "en", "srcA"),
            # srcB/en: 1 doc, exact dup of a srcA doc -> dup flag must be
            # GLOBAL (cross-slice), not within-slice
            (4, ok, "en", "srcB"),
            # srcB/de: 1 doc, too short
            (5, "the and of", "de", "srcB"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        got = {(r["source"], r["lang"]): r.asDict()
               for r in curation_rollup(df).collect()}
        a = got[("srcA", "en")]
        assert a["n_docs"] == 3 and a["n_exact_dup_docs"] == 2
        assert a["n_kept"] == 3 and a["n_too_short"] == 0
        b = got[("srcB", "en")]
        assert b["n_docs"] == 1 and b["n_exact_dup_docs"] == 1  # global dup
        c = got[("srcB", "de")]
        assert c["n_kept"] == 0 and c["n_too_short"] == 1

    def test_counts_partition_docs(self, spark):
        from frizbee_spark.operators.textstats import curation_rollup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rolled = curation_rollup(docs).collect()
        assert sum(r["n_docs"] for r in rolled) == docs.count()
        for r in rolled:
            dropped = (r["n_too_short"] + r["n_repetitive_grams"]
                       + r["n_repetitive_unigram"] + r["n_no_lang_signal"])
            assert r["n_kept"] + dropped == r["n_docs"]
            assert r["sum_chars"] > 0 and r["sum_tokens"] > 0


@pytest.mark.spark
class TestBloomDecontaminate:
    """Real-bitmap Bloom decontamination: FP-free config must equal the
    exact broadcast-join operator; a saturated bitmap must over-flag
    (never under-flag) — the defining Bloom asymmetry."""

    @pytest.fixture(scope="class")
    def split(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        return bench, corpus

    def test_fp_free_config_equals_exact_join(self, split):
        from frizbee_spark.operators.textstats import (
            bloom_decontaminate,
            ngram_contamination,
        )

        bench, corpus = split
        exact = {(r.doc_id, r.n_grams, r.n_contaminated_grams)
                 for r in ngram_contamination(corpus, bench, k=8).collect()}
        bloom = {(r.doc_id, r.n_grams, r.n_flagged_grams)
                 for r in bloom_decontaminate(
                     corpus, bench, k=8, m_bits=1 << 20, n_hashes=5).collect()}
        assert exact  # fixture plants contamination
        assert bloom == exact

    def test_saturated_bitmap_overflags_never_underflags(self, split):
        from frizbee_spark.operators.textstats import (
            bloom_decontaminate,
            ngram_contamination,
        )

        bench, corpus = split
        exact = {r.doc_id: r.n_contaminated_grams
                 for r in ngram_contamination(corpus, bench, k=8).collect()}
        small = {r.doc_id: r.n_flagged_grams
                 for r in bloom_decontaminate(
                     corpus, bench, k=8, m_bits=1024, n_hashes=2).collect()}
        # every truly contaminated gram still hits (no false negatives)
        assert set(exact) <= set(small)
        assert all(small[d] >= exact[d] for d in exact)
        # and the tiny bitmap demonstrably produces false positives —
        # this is a real Bloom filter, not the join in disguise
        assert len(small) > len(exact)

    def test_xxhash64_fast_path_equals_exact_join(self, split):
        # the production hash choice changes bit positions, not
        # semantics: at FP-free sizing it must flag the identical set
        from frizbee_spark.operators.textstats import (
            bloom_decontaminate,
            ngram_contamination,
        )

        bench, corpus = split
        exact = {(r.doc_id, r.n_grams, r.n_contaminated_grams)
                 for r in ngram_contamination(corpus, bench, k=8).collect()}
        fast = {(r.doc_id, r.n_grams, r.n_flagged_grams)
                for r in bloom_decontaminate(
                    corpus, bench, k=8, m_bits=1 << 20, n_hashes=5,
                    hash_fn="xxhash64").collect()}
        assert fast == exact

    def test_bad_hash_fn_rejected(self, split):
        from frizbee_spark.operators.textstats import bloom_decontaminate

        bench, corpus = split
        with pytest.raises(ValueError, match="hash_fn"):
            bloom_decontaminate(corpus, bench, hash_fn="sha1")

    def test_empty_benchmark_flags_nothing(self, spark, split):
        from frizbee_spark.operators.textstats import bloom_decontaminate

        _, corpus = split
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert bloom_decontaminate(corpus, empty, k=8).count() == 0

    def test_deterministic(self, split):
        from frizbee_spark.operators.textstats import bloom_decontaminate

        bench, corpus = split
        a = sorted(map(tuple, bloom_decontaminate(
            corpus, bench, k=8, m_bits=1 << 16, n_hashes=3).collect()))
        b = sorted(map(tuple, bloom_decontaminate(
            corpus, bench, k=8, m_bits=1 << 16, n_hashes=3).collect()))
        assert a == b

    def test_validation(self, split):
        from frizbee_spark.operators.textstats import bloom_decontaminate

        bench, corpus = split
        with pytest.raises(ValueError, match="m_bits"):
            bloom_decontaminate(corpus, bench, m_bits=100)
        with pytest.raises(ValueError, match="n_hashes"):
            bloom_decontaminate(corpus, bench, n_hashes=0)


class TestDsirWeights:
    def test_matches_brute_force_reference(self, spark):
        import hashlib
        import math
        from collections import Counter

        from frizbee_spark.operators.textstats import dsir_weights

        raw_rows = [
            (1, "the cat sat on the mat"),
            (2, "zq qq xv jj kk ww"),
            (3, "the dog sat on the rug"),
        ]
        tgt_rows = [
            (10, "the cat sat on the sofa"),
            (11, "the dog sat on the floor"),
        ]
        B, A = 64, 1.0

        def bucket(bg):
            h = hashlib.md5(("dsir:" + bg).encode()).hexdigest()
            return int(h[:15], 16) % B

        def bigrams(t):
            tk = t.split()
            return [tk[i] + " " + tk[i + 1] for i in range(len(tk) - 1)]

        raw_c = Counter(bucket(bg) for _, t in raw_rows for bg in bigrams(t))
        tgt_c = Counter(bucket(bg) for _, t in tgt_rows for bg in bigrams(t))
        tr, tt = sum(raw_c.values()), sum(tgt_c.values())
        lr = {
            b: round(
                (math.log2(tgt_c.get(b, 0) + A) - math.log2(tt + A * B))
                - (math.log2(c + A) - math.log2(tr + A * B)),
                6,
            )
            for b, c in raw_c.items()
        }
        expected = {}
        for i, t in raw_rows:
            lrs = [lr[bucket(bg)] for bg in bigrams(t)]
            s = sum(lrs)
            expected[i] = (len(lrs), round(s, 4), round(s / len(lrs), 4))

        raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
        tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["log_weight"], r["avg_logratio"])
            for r in dsir_weights(raw, tgt, n_buckets=B).collect()
        }
        assert got == expected

    def test_on_target_docs_outrank_junk(self, spark):
        from frizbee_spark.operators.textstats import dsir_weights

        raw = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and the cat slept"),
                (2, "zq qq xv jj kk ww yy uu oo pp"),
                (3, "one"),   # no bigrams -> excluded
            ],
            "doc_id long, text string",
        )
        tgt = spark.createDataFrame(
            [(10, "the cat sat on the mat while the cat purred")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in dsir_weights(raw, tgt).collect()}
        assert set(got) == {1, 2}
        assert got[1]["avg_logratio"] > got[2]["avg_logratio"]

    def test_model_join_is_broadcast(self, spark):
        from frizbee_spark.operators.textstats import dsir_weights

        raw = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string")
        tgt = spark.createDataFrame(
            [(2, "a b")], "doc_id long, text string")
        plan = (
            dsir_weights(raw, tgt)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        from frizbee_spark.operators.textstats import dsir_weights

        d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dsir_weights(d, d, n_buckets=0)
        with pytest.raises(ValueError):
            dsir_weights(d, d, alpha=0.0)


class TestSourceOverlap:
    def test_matrix_counts_and_fracs(self, spark):
        from frizbee_spark.operators.textstats import source_overlap

        rows = [
            (1, "cc", "dup one"), (2, "cc", "dup two"), (3, "cc", "uniq cc"),
            (4, "news", "dup one"), (5, "news", "dup one"),
            (6, "news", "uniq news"),
            (7, "books", "dup two"), (8, "books", "uniq books"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {(r["source_a"], r["source_b"]): r
               for r in source_overlap(df).collect()}
        assert set(got) == {("books", "cc"), ("cc", "news")}
        bc = got[("books", "cc")]
        assert (bc["shared_fingerprints"], bc["docs_a_in_b"],
                bc["docs_b_in_a"]) == (1, 1, 1)
        assert (bc["frac_a"], bc["frac_b"]) == (0.5, 0.333333)
        cn = got[("cc", "news")]
        # "dup one" appears twice in news: doc counts, not fp counts
        assert (cn["shared_fingerprints"], cn["docs_a_in_b"],
                cn["docs_b_in_a"]) == (1, 1, 2)
        assert (cn["frac_a"], cn["frac_b"]) == (0.333333, 0.666667)

    def test_three_way_shared_content_pairs_all(self, spark):
        from frizbee_spark.operators.textstats import source_overlap

        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "x"), (3, "c", "x")],
            "doc_id long, source string, text string")
        got = {(r["source_a"], r["source_b"])
               for r in source_overlap(df).collect()}
        assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_no_overlap_empty(self, spark):
        from frizbee_spark.operators.textstats import source_overlap

        df = spark.createDataFrame(
            [(1, "a", "only a"), (2, "b", "only b")],
            "doc_id long, source string, text string")
        assert source_overlap(df).count() == 0

    def test_totals_join_is_broadcast(self, spark):
        from frizbee_spark.operators.textstats import source_overlap

        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "x")],
            "doc_id long, source string, text string")
        plan = (source_overlap(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "BroadcastHashJoin" in plan


class TestPerplexityBuckets:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        from frizbee_spark.operators.textstats import perplexity_buckets

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        return perplexity_buckets(docs).toPandas()

    def test_tercile_sizes_follow_remainder_rule(self, scored):
        for lang, g in scored.groupby("lang"):
            n = len(g)
            sizes = g.ppl_bucket.value_counts().sort_index().tolist()
            base, rem = divmod(n, 3)
            expect = [base + (1 if i < rem else 0) for i in range(3)]
            assert sizes == expect, (lang, sizes, expect)

    def test_head_is_the_fluent_end(self, scored):
        for lang, g in scored.groupby("lang"):
            if set(g.ppl_bucket) == {1, 2, 3}:
                assert (g[g.ppl_bucket == 1].perplexity.max()
                        <= g[g.ppl_bucket == 2].perplexity.min())
                assert (g[g.ppl_bucket == 2].perplexity.max()
                        <= g[g.ppl_bucket == 3].perplexity.min())

    def test_tier_labels(self, scored):
        m = dict(zip(scored.ppl_bucket, scored.ppl_tier))
        assert m == {1: "head", 2: "middle", 3: "tail"}

    def test_custom_bucket_count_labels(self, spark):
        from frizbee_spark.operators.textstats import perplexity_buckets

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        out = perplexity_buckets(docs, n_buckets=5).toPandas()
        assert set(out.ppl_tier) <= {f"b{i}" for i in range(1, 6)}

    def test_validation(self, spark):
        from frizbee_spark.operators.textstats import perplexity_buckets

        docs = spark.createDataFrame(
            [(1, "en", "a b")], "doc_id long, lang string, text string")
        with pytest.raises(ValueError):
            perplexity_buckets(docs, n_buckets=0)


@pytest.mark.spark
class TestVocabTopk:
    def _docs(self, spark):
        rows = [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a cat and a dog and a bird"),
            (4, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_counts_docfreq_rank(self, spark):
        from frizbee_spark.operators.textstats import vocab_topk

        out = vocab_topk(self._docs(spark), k=4).orderBy("rank").collect()
        got = [(r.token, r.n_occurrences, r.n_docs, r.rank) for r in out]
        # total order: count DESC, token ASC — 'a' (3) beats 'the' (3)? no:
        # 'a' 3 occurrences, 'the' 3 occurrences -> tie broken by token ASC
        assert got == [
            ("a", 3, 1, 1), ("the", 3, 2, 2),
            ("and", 2, 1, 3), ("cat", 2, 2, 4),
        ]

    def test_min_count_and_k_cut(self, spark):
        from frizbee_spark.operators.textstats import vocab_topk

        out = vocab_topk(self._docs(spark), k=100, min_count=2).collect()
        assert {r.token for r in out} == {"a", "the", "and", "cat",
                                          "dog", "sat"}
        with pytest.raises(ValueError):
            vocab_topk(self._docs(spark), k=0)

    def test_matches_brute_force_on_corpus(self, spark):
        from collections import Counter

        from frizbee_spark.operators.textstats import vocab_topk

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = df.select("doc_id", "text").filter("text is not null").collect()
        occ, docs = Counter(), Counter()
        for r in rows:
            toks = r.text.strip().split()
            occ.update(toks)
            for t in set(toks):
                docs[t] += 1
        want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        got = vocab_topk(df, k=25).orderBy("rank").collect()
        assert [(r.token, r.n_occurrences, r.n_docs) for r in got] == [
            (t, c, docs[t]) for t, c in want
        ]


@pytest.mark.spark
class TestNgramNovelty:
    def test_planted_redundancy(self, spark):
        from frizbee_spark.operators.textstats import ngram_novelty

        base = " ".join(f"w{j}" for j in range(20))
        rows = [
            (1, base),                                    # all novel
            (2, base),                                    # exact restate: 0
            (3, base + " " + " ".join(f"x{j}" for j in range(8))),
            (4, " ".join(f"y{j}" for j in range(20))),    # all novel
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in ngram_novelty(df, k=8).collect()}
        assert out[1].novelty_frac == 1.0
        assert out[2].novelty_frac == 0.0
        assert out[4].novelty_frac == 1.0
        # doc 3 = 28 tokens -> 21 grams: 13 pure-base (seen in doc 1)
        # + 8 straddling/new grams (novel)
        assert out[3].n_grams == 21 and out[3].n_novel == 8
        assert 0.0 < out[3].novelty_frac < 1.0

    def test_append_stability(self, spark):
        from frizbee_spark.operators.textstats import ngram_novelty

        rows = [(i, " ".join(f"t{i}_{j}" for j in range(12))) for i in range(5)]
        rows[3] = (3, rows[1][1])  # doc 3 restates doc 1
        df5 = spark.createDataFrame(rows, "doc_id long, text string")
        first = {r.doc_id: (r.n_grams, r.n_novel)
                 for r in ngram_novelty(df5, k=8).collect()}
        more = rows + [(9, rows[0][1] + " extra tail tokens here")]
        df6 = spark.createDataFrame(more, "doc_id long, text string")
        second = {r.doc_id: (r.n_grams, r.n_novel)
                  for r in ngram_novelty(df6, k=8).collect()}
        # appending a HIGHER id never changes existing rows
        assert all(second[d] == first[d] for d in first)
        assert second[9][1] < second[9][0]  # restated head grams not novel

    def test_short_doc_single_gram(self, spark):
        from frizbee_spark.operators.textstats import ngram_novelty

        df = spark.createDataFrame(
            [(1, "only three tokens"), (2, "only three tokens")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in ngram_novelty(df, k=8).collect()}
        assert out[1].n_grams == 1 and out[1].novelty_frac == 1.0
        assert out[2].n_grams == 1 and out[2].novelty_frac == 0.0
