"""Behavioral tests for the fuzzy matcher — the reference's matcher suite
(/root/reference/src/one_shot/matcher.rs:167-241) plus the distributed
operator."""

import pytest

from frizbee_spark.constants import MatchConfig
from frizbee_spark.operators.fuzzy import (
    IncrementalMatcher,
    match_indices,
    match_list,
)

HAYSTACK = ["deadbeef", "deadbf", "deadbeefg", "deadbe"]


class TestMatchList:
    def test_ordering(self):
        # result order by score desc, index asc (matcher.rs:171-187)
        matches = match_list("deadbe", HAYSTACK, MatchConfig(max_typos=None))
        assert [m.index for m in matches] == [3, 0, 2, 1]

    def test_no_typos(self):
        matches = match_list("deadbe", HAYSTACK, MatchConfig(max_typos=0))
        assert len(matches) == 3
        assert {m.index for m in matches} == {0, 2, 3}

    def test_one_typo(self):
        matches = match_list("deadbe", HAYSTACK, MatchConfig(max_typos=1))
        assert len(matches) == 4

    def test_exact_match(self):
        matches = match_list("deadbe", HAYSTACK, MatchConfig())
        exact = [m for m in matches if m.exact]
        assert len(exact) == 1
        assert exact[0].index == 3

    def test_exact_matches_many(self):
        hs = ["deadbe", "deadbeef", "deadbe", "deadbf", "deadbe", "deadbeefg", "deadbe"]
        matches = match_list("deadbe", hs, MatchConfig())
        exact = [m for m in matches if m.exact]
        assert len(exact) == 4
        for m in exact:
            assert hs[m.index] == "deadbe"

    def test_empty_needle_matches_all_score_zero(self):
        matches = match_list("", HAYSTACK, MatchConfig())
        assert len(matches) == 4
        assert all(m.score == 0 and not m.exact for m in matches)

    def test_prefilter_equivalence(self):
        # prefilter on/off must agree (reference cross-checks its
        # prefilter variants the same way: prefilter/mod.rs:258-276)
        for needle in ["dead", "bf", "xq", "DEADBE"]:
            with_pf = match_list(needle, HAYSTACK, MatchConfig(prefilter=True))
            without = match_list(needle, HAYSTACK, MatchConfig(prefilter=False))
            assert [(m.index, m.score) for m in with_pf] == [
                (m.index, m.score) for m in without
            ]

    def test_long_haystack_routes_to_greedy(self):
        long_h = "x" * 600 + "deadbe" + "y" * 600
        matches = match_list("deadbe", [long_h], MatchConfig(max_typos=None))
        assert len(matches) == 1
        assert matches[0].score > 0


class TestMatchIndices:
    def test_basic(self):
        mi = match_indices("test", "Uterst")
        assert mi is not None
        assert mi.indices == [1, 2, 4, 5]

    def test_typo_budget_rejects(self):
        assert match_indices("xyz", "abc", MatchConfig(max_typos=0)) is None

    def test_exact(self):
        mi = match_indices("abc", "abc")
        assert mi.exact and mi.indices == [0, 1, 2]


class TestIncremental:
    def test_same_as_oneshot_and_memoized(self):
        m = IncrementalMatcher(HAYSTACK)
        r1 = m.match_needle("dead")
        r2 = m.match_needle("deadb")
        r3 = m.match_needle("dead")  # backspace revisit
        assert r1 == r3
        assert r1 == match_list("dead", HAYSTACK)
        assert [x.index for x in r2] == [x.index for x in match_list("deadb", HAYSTACK)]


@pytest.mark.spark
class TestFuzzySpark:
    def test_matches_local(self, spark):
        from frizbee_spark.operators.fuzzy import fuzzy_match

        rows = [(i, h) for i, h in enumerate(HAYSTACK)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = fuzzy_match(df, "deadbe", config=MatchConfig(max_typos=None)).collect()
        local = match_list("deadbe", HAYSTACK, MatchConfig(max_typos=None))
        assert [(r.doc_id, r.score, r.exact) for r in got] == [
            (m.index, m.score, m.exact) for m in local
        ]

    def test_min_length_pushdown(self, spark):
        from frizbee_spark.operators.fuzzy import fuzzy_match

        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(HAYSTACK)], "doc_id long, text string"
        )
        plan = fuzzy_match(df, "deadbe")._jdf.queryExecution().executedPlan().toString()
        assert "length" in plan.lower()  # catalyst filter present pre-UDF

    def test_multibyte_doc_not_pruned_by_byte_min_len(self, spark):
        """min_len is computed in BYTES (the DP kernel is byte-oriented),
        so the pushed predicate must be octet_length: an exact multi-byte
        match ("ééééé" = 5 chars, 10 bytes, needle 10 bytes, max_typos=0
        -> min_len 10) has char-length < min_len and a char-length filter
        silently drops it — a false negative."""
        from frizbee_spark.operators.fuzzy import fuzzy_match

        df = spark.createDataFrame(
            [(0, "ééééé"), (1, "zzz")], "doc_id long, text string")
        got = fuzzy_match(
            df, "ééééé", config=MatchConfig(max_typos=0)).collect()
        assert [(r.doc_id, r.exact) for r in got] == [(0, True)]


class TestIncrementalPrefixReuse:
    """The reference reuses DP columns of the shared needle prefix
    (incremental/matcher.rs:89-118, bucket.rs:49-122); ours must too."""

    def test_extending_needle_computes_one_column(self):
        m = IncrementalMatcher(HAYSTACK)
        m.match_needle("ab")
        n_buckets = len(m._buckets)
        before = m.stats["columns_computed"]
        m.match_needle("abc")  # shared prefix "ab" -> 1 new column/bucket
        assert m.stats["columns_computed"] - before == n_buckets

    def test_backspace_computes_nothing(self):
        m = IncrementalMatcher(HAYSTACK)
        m.match_needle("abc")
        before = m.stats["columns_computed"]
        r = m.match_needle("ab")  # strict prefix: all columns cached
        assert m.stats["columns_computed"] == before
        assert r == match_list("ab", HAYSTACK)

    def test_prefix_change_recomputes_suffix_only(self):
        m = IncrementalMatcher(HAYSTACK)
        m.match_needle("dead")
        n_buckets = len(m._buckets)
        before = m.stats["columns_computed"]
        m.match_needle("dexd")  # shares "de": 2 new columns per bucket
        assert m.stats["columns_computed"] - before == 2 * n_buckets

    @pytest.mark.parametrize("max_typos", [None, 0, 1, 2])
    def test_identical_to_match_list(self, max_typos):
        import numpy as np

        rng = np.random.default_rng(3)
        alphabet = np.frombuffer(b"abcdAB_- .", dtype=np.uint8)
        hs = ["".join(chr(c) for c in rng.choice(alphabet, size=int(n)))
              for n in rng.choice([3, 8, 20, 100, 600], size=60)]
        cfg = MatchConfig(max_typos=max_typos)
        m = IncrementalMatcher(hs, cfg)
        for needle in ["a", "ab", "abc", "ab", "d", "da", "dA-", "deadbe"]:
            got = m.match_needle(needle)
            want = match_list(needle, hs, cfg)
            assert got == want, f"needle {needle!r} (max_typos={max_typos})"


class TestFuzzyJoin:
    def test_equals_per_needle_fuzzy_match(self, spark):
        from frizbee_spark.operators.fuzzy import fuzzy_join, fuzzy_match

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        needles = [(7, "table value data"), (8, "spark query")]
        cfg = MatchConfig(max_typos=16)
        joined = {
            (r["needle_id"], r["doc_id"]): (r["score"], r["typos"], r["exact"])
            for r in fuzzy_join(
                docs, needles, config=cfg, per_needle_limit=None
            ).collect()
        }
        for nid, ns in needles:
            single = {
                (nid, r["doc_id"]): (r["score"], r["typos"], r["exact"])
                for r in fuzzy_match(docs, ns, config=cfg).collect()
            }
            sub = {k: v for k, v in joined.items() if k[0] == nid}
            assert sub == single, f"needle {ns!r} diverges from fuzzy_match"

    def test_per_needle_limit_and_determinism(self, spark):
        from frizbee_spark.operators.fuzzy import fuzzy_join

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        needles = [(1, "table value data"), (2, "spark query")]
        out1 = fuzzy_join(docs, needles, config=MatchConfig(max_typos=16),
                          per_needle_limit=10)
        rows1 = sorted(map(tuple, out1.collect()))
        per = {}
        for r in rows1:
            per[r[0]] = per.get(r[0], 0) + 1
        assert per == {1: 10, 2: 10}
        rows2 = sorted(map(tuple, fuzzy_join(
            docs, needles, config=MatchConfig(max_typos=16),
            per_needle_limit=10).collect()))
        assert rows1 == rows2

    def test_needle_side_guards(self, spark):
        from frizbee_spark.operators.fuzzy import fuzzy_join

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(ValueError):
            fuzzy_join(docs, [])
        # duplicate needle_ids would share one row_number partition,
        # making per_needle_limit joint and rows indistinguishable
        with pytest.raises(ValueError, match="unique"):
            fuzzy_join(docs, [(1, "alpha"), (1, "beta")])
        with pytest.raises(ValueError):
            fuzzy_join(docs, [(i, "x") for i in range(11)], max_needles=10)
        # a DataFrame needle side over the cap must refuse, not collect
        big = spark.range(20).selectExpr("id", "concat('n', id) AS s")
        with pytest.raises(ValueError):
            fuzzy_join(docs, big, max_needles=10)
        # and under the cap it works
        small = spark.createDataFrame(
            [(5, "table value data")], "id long, s string")
        assert fuzzy_join(
            docs, small, config=MatchConfig(max_typos=16),
            per_needle_limit=3).count() == 3


class TestFuzzyJoinNeedleScale:
    def test_10k_needle_cap_envelope(self, spark):
        """The documented fuzzy_join envelope made executable (VERDICT r4
        item 7): the FULL 10k-needle dictionary against a 100k-doc corpus.

        Measured once at the full 100k-doc envelope on this host
        (local[8]): 304s = 33 needles/sec = 3.3M needle-doc pairs/sec,
        prefilter-bound (recorded in BENCH.md). The suite runs the same
        10k-needle dictionary against 25k docs to stay inside the pytest
        budget — the cap, broadcast, plan shape, and linearity claims are
        corpus-size-independent.

        Structure under test: (a) the 10k dictionary serializes far under
        spark.sql.autoBroadcastJoinThreshold (it rides the mapInPandas
        closure — a broadcast-sized payload by design); (b) the corpus is
        scanned exactly ONCE regardless of needle count (per-needle work
        happens inside the one kernel pass); (c) planted needles come
        back correct while the non-matching bulk is prefilter-pruned —
        the realistic entity-dictionary regime (typo budget 0, rare-char
        needles reject before any DP). Wall growth in needles is printed
        as needles/sec and guarded only by a generous 4x-needles <= 10x
        -wall ratio (quadratic would be 16x): this host's ambient noise
        forbids tight wall asserts (BENCH.md convention).
        """
        import time

        from pyspark.sql import functions as F

        from frizbee_spark.operators.fuzzy import fuzzy_join

        n_docs = 25_000
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.concat(F.lit("w"),
                         (F.conv(F.substring(F.md5(F.concat(
                             F.col("id").cast("string"), F.lit(f"@{t}"))),
                             1, 8), 16, 10) % 50).cast("int"))
                for t in range(8)
            ]).alias("text"),
        )
        docs = docs.persist()
        docs.count()

        # 3 planted needles that DO occur + 9,997 that cannot (digits 6-9
        # never appear after the vocab-50 'w' prefix tokens... they do as
        # token numbers; use chars absent from the corpus alphabet)
        planted_rows = docs.filter("doc_id IN (7, 42, 24999)").collect()
        needles = [(i, f"ZQX#{i}!") for i in range(9_997)]
        needles += [(10_000 + j, r["text"][:20])
                    for j, r in enumerate(planted_rows)]
        assert len(needles) == 10_000

        payload = sum(len(str(nid)) + len(ns.encode()) for nid, ns in needles)
        thresh = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                     .removesuffix("b"))
        assert payload < thresh, (payload, thresh)

        from frizbee_spark.constants import MatchConfig

        cfg = MatchConfig(max_typos=0)
        out = fuzzy_join(docs, needles, config=cfg, per_needle_limit=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # ONE pass over the corpus: a single scan node, no joins
        assert plan.count("InMemoryTableScan") + plan.count("Scan ") <= 2
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

        t0 = time.time()
        rows = out.collect()
        wall_10k = time.time() - t0
        # every planted needle found its source doc exactly
        got = {r["needle_id"]: r for r in rows if r["needle_id"] >= 10_000}
        assert len(got) == 3
        for j, r0 in enumerate(planted_rows):
            assert got[10_000 + j]["exact"] in (True, False)  # scored row
            assert got[10_000 + j]["doc_id"] == r0["doc_id"]
        # the non-matching bulk was pruned (no rows for unmatched needles)
        assert all(r["needle_id"] >= 10_000 for r in rows)

        t0 = time.time()
        fuzzy_join(docs, needles[:2_500], config=cfg,
                   per_needle_limit=3).count()
        wall_25 = time.time() - t0
        print(f"\nfuzzy_join envelope: 10k needles x {n_docs} docs in "
              f"{wall_10k:.1f}s = {10_000 / wall_10k:.0f} needles/sec "
              f"({10_000 * n_docs / wall_10k / 1e6:.1f}M needle-docs/sec); "
              f"2.5k needles {wall_25:.1f}s")
        assert wall_10k <= 10 * max(wall_25, 1.0), (wall_10k, wall_25)
        docs.unpersist()
