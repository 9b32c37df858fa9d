"""Golden-score tests for the scalar Smith-Waterman oracle.

Expected values are algebraic expressions over the scoring constants, not
magic numbers — the reference project's own test style
(/root/reference/src/smith_waterman/reference/algorithm.rs:137-215,
 reference/typos.rs:78-94, reference/indices.rs:95-143,
 greedy.rs:116-200).
"""

import pytest

from frizbee_spark.constants import (
    CAPITALIZATION_BONUS,
    DELIMITER_BONUS,
    EXACT_MATCH_BONUS,
    GAP_EXTEND_PENALTY,
    GAP_OPEN_PENALTY,
    MATCH_SCORE,
    MATCHING_CASE_BONUS,
    OFFSET_PREFIX_BONUS,
    PREFIX_BONUS,
)
from frizbee_spark.functions.oracle import (
    indices_from_score_matrix,
    match_greedy,
    prefilter_subsequence,
    prefilter_subsequence_insensitive,
    prefilter_typos,
    self_score,
    smith_waterman,
    typos_from_score_matrix,
)

CHAR = MATCH_SCORE + MATCHING_CASE_BONUS


def score(needle, haystack):
    return smith_waterman(needle, haystack)[0]


def typos(needle, haystack):
    _, m, _ = smith_waterman(needle, haystack)
    return typos_from_score_matrix(m)


def indices(needle, haystack):
    _, m, _ = smith_waterman(needle, haystack)
    return indices_from_score_matrix(m)


class TestScore:
    def test_basic(self):
        assert score("b", "abc") == CHAR
        assert score("c", "abc") == CHAR

    def test_prefix(self):
        assert score("a", "abc") == CHAR + PREFIX_BONUS
        assert score("a", "aabc") == CHAR + PREFIX_BONUS
        assert score("a", "babc") == CHAR

    def test_offset_prefix(self):
        assert score("a", "-a") == CHAR + OFFSET_PREFIX_BONUS
        assert score("-a", "-ab") == 2 * CHAR + PREFIX_BONUS
        assert score("a", "'a") == CHAR + OFFSET_PREFIX_BONUS
        assert score("a", "Ba") == CHAR

    def test_exact_match(self):
        assert score("a", "a") == CHAR + EXACT_MATCH_BONUS + PREFIX_BONUS
        assert score("abc", "abc") == 3 * CHAR + EXACT_MATCH_BONUS + PREFIX_BONUS
        assert score("ab", "abc") == 2 * CHAR + PREFIX_BONUS
        assert score("abc", "ab") == 2 * CHAR + PREFIX_BONUS
        assert smith_waterman("abc", "abc")[2] is True
        assert smith_waterman("ab", "abc")[2] is False

    def test_delimiter(self):
        assert score("-", "a--bc") == CHAR
        assert score("b", "a-b") == CHAR + DELIMITER_BONUS
        assert score("a", "a-b-c") == CHAR + PREFIX_BONUS
        assert score("b", "a--b") == CHAR + DELIMITER_BONUS
        assert score("c", "a--bc") == CHAR
        assert score("a", "-a--bc") == CHAR + OFFSET_PREFIX_BONUS

    def test_no_delimiter_bonus_for_delimiter_chars(self):
        assert score("-", "a-bc") == CHAR
        assert score("-", "a--bc") == CHAR
        assert score("a_b", "a_bb") > score("a_b", "a__b")

    def test_affine_gap(self):
        assert score("test", "Uterst") == 4 * CHAR - GAP_OPEN_PENALTY
        assert score("test", "Uterrst") == 4 * CHAR - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY

    def test_capital_bonus(self):
        assert score("a", "A") == MATCH_SCORE + PREFIX_BONUS
        assert score("A", "Aa") == CHAR + PREFIX_BONUS
        assert score("D", "forDist") == CHAR + CAPITALIZATION_BONUS
        assert score("D", "foRDist") == CHAR
        assert score("D", "FOR_DIST") == CHAR + DELIMITER_BONUS

    def test_prefix_beats_delimiter(self):
        assert score("swap", "swap(test)") > score("swap", "iter_swap(test)")
        assert score("_", "_private_member") > score("_", "public_member")


class TestTypos:
    @pytest.mark.parametrize(
        "needle,haystack,expected",
        [
            ("a", "abc", 0),
            ("b", "abc", 0),
            ("c", "abc", 0),
            ("ac", "abc", 0),
            ("d", "abc", 1),
            ("da", "abc", 1),
            ("dc", "abc", 1),
            ("ad", "abc", 1),
            ("adc", "abc", 1),
            ("add", "abc", 2),
            ("ddd", "abc", 3),
            ("ddd", "", 3),
            ("d", "", 1),
        ],
    )
    def test_typo_counts(self, needle, haystack, expected):
        assert typos(needle, haystack) == expected


class TestIndices:
    def test_basic(self):
        assert indices("", "abc") == []
        assert indices("b", "abc") == [1]
        assert indices("c", "abc") == [2]

    def test_prefix(self):
        assert indices("a", "abc") == [0]
        assert indices("a", "aabc") == [0]
        assert indices("a", "babc") == [1]

    def test_exact(self):
        assert indices("a", "a") == [0]
        assert indices("abc", "abc") == [0, 1, 2]
        assert indices("ab", "abc") == [0, 1]

    def test_delimiter(self):
        assert indices("b", "a-b") == [2]
        assert indices("a", "a-b-c") == [0]
        assert indices("b", "a--b") == [3]
        assert indices("c", "a--bc") == [4]

    def test_affine_gap(self):
        assert indices("test", "Uterst") == [1, 2, 4, 5]
        assert indices("test", "Uterrst") == [1, 2, 5, 6]
        assert indices("test", "Uterrs t") == [1, 2, 5, 7]

    def test_capital(self):
        assert indices("a", "A") == [0]
        assert indices("A", "Aa") == [0]
        assert indices("D", "forDist") == [3]

    def test_typo_indices(self):
        assert indices("b", "a") == []
        assert indices("reba", "repack") == [0, 1, 3]
        assert indices("bbb", "abc") == [1]


class TestGreedy:
    def g(self, needle, haystack):
        return match_greedy(needle, haystack)[0]

    def test_basic(self):
        assert self.g("b", "abc") == CHAR
        assert self.g("c", "abc") == CHAR
        assert self.g("fbb", "barbazfoobarbaz") == (
            CHAR - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
            + CHAR - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY
            + CHAR
        )

    def test_no_match(self):
        assert self.g("a", "b") == 0
        assert self.g("ab", "ba") == 0

    def test_prefix(self):
        assert self.g("a", "abc") == CHAR + PREFIX_BONUS
        assert self.g("a", "aabc") == CHAR + PREFIX_BONUS
        assert self.g("a", "babc") == CHAR

    def test_exact(self):
        assert self.g("a", "a") == CHAR + EXACT_MATCH_BONUS + PREFIX_BONUS
        assert self.g("abc", "abc") == 3 * CHAR + EXACT_MATCH_BONUS + PREFIX_BONUS

    def test_delimiter(self):
        assert self.g("-", "a--bc") == CHAR
        assert self.g("b", "a-b") == CHAR + DELIMITER_BONUS
        assert self.g("a", "a-b-c") == CHAR + PREFIX_BONUS
        assert self.g("b", "a--b") == CHAR + DELIMITER_BONUS
        assert self.g("c", "a--bc") == CHAR
        assert self.g("a", "-a--bc") == CHAR

    def test_affine_gap(self):
        assert self.g("test", "Uterst") == 4 * CHAR - GAP_OPEN_PENALTY
        assert self.g("test", "Uterrst") == 4 * CHAR - GAP_OPEN_PENALTY - GAP_EXTEND_PENALTY

    def test_capital(self):
        assert self.g("d", "forDist") == MATCH_SCORE + CAPITALIZATION_BONUS
        assert self.g("D", "forDist") == CHAR + CAPITALIZATION_BONUS
        assert self.g("D", "foRDist") == CHAR
        assert self.g("D", "FOR_DIST") == CHAR + DELIMITER_BONUS


class TestPrefilter:
    def test_ordered(self):
        assert prefilter_subsequence("abc", "a-b-c")
        assert not prefilter_subsequence("abc", "acb")
        assert not prefilter_subsequence("abc", "ab")

    def test_insensitive(self):
        assert prefilter_subsequence_insensitive("ABC", "a-b-c")
        assert not prefilter_subsequence_insensitive("abc", "ACB")

    def test_typos(self):
        assert prefilter_typos("abc", "ab", 1)
        assert not prefilter_typos("abc", "ab", 0)
        assert prefilter_typos("xyz", "abc", 3)
        assert not prefilter_typos("xyz", "abc", 2)


class TestSelfScore:
    @pytest.mark.parametrize(
        "text",
        ["a", "abc", "hello_world", "Hello World", "a--b", "-ab", "fooBarBaz",
         "path/to/some_file.txt:12", "UPPER lower MiXeD"],
    )
    def test_matches_dp(self, text):
        assert self_score(text) == smith_waterman(text, text)[0]


class TestScoreInvariants:
    """Behavioral orderings from the reference suite
    (algorithm.rs:286-304), asserted on BOTH the scalar oracle and the
    batched wavefront kernel."""

    def _score(self, needle, haystack):
        from frizbee_spark.functions.oracle import smith_waterman
        from frizbee_spark.functions.wavefront import sw_batch

        s_scalar, _, _ = smith_waterman(needle, haystack)
        s_batch, _, _ = sw_batch([needle.encode()], [haystack.encode()],
                                 compute_typos=False)
        assert s_scalar == int(s_batch[0])
        return s_scalar

    def test_prefix_beats_delimiter(self):
        assert self._score("swap", "swap(test)") > self._score("swap", "iter_swap(test)")
        assert self._score("_", "_private_member") > self._score("_", "public_member")

    def test_prefix_beats_capitalization(self):
        assert self._score("H", "HELLO") > self._score("H", "fooHello")

    def test_continuous_beats_delimiter(self):
        assert self._score("foo", "fooo") > self._score("foo", "f_o_o_o")

    def test_continuous_beats_capitalization(self):
        assert self._score("fo", "foo") > self._score("fo", "faOo")
