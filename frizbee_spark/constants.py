"""Scoring constants and configuration for the frizbee-spark engine.

Semantics (not code) derived from the reference implementation:
/root/reference/src/const.rs:1-11 (constant values) and
/root/reference/src/lib.rs:63-140 (Config / Scoring records).

All scores are conceptually u16 with *saturating* subtraction (clamped at
zero). We compute in int32 and clamp explicitly (NumPy wraps, it does not
saturate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- score constants (reference: src/const.rs:1-11) ---
MATCH_SCORE = 12
MISMATCH_PENALTY = 6
GAP_OPEN_PENALTY = 5
GAP_EXTEND_PENALTY = 1

PREFIX_BONUS = 12
OFFSET_PREFIX_BONUS = 8
DELIMITER_BONUS = 4
CAPITALIZATION_BONUS = 4
MATCHING_CASE_BONUS = 4
EXACT_MATCH_BONUS = 8

# Delimiter byte set (reference: src/lib.rs:136 and src/smith_waterman/greedy.rs:7;
# note the SIMD path at src/smith_waterman/simd/types.rs:64-69 drops ':' — we
# follow the scalar-reference semantics, which includes it).
DELIMITERS = b" /.,_-:"

# Max DP cells before routing to the greedy fallback
# (reference: src/one_shot/mod.rs:20-25 — 32 KiB of u16 cells).
SW_MAX_CELLS = 16 * 1024

# Length-bucket ladder for batching same-width haystacks
# (reference: src/one_shot/matcher.rs:115-132).
LENGTH_BUCKETS = (4, 8, 12, 16, 20, 24, 32, 48, 64, 96, 128, 160, 192, 224, 256, 384, 512)


@dataclass(frozen=True)
class Scoring:
    """Tunable scoring constants (reference: src/lib.rs:92-140)."""

    match_score: int = MATCH_SCORE
    mismatch_penalty: int = MISMATCH_PENALTY
    gap_open_penalty: int = GAP_OPEN_PENALTY
    gap_extend_penalty: int = GAP_EXTEND_PENALTY
    prefix_bonus: int = PREFIX_BONUS
    offset_prefix_bonus: int = OFFSET_PREFIX_BONUS
    delimiter_bonus: int = DELIMITER_BONUS
    capitalization_bonus: int = CAPITALIZATION_BONUS
    matching_case_bonus: int = MATCHING_CASE_BONUS
    exact_match_bonus: int = EXACT_MATCH_BONUS
    delimiters: bytes = DELIMITERS


@dataclass(frozen=True)
class MatchConfig:
    """Matcher configuration (reference: src/lib.rs:63-88).

    max_typos=None means "score everything"; max_typos=k keeps only
    matches whose typo-traceback count is <= k.
    """

    prefilter: bool = True
    max_typos: int | None = 0
    sort: bool = True
    scoring: Scoring = field(default_factory=Scoring)


DEFAULT_SCORING = Scoring()
DEFAULT_CONFIG = MatchConfig()
