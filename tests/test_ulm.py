"""Unigram-LM tokenizer tests (operators/ulm.py, queries_ulm.py)."""

import math

from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.ulm import (
    MAX_PIECE_LEN,
    MISSING_SCORE,
    _viterbi_path,
    round_half_away,
    ulm_fit,
)


def _brute_best(word, scores, max_len):
    """Independent segmentation reference: enumerate EVERY segmentation
    (pieces of length 1..max_len), score by plain sum, and pick the
    maximum with the DP's tie rule — among equal-score segmentations
    the one whose piece-length sequence is lexicographically largest
    read from the END (the per-position prefer-longer-k backtrack).
    Scores in the tests live on a 0.25 grid so every sum is exact and
    float addition order cannot blur the argmax."""
    best = None
    def rec(i, acc, pieces):
        nonlocal best
        if i == 0:
            # `pieces` accumulates from the END of the word inward, so
            # it is ALREADY last-piece-first — exactly the order the
            # backtrack tie rule compares in
            key = (acc, tuple(len(p) for p in pieces))
            if best is None or key > best[0]:
                best = (key, list(reversed(pieces)))
            return
        for k in range(1, min(max_len, i) + 1):
            p = word[i - k:i]
            rec(i - k, acc + scores.get(p, MISSING_SCORE), pieces + [p])
    rec(len(word), 0.0, [])
    return best[1]


def test_viterbi_matches_bruteforce_property():
    """Random words over a 3-letter alphabet, random 0.25-grid scores
    over a random subset of substrings: the DP must return exactly the
    brute-force optimum under the shared tie rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word_st = st.text(alphabet="abc", min_size=1, max_size=9)

    @settings(max_examples=200, deadline=None)
    @given(word_st, st.data())
    def check(word, data):
        subs = sorted({word[i:j]
                       for i in range(len(word))
                       for j in range(i + 1, min(i + MAX_PIECE_LEN,
                                                 len(word)) + 1)})
        # always score single chars (coverage), randomly score the rest
        scores = {}
        for s in subs:
            if len(s) == 1 or data.draw(st.booleans()):
                scores[s] = data.draw(
                    st.integers(-40, 0).map(lambda v: v * 0.25))
        got = _viterbi_path(word, scores, MAX_PIECE_LEN)
        want = _brute_best(word, scores, MAX_PIECE_LEN)
        assert got == want, (word, scores, got, want)
        assert "".join(got) == word

    check()


def test_round_half_away_scalar_matches_column_kernel():
    assert round_half_away(0.0000005, 6) == 1e-6
    assert round_half_away(-0.0000005, 6) == -1e-6
    assert round_half_away(0.0, 6) == 0.0
    assert round_half_away(1.2345675, 6) == round_half_away(1.2345675, 6)


def test_ulm_fit_trajectory_invariants(spark):
    """Fixed tiny corpus: single chars survive every prune; the
    multi-char piece count follows the schedule cap; scores are
    normalized log-probs (all negative, finite); segmentations cover
    each word exactly (encode token counts bounded by chars)."""
    words = spark.createDataFrame(
        [("banana", 5), ("bandana", 3), ("ananas", 2), ("nab", 7)],
        "word string, cnt long",
    )
    traj, scores = ulm_fit(words, schedule=(6, 4))
    by_step = {}
    for step, piece, n, score in traj:
        by_step.setdefault(step, {})[piece] = (n, score)
        assert score < 0 and math.isfinite(score)
        assert n >= 0
    singles = {p for p in by_step[0] if len(p) == 1}
    assert singles == set("bandas")
    for step in (1, 2):
        assert {p for p in by_step[step] if len(p) == 1} == singles
        assert len([p for p in by_step[step] if len(p) >= 2]) <= (6, 4)[
            step - 1]
    # final model segments every training word exactly
    for w in ("banana", "bandana", "ananas", "nab"):
        seg = _viterbi_path(w, scores, 4)
        assert "".join(seg) == w
        assert all(p in scores for p in seg)
