"""Chained-BPE merge application (functions/text.py r15): the Arrow
kernel must be BIT-IDENTICAL to the engine's chained literal-replace
semantics (the form text_bpe_merges trains under and the DuckDB oracle
replays) on every input, including the adversarial shapes — overlapping
self-pairs, later merges creating earlier-rank pairs (chained semantics
must NOT revisit them), and the blocked-pair rule (a match consumes its
trailing delimiter, so ' a b a b ' -> ' ab a b ', never ' ab ab ')."""

import random

from hybrid_vector_search_spark.functions.text import bpe_chained_encode


def _brute(text: str, merges) -> list[str]:
    s = " " + text + " "
    for lhs, rhs in merges:
        s = s.replace(f" {lhs} {rhs} ", f" {lhs}_{rhs} ")
    return s.split()


def _kernel(text: str, merges) -> list[str]:
    rank_of = {}
    for p in merges:
        rank_of.setdefault(tuple(p), len(rank_of))
    pair_at = [p for p, _ in sorted(rank_of.items(), key=lambda kv: kv[1])]
    return bpe_chained_encode(text.split(), rank_of, pair_at)


def test_blocked_pair_rule():
    assert _kernel("a b a b", [("a", "b")]) == ["a_b", "a", "b"]
    assert _kernel("a b a b a b", [("a", "b")]) == ["a_b", "a", "b", "a_b"]
    assert _kernel("a a a a", [("a", "a")]) == ["a_a", "a", "a"]


def test_no_rank_revisit():
    # merge 1 = (ab, c) runs BEFORE merge 2 = (a, b) creates 'a_b';
    # chained semantics must not then apply merge 1 to the new pair
    merges = [("a_b", "c"), ("a", "b")]
    text = "a b c"
    assert _kernel(text, merges) == _brute(text, merges) == ["a_b", "c"]


def test_duplicate_pair_keeps_first_rank():
    merges = [("a", "b"), ("x", "y"), ("a", "b")]
    text = "a b x y"
    assert _kernel(text, merges) == _brute(text, merges)


def test_randomized_parity_with_chained_replace():
    rng = random.Random(7)
    alpha = ["a", "b", "c", "d", "e"]
    for trial in range(200):
        n = rng.randint(1, 24)
        text = " ".join(rng.choice(alpha) for _ in range(n))
        merges = []
        # adversarial table: single chars, merged symbols, self-pairs
        symbols = list(alpha)
        for _ in range(rng.randint(1, 30)):
            lhs, rhs = rng.choice(symbols), rng.choice(symbols)
            merges.append((lhs, rhs))
            symbols.append(lhs + "_" + rhs)
        assert _kernel(text, merges) == _brute(text, merges), (
            trial, text, merges,
        )


def test_inapplicable_merges_cost_nothing():
    # table size 100k, none applicable: the kernel must stay O(word)
    merges = [(f"z{i}", f"q{i}") for i in range(100_000)]
    assert _kernel("a b c", merges) == ["a", "b", "c"]
