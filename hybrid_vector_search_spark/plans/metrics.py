"""Evaluation metrics (reference A1/A2, src/eval/metrics.py + harness).

``recall_at_k`` divides by K even when the allowed universe holds fewer
than K rows — max recall < 1 under ultra-strict filters. That is the
reference's graded metric (quirk Q6, metrics.py:13-18); replicated exactly.
"""

from __future__ import annotations

from collections.abc import Sequence


def recall_at_k(pred_ids: Sequence[int], oracle_ids: Sequence[int], k: int) -> float:
    """|pred[:K] ∩ oracle[:K]| / K — denominator always K (quirk Q6)."""
    if k <= 0:
        return 0.0
    return len(set(pred_ids[:k]) & set(oracle_ids[:k])) / float(k)


def selectivity(allowed_count: int, n: int) -> float:
    """|allowed| / N (reference A2: src/harness/run.py:169-170)."""
    return allowed_count / float(n) if n else 0.0
