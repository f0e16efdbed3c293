"""Canonical query set over the driver testdata corpus.

The reference hard-codes 10 selectivity-stratified queries
(artifacts/artifacts.py:197-208): strict (~0.1-1.5%), medium (~2-15%),
broad (10-100%). This is the same stratification expressed over the
synthetic corpus's filterable columns (label, lang, source, n_chars, text
— FIXTURES.md §4). Query vectors are seeded (queryvecs.query_vector), not
model-embedded — testdata ships pre-computed embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class CanonicalQuery:
    qid: int
    seed: int
    filters: dict[str, Any] = field(default_factory=dict)
    k: int = 10
    label: str = "broad"


CANONICAL_QUERIES: tuple[CanonicalQuery, ...] = (
    # strict: conjunctions cutting to ~0.1-2%
    CanonicalQuery(1, 101, {"label": {"eq": 0}, "lang": {"eq": "zh"}, "n_chars": {"le": 600}}, 10, "strict"),
    CanonicalQuery(2, 102, {"label": {"in": [7]}, "source": {"in": ["src1", "src2"]}}, 10, "strict"),
    CanonicalQuery(3, 103, {"lang": {"eq": "de"}, "n_chars": {"between": [100, 400]}}, 10, "strict"),
    # medium: ~2-15%
    CanonicalQuery(4, 104, {"label": {"in": [1, 2]}}, 10, "medium"),
    CanonicalQuery(5, 105, {"lang": {"eq": "es"}}, 10, "medium"),
    # r11: was {"text": {"like": "lorem"}} — a token absent from the
    # testdata vocabulary at EVERY sf, so qid 6's universe was empty and
    # the parity recall table had to exclude it (BASELINE_PARITY.md r10
    # footnote). "spark" ∧ lang=fr ∧ n_chars≥200 lands at 9-11% across
    # sf0.001/0.01/0.1 and the tiled parity corpus — a real medium-
    # stratum LIKE query with a non-empty universe everywhere.
    CanonicalQuery(6, 106, {"text": {"like": "spark"}, "lang": {"eq": "fr"}, "n_chars": {"ge": 200}}, 10, "medium"),
    # broad: 10-100%
    CanonicalQuery(7, 107, {"lang": {"in": ["en", "es", "fr"]}}, 10, "broad"),
    CanonicalQuery(8, 108, {"n_chars": {"ge": 100}}, 10, "broad"),
    CanonicalQuery(9, 109, {"label": {"between": [0, 7]}}, 10, "broad"),
    CanonicalQuery(10, 110, {}, 10, "broad"),
)
