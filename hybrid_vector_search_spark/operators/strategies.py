"""Composite search strategies (the reference's "physical plans", §2.4).

Each strategy answers: given a unit query vector, a filter dict, and K,
return the top-K ids by inner product among rows passing the filters —
plus an execution-stats record (§2.10 contract).

Strategy ↔ plan shape:

* ``exact`` / ``pre_filter`` (reference P1/P2, src/backends/exact.py:29-57,
  src/baselines/pre_filter.py:7-68): ``filter → score → TakeOrderedAndProject``.
  In Spark these are the *same* plan — Catalyst predicate pushdown makes
  "gather the allowed subset first" automatic; both names are kept for the
  stats contract. Scoring is float64 (reference oracle upcast).
* ``post_filter`` (reference P3, src/baselines/post_filter.py:17-109):
  ANN candidates over the full corpus via the IVF index, candidate ladder
  K′ ∈ (200, 500, 1000) with early stop, then filter candidates and keep
  the best K — see operators/ivf.py for the index.
* ``random`` (reference P4, src/backends/random.py:9-31): seeded sample,
  ignores filters (kept as the recall floor; reference quirk Q7).

Row counts ("scored_vectors") are captured with ``Observation`` metrics on
the scan — no second pass over the data.
"""

from __future__ import annotations

import time
import uuid
from abc import ABC, abstractmethod
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from hybrid_vector_search_spark.errors import ValidationError
from hybrid_vector_search_spark.functions.predicates import compile_filters
from hybrid_vector_search_spark.functions.vector import (
    dot_score_pandas_udf,
    ensure_unit_l2,
)
from hybrid_vector_search_spark.operators.topk import topk
from hybrid_vector_search_spark.sources.loaders import validate_K


class SearchBackend(ABC):
    """Common strategy API (reference: src/backend_interface.py:7-31).

    ``search`` returns ``(ids, stats)`` with ids ordered ``score DESC,
    id ASC``; ``plan`` returns the un-collected DataFrame for composition.
    """

    name: str = "abstract"

    def __init__(self, corpus: DataFrame, n: int | None = None, id_col: str = "id"):
        self.corpus = corpus
        self.id_col = id_col
        self.n = n if n is not None else corpus.count()

    @abstractmethod
    def plan(
        self, qvec: Sequence[float], filters: Mapping[str, Any] | None, k: int
    ) -> tuple[DataFrame, Observation | None]:
        """Build the (id, score) top-K DataFrame plan + optional row-count
        observation."""

    def search(
        self, qvec: Sequence[float], filters: Mapping[str, Any] | None, k: int
    ) -> tuple[list[int], dict[str, Any]]:
        validate_K(k, self.n)
        q = ensure_unit_l2(qvec)
        t0 = time.perf_counter()
        df, obs = self.plan(q, filters, k)
        rows = df.collect()
        latency_ms = (time.perf_counter() - t0) * 1000.0
        ids = [int(r[self.id_col]) for r in rows]
        scored = int(obs.get["n"]) if obs is not None else 0
        stats: dict[str, Any] = {
            "method": self.name,
            "K": k,
            "latency_ms": latency_ms,
            "scored_vectors": scored,
            "scores": [float(r["score"]) for r in rows],
        }
        note = self.compose_notes()
        if note:
            stats["notes"] = note
        return ids, stats

    def compose_notes(self, base: str | None = None) -> str | None:
        """Join a strategy's own notes with the K6 fallback provenance
        (set by ``load_corpus_index`` when this backend was landed via the
        chain) — subclasses that build their own ``notes`` route it
        through here so the fallback record survives."""
        fb = getattr(self, "fallback_note", None)
        parts = [p for p in (base, fb) if p]
        return "; ".join(parts) or None


#: filter-dict key → the column it actually constrains (geo box keys
#: bind the fixed latitude/longitude pair, everything else is itself)
_GEO_KEY_COLS = {"lat_between": "latitude", "lon_between": "longitude"}


def split_filters_by_side(
    filters: Mapping[str, Any] | None, emb_cols: Sequence[str]
) -> tuple[dict, dict]:
    """Partition a filter dict into (embeddings-side, metadata-side)
    conjunct dicts by column ownership. Every predicate op is null-fail
    (functions/predicates.py `_null_fail`), so splitting a conjunction
    across a LEFT join's sides and semi-joining the metadata survivors
    is exactly equivalent to filtering the joined frame."""
    emb_f: dict[str, Any] = {}
    meta_f: dict[str, Any] = {}
    cols = set(emb_cols)
    for key, ops in (filters or {}).items():
        target = _GEO_KEY_COLS.get(key, key)
        (emb_f if target in cols else meta_f)[key] = ops
    return emb_f, meta_f


class ExactBackend(SearchBackend):
    """P1: filter → float64 exact IP scoring → top-K. Serves as the
    correctness oracle (reference src/backends/exact.py:29-57).

    Scoring is the JVM expression (functions/vector.py dot_score_column,
    no Python worker in the plan): a single-query scan pays an Arrow
    transfer of the whole embedding column under the pandas-UDF kernel,
    which the r7 profile measured as the dominant term (exact 516→295 ms,
    strict pre_filter 351→60 ms at the reference shape).

    Narrow-join shape: when the corpus handle carries its un-joined
    sides (sources/loaders.py `load_corpus`) and the predicate touches
    metadata columns, the plan scores ``(id, score)`` on the embeddings
    side and LEFT-SEMI-joins the metadata-filtered id set — the wide
    embedding array never crosses the join, so join traffic is ~16 B/row
    instead of ~1.5 KB/row at D=384 (the shape that survives a 100-TB
    corpus where neither side is broadcastable; the reference's
    in-process equivalent is the zero-movement ``vectors[allowed]``
    gather, src/baselines/pre_filter.py:49-52)."""

    name = "exact"

    def plan(self, qvec, filters, k):
        from hybrid_vector_search_spark.functions.vector import (
            dot_score_column,
        )

        # validate against the FULL corpus schema first: unknown columns
        # must hard-error identically in both shapes
        pred = compile_filters(self.corpus.schema, filters)
        obs = Observation(f"scored_{uuid.uuid4().hex[:8]}")
        emb = getattr(self.corpus, "_hvs_emb_side", None)
        meta = getattr(self.corpus, "_hvs_meta_side", None)
        if emb is not None and meta is not None and filters:
            emb_f, meta_f = split_filters_by_side(filters, emb.columns)
            if meta_f:
                allowed = meta.filter(
                    compile_filters(meta.schema, meta_f)
                ).select(self.id_col)
                base = emb
                if emb_f:
                    base = base.filter(compile_filters(emb.schema, emb_f))
                scored = (
                    base.join(allowed, self.id_col, "left_semi")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .select(
                        F.col(self.id_col),
                        dot_score_column(qvec).alias("score"),
                    )
                )
                return topk(scored, k, id_col=self.id_col), obs
        scored = (
            self.corpus.filter(pred)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .select(
                F.col(self.id_col),
                dot_score_column(qvec).alias("score"),
            )
        )
        return topk(scored, k, id_col=self.id_col), obs


class PreFilterBackend(ExactBackend):
    """P2: identical Spark plan to P1 (predicate pushdown is free); the name
    is kept for the stats contract (reference src/baselines/pre_filter.py)."""

    name = "pre_filter"


class RandomBackend(SearchBackend):
    """P4: seeded random K ids; ignores filters and reports
    ``scored_vectors = 0`` — the recall floor (reference quirk Q7,
    src/backends/random.py:9-31: ``default_rng(0).choice`` — a seeded
    uniform draw).

    The draw is expressed as an order over ``md5(seed ∥ id)`` — uniform
    like the reference's rng, but a pure function of (seed, id):
    reproducible on ANY cluster shape (``F.rand`` output depends on the
    partition layout) and replayable by the ANSI-SQL oracle, which is
    what lets the driver value-hash this baseline."""

    name = "random"

    def __init__(self, corpus, n=None, id_col="id", seed: int = 0):
        super().__init__(corpus, n, id_col)
        self.seed = seed

    def _draw_key(self) -> F.Column:
        from hybrid_vector_search_spark.operators.sampling import (
            portable_hash_key,
        )

        return portable_hash_key(
            F.concat(
                F.lit(f"rnd{self.seed}:"), F.col(self.id_col).cast("string")
            )
        )

    def plan(self, qvec, filters, k):
        df = (
            self.corpus.select(self.id_col)
            .orderBy(self._draw_key().asc(), F.col(self.id_col).asc())
            .limit(k)
            .withColumn("score", F.lit(0.0))
        )
        return df, None

    def search(self, qvec, filters, k):
        ids, stats = super().search(qvec, filters, k)
        stats["scored_vectors"] = 0
        return ids, stats


def get_backend(
    name: str,
    corpus: DataFrame,
    n: int | None = None,
    **kwargs: Any,
) -> SearchBackend:
    """Strategy registry (reference P5: src/harness/run.py:71-87)."""
    # imported here to avoid a hard cycle: ivf/lsh build on strategies' helpers
    from hybrid_vector_search_spark.operators.ivf import PostFilterBackend
    from hybrid_vector_search_spark.operators.lsh import LSHPostFilterBackend

    registry: dict[str, type[SearchBackend]] = {
        "exact": ExactBackend,
        "pre_filter": PreFilterBackend,
        "post_filter": PostFilterBackend,
        "post_filter_lsh": LSHPostFilterBackend,
        "random": RandomBackend,
    }
    if name not in registry:
        raise ValidationError(
            f"unknown backend '{name}' (choose from {sorted(registry)})"
        )
    return registry[name](corpus, n, **kwargs)


def choose_backend_costed(
    stats: Mapping[str, Mapping[str, Any]],
    filters: Mapping[str, Any] | None,
    nprobe: int,
    nlist: int,
) -> tuple[str, int]:
    """Cost-based pre_filter vs post_filter choice from column
    statistics — the reference's MANUAL ``--backend`` flag
    (src/harness/run.py:71-87) made into a planner decision, extending
    the stats-fed ladder entry (functions/colstats.py, VERDICT r8 next
    #7) one level up: not just *where to enter* the post-filter ladder
    but *whether to run it at all*.

    Cost model in scored vectors — each strategy's dominant term:

    * pre_filter scores exactly the |allowed| rows passing the filters
      (estimated from the same System-R arithmetic the ladder entry
      uses: ``estimate_allowed``);
    * post_filter's probe scores ≈ N·nprobe/nlist rows (the probed
      fraction of the corpus — bytes read ∝ nprobe/nlist on the
      persisted layout).

    Pick pre_filter iff ``est·nlist < N·nprobe`` — integer arithmetic
    with no floats beyond the estimate itself, so an ANSI-SQL oracle
    replays the whole decision. A wrong estimate degrades COST only,
    never correctness: both strategies return exact top-K over their
    candidate sets; pre_filter is always exact, and post_filter's
    ladder escalates until K survivors. Returns ``(backend_name,
    estimated_allowed)``."""
    from hybrid_vector_search_spark.functions.colstats import (
        estimate_allowed,
    )

    est = estimate_allowed(stats, filters)
    n = int(stats["__table__"]["count"])
    name = "pre_filter" if est * nlist < n * nprobe else "post_filter"
    return name, est


def load_corpus_index(
    corpus: DataFrame,
    n: int | None = None,
    prefer_ivf: bool = True,
    nlist: int | None = None,
    nprobe: int | None = None,
    id_col: str = "id",
) -> SearchBackend:
    """K6 index fallback chain (reference ``load_vectors_index``,
    src/dataio/loaders.py:176-218: IVF preferred → HNSW → Exact).

    Spark chain: IVF (MLlib KMeans post_filter) preferred; HNSW
    (per-partition graphs, operators/hnsw.py — the reference's second
    rung) when the IVF build is unavailable; LSH as a further stateless
    fallback; exact as the floor. The chain never raises for a missing
    ANN dependency: each rung's build is attempted eagerly so a failure
    falls through *here*, not mid-query, and the landed rung is recorded
    in ``backend.fallback_note`` (surfaced in the §2.10 ``notes`` stats
    field by ``search``)."""
    from hybrid_vector_search_spark.operators.ivf import (
        DEFAULT_NPROBE,
        PostFilterBackend,
    )
    from hybrid_vector_search_spark.operators.lsh import LSHPostFilterBackend

    if prefer_ivf:
        try:
            backend: SearchBackend = PostFilterBackend(
                corpus, n, id_col=id_col, nlist=nlist,
                nprobe=nprobe if nprobe is not None else DEFAULT_NPROBE,
            )
            backend.index  # build eagerly: fall through HERE on failure
            return backend
        except Exception as e:  # noqa: BLE001 — any build failure falls through
            note = f"ivf unavailable ({type(e).__name__}); fell back"
        else:  # pragma: no cover
            note = ""
    else:
        note = "ivf skipped (prefer_ivf=False)"
    try:
        from hybrid_vector_search_spark.operators.hnsw import HNSWBackend

        backend = HNSWBackend(corpus, n, id_col=id_col)
        backend.fallback_note = f"{note} to hnsw"
        return backend
    except Exception as e:  # noqa: BLE001
        note = f"{note} to hnsw ({type(e).__name__})"
    try:
        backend = LSHPostFilterBackend(corpus, n, id_col=id_col)
        backend.planes  # eager hyperplane build — same fall-through contract
        backend.fallback_note = f"{note} to lsh"
        return backend
    except Exception as e:  # noqa: BLE001
        backend = ExactBackend(corpus, n, id_col=id_col)
        backend.fallback_note = f"{note} to lsh ({type(e).__name__}) to exact"
        return backend


def get_index_params(index: Any) -> dict[str, Any]:
    """K7 introspection (reference ``get_index_params``, src/dataio/
    loaders.py:220-232): a small dict describing the ANN configuration,
    ``{"type": "exact"}`` when the object carries no ANN state. Accepts
    either a backend or a bare index object."""
    from hybrid_vector_search_spark.operators.hnsw import HNSWBackend
    from hybrid_vector_search_spark.operators.ivf import IVFIndex, PostFilterBackend
    from hybrid_vector_search_spark.operators.lsh import LSHPostFilterBackend

    try:
        if isinstance(index, PostFilterBackend):
            # introspect only already-built state: touching .index would
            # lazily trigger a full KMeans build — an expensive side
            # effect for a read-only helper (ADVICE r2 #3). Before the
            # first search, report the configured nlist, or — when it is
            # auto-sized at build time — the value the auto-size formula
            # will pick, so callers always see an int (the reference
            # contract: nlist is never null — ADVICE r3 #2).
            from hybrid_vector_search_spark.operators.ivf import default_nlist

            built = index._index
            nlist = built.nlist if built is not None else index._nlist
            if nlist is None:
                nlist = default_nlist(index.n)
            return {
                "type": "ivfflat",
                "nlist": int(nlist),
                "nprobe": int(index.nprobe),
            }
        if isinstance(index, IVFIndex):
            return {"type": "ivfflat", "nlist": int(index.nlist)}
        if isinstance(index, HNSWBackend):
            # reference shape: {"type": "hnsw", "ef_search": N}
            # (src/dataio/loaders.py:226-227)
            return {"type": "hnsw", "ef_search": int(index.ef_search)}
        if isinstance(index, LSHPostFilterBackend):
            return {
                "type": "lsh",
                "nbits": int(index.nbits),
                "radius_ladder": list(index.radius_ladder),
            }
    except Exception:  # pragma: no cover — mirror the reference's tolerance
        pass
    return {"type": "exact"}
