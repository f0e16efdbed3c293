"""Sign-random-projection LSH for cosine ANN — the bucketed scale path
alternative to the IVF index (operators/ivf.py).

The reference's only ANN structures are FAISS IVF/HNSW
(src/dataio/loaders.py:106-163); an LSH family is the other standard
filtered-ANN building block a Spark engine wants, because candidate
generation becomes *relational*: bucket assignment is a map-side column,
probing is a partition-prunable ``IN`` filter, and near-dup candidate
pairs are a bucket equi-join (operators/dedup.py uses the same idea with
MinHash bands for Jaccard).

Scheme: ``NBITS`` fixed hyperplanes (deterministic seeds shared with the
DuckDB oracle); ``bucket(v) = Σ_i [v·h_i > 0] · 2^i``. Unit-norm vectors
with equal sign patterns are cosine-close with high probability.
Querying probes the query's bucket plus all buckets within Hamming
distance ``probe_hamming`` (multi-probe LSH: recall without more tables).

At 100 TB: materialize ``bucket`` at ingest and ``partitionBy("bucket")``
(or bucketBy) so a probe reads only probed partitions — identical I/O
shape to the IVF lists, but index "build" is a stateless map (no KMeans
training job) and buckets are stable under appends. NBITS sizes buckets:
N/2^NBITS rows per bucket on average; pick NBITS ≈ log2(N / target).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hybrid_vector_search_spark.functions.vector import dot_score_pandas_udf
from hybrid_vector_search_spark.operators.topk import topk
from hybrid_vector_search_spark.queryvecs import query_vector, sql_array_literal

# Hyperplane seeds are offset so they never collide with query seeds.
_HYPERPLANE_SEED_BASE = 1009
DEFAULT_NBITS = 4


def hyperplanes(nbits: int = DEFAULT_NBITS, dim: int = 64) -> np.ndarray:
    """(nbits, dim) float64 unit hyperplanes, deterministic."""
    return np.vstack(
        [query_vector(_HYPERPLANE_SEED_BASE + i, dim) for i in range(nbits)]
    )


def bucket_udf(planes: np.ndarray):
    """Pandas UDF: embedding → LSH bucket id. One ``batch @ H.T`` GEMM per
    Arrow batch, sign bits packed into an int."""
    H = planes.astype(np.float64)
    weights = (1 << np.arange(H.shape[0])).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def _bucket(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            if len(batch) == 0:
                yield pd.Series([], dtype="int64")
                continue
            mat = np.vstack(batch.to_numpy()).astype(np.float64, copy=False)
            bits = (mat @ H.T) > 0.0
            yield pd.Series(bits @ weights)

    return _bucket


def bucket_of(vec: Sequence[float], planes: np.ndarray) -> int:
    """Driver-side bucket id of a single vector."""
    v = np.asarray(vec, dtype=np.float64).reshape(-1)
    bits = (planes @ v) > 0.0
    return int(bits @ (1 << np.arange(len(planes))))

def probe_set(vec: Sequence[float], planes: np.ndarray, probe_hamming: int = 1) -> list[int]:
    """Multi-probe bucket ids: the query's bucket plus every bucket within
    the given Hamming distance (flip up to that many sign bits)."""
    base = bucket_of(vec, planes)
    nbits = len(planes)
    out = {base}
    for d in range(1, probe_hamming + 1):
        for idxs in combinations(range(nbits), d):
            m = 0
            for i in idxs:
                m |= 1 << i
            out.add(base ^ m)
    return sorted(out)


def lsh_topk_plan(
    corpus: DataFrame,
    qvec: Sequence[float],
    k: int,
    nbits: int = DEFAULT_NBITS,
    probe_hamming: int = 1,
    id_col: str = "id",
) -> tuple[DataFrame, list[int]]:
    """ANN top-K via LSH bucket pruning: assign buckets (map-side),
    keep rows in the probed buckets, exact float64 rescoring within,
    ``TakeOrderedAndProject`` for the final K. Returns (plan, probed)."""
    planes = hyperplanes(nbits, dim=len(np.asarray(qvec).reshape(-1)))
    probes = probe_set(qvec, planes, probe_hamming)
    bucketed = corpus.withColumn("bucket", bucket_udf(planes)(F.col("embedding")))
    scored = (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            dot_score_pandas_udf(qvec)(F.col("embedding")).alias("score"),
        )
    )
    return topk(scored, k, id_col=id_col), probes


def bucket_sql_expr(planes: np.ndarray, emb: str = "embedding") -> str:
    """DuckDB mirror of :func:`bucket_udf` — CASE sign bits over
    ``list_dot_product`` with the literal hyperplanes."""
    terms = " + ".join(
        f"(CASE WHEN list_dot_product({emb}::DOUBLE[], "
        f"{sql_array_literal(planes[i])}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes))
    )
    return f"({terms})"


from hybrid_vector_search_spark.operators.strategies import (  # noqa: E402
    SearchBackend,
)


class LSHPostFilterBackend(SearchBackend):
    """P3-shaped strategy on LSH buckets: rows in the probed buckets are
    scored, semi-joined against the allowed-id set, and the probe radius
    escalates (Hamming 0 → 1 → 2) until ≥K survivors — the LSH analogue
    of the reference's K′ ladder (src/baselines/post_filter.py:66-87),
    with probe radius instead of candidate count as the widening knob.

    Emits the §2.10 stats contract: ``lists_probed`` = probed buckets at
    stop, ``nprobe`` = final probe-set size, ``scored_vectors`` = rows
    scored in the probed buckets at the stopping radius.
    """

    name = "post_filter_lsh"

    def __init__(
        self,
        corpus: DataFrame,
        n: int | None = None,
        id_col: str = "id",
        nbits: int = DEFAULT_NBITS,
        radius_ladder: Sequence[int] = (0, 1, 2),
        costed: bool = False,
        safety: int = 2,
        selectivity_hint: int | None = None,
    ):
        super().__init__(corpus, n, id_col)
        self.nbits = nbits
        self.radius_ladder = tuple(radius_ladder)
        self._planes: np.ndarray | None = None
        # cost-based ladder entry — the LSH translation of the IVF
        # backend's clamp arithmetic, with probe radius as the widening
        # knob: the probe set at Hamming radius r covers P(r) = Σ_{i≤r}
        # C(nbits, i) of the 2^nbits buckets, so expected survivors
        # ≈ N·P(r)/2^nbits · selectivity = P(r)·|allowed|/2^nbits. The
        # entry radius is the smallest rung whose P(r) reaches
        # ceil(K·safety·2^nbits / |allowed|) — integer ceil, exactly
        # reproducible by the SQL oracle — clamped to the last rung.
        self.costed = costed
        self.safety = int(safety)
        self.selectivity_hint = selectivity_hint  # stats/sketch |allowed|

    def probe_coverage(self, radius: int) -> int:
        """P(r) = Σ_{i≤r} C(nbits, i): buckets the multi-probe set covers."""
        from math import comb

        return sum(comb(self.nbits, i) for i in range(radius + 1))

    @property
    def planes(self) -> np.ndarray:
        if self._planes is None:
            dim = len(self.corpus.select("embedding").first()["embedding"])
            self._planes = hyperplanes(self.nbits, dim)
        return self._planes

    def plan(self, qvec, filters, k, probe_hamming: int | None = None):
        """One ladder rung as a composable plan (same shape search() runs)."""
        from hybrid_vector_search_spark.functions.predicates import (
            compile_filters,
        )

        radius = (
            probe_hamming if probe_hamming is not None else self.radius_ladder[-1]
        )
        probes = probe_set(qvec, self.planes, radius)
        bucketed = self.corpus.withColumn(
            "bucket", bucket_udf(self.planes)(F.col("embedding"))
        )
        # LSH candidates ARE corpus rows (the probed-bucket scan keeps all
        # metadata columns), so post-filtering needs NO join at all: apply
        # the predicate to the same pruned scan. {x : bucket∈probes ∧ pred}
        # is exactly candidates ∩ allowed, with zero shuffle and the filter
        # pushed into the scan — unlike a semi-join against the unbounded
        # allowed set, this survives selectivity → 1 at 100× scale.
        pred = compile_filters(self.corpus.schema, filters)
        kept = (
            bucketed.filter(F.col("bucket").isin(probes))
            .filter(pred)
            .select(
                F.col(self.id_col),
                dot_score_pandas_udf(qvec)(F.col("embedding")).alias("score"),
            )
        )
        return topk(kept, k, id_col=self.id_col), probes

    def search(self, qvec, filters, k):
        import time

        from hybrid_vector_search_spark.functions.predicates import (
            compile_filters,
        )
        from hybrid_vector_search_spark.functions.vector import ensure_unit_l2
        from hybrid_vector_search_spark.sources.loaders import validate_K

        validate_K(k, self.n)
        q = ensure_unit_l2(qvec)
        pred = compile_filters(self.corpus.schema, filters)

        t0 = time.perf_counter()
        # cost-based entry radius (see __init__; |allowed| is the A2
        # selectivity count — catalog stats or a sketch at 100 TB)
        ladder = list(self.radius_ladder)
        n_allowed: int | None = None
        if self.costed:
            n_allowed = (
                self.selectivity_hint
                if self.selectivity_hint is not None
                else self.corpus.filter(pred).count()
            )
            if n_allowed <= 0:
                needed_p = self.probe_coverage(ladder[-1]) + 1  # force last
            else:
                needed_p = -(
                    -(k * self.safety * (1 << self.nbits)) // n_allowed
                )
            entry = next(
                (r for r in ladder if self.probe_coverage(r) >= needed_p),
                ladder[-1],
            )
            ladder = [r for r in ladder if r >= entry]
        entry_radius = ladder[0]
        rows: list = []
        probes: list[int] = []
        rungs_run = 0
        stop_radius = ladder[-1]
        bucketed = self.corpus.withColumn(
            "bucket", bucket_udf(self.planes)(F.col("embedding"))
        )
        # the per-rung candidate count (the stats contract's
        # ``scored_vectors`` at the stopping radius) is independent of
        # the rung's survivor probe — submit both concurrently (guide
        # §2.6: two read-only jobs over the resident corpus) and keep
        # the count from the rung the ladder stops on. Identical value
        # to the old post-loop count; in the escalation regime a
        # non-stop rung's count is discarded (bounded extra work, the
        # wall still improves because it overlaps the rung's probe).
        from concurrent.futures import ThreadPoolExecutor

        scored_vectors = 0
        with ThreadPoolExecutor(1) as _ex:
            for radius in ladder:
                rungs_run += 1
                probes = probe_set(q, self.planes, radius)
                in_probed = bucketed.filter(F.col("bucket").isin(probes))
                cnt_fut = _ex.submit(in_probed.count)
                # joinless post-filter: predicate applied to the pruned
                # scan itself (see plan() — candidates are corpus rows,
                # so no candidate⋈allowed join is ever needed)
                kept = in_probed.filter(pred).select(
                    F.col(self.id_col),
                    dot_score_pandas_udf(q)(
                        F.col("embedding")
                    ).alias("score"),
                )
                rows = topk(kept, k, id_col=self.id_col).collect()
                stop_radius = radius
                scored_vectors = cnt_fut.result()
                if len(rows) >= k:
                    break
        latency_ms = (time.perf_counter() - t0) * 1000.0

        ids = [int(r[self.id_col]) for r in rows]
        scores = [float(r["score"]) for r in rows]
        stats = {
            "method": self.name,
            "K": k,
            "latency_ms": latency_ms,
            "scored_vectors": scored_vectors,
            "lists_probed": len(probes),
            "nprobe": len(probes),
            "kth_at_stop": scores[k - 1] if len(scores) >= k else None,
            "bound_at_stop": scores[-1] if scores else None,
            "scores": scores,
            "ladder_entry": entry_radius,
            "rungs_run": rungs_run,
            **(
                {"selectivity_est": n_allowed / self.n}
                if n_allowed is not None
                else {}
            ),
            "notes": self.compose_notes(
                f"radius_stop={stop_radius},nbits={self.nbits}"
            ),
        }
        return ids, stats


def build_bucketed_layout(
    corpus: DataFrame,
    persist_path: str,
    nbits: int = DEFAULT_NBITS,
) -> tuple[DataFrame, np.ndarray]:
    """Materialize the ``partitionBy("bucket")`` parquet layout the module
    docstring promises for 100 TB: bucket assignment is a stateless
    map-side column (no training job — the build advantage over IVF's
    KMeans), and probing the persisted layout is native partition
    pruning, identical I/O shape to the IVF lists. Pre-write
    ``repartition(2^nbits, "bucket")`` puts each bucket wholly inside
    one task so the write emits ONE file per bucket directory (the r7
    IVF lesson: per-task slivers across partition dirs are pure
    file-open cost — operators/ivf.py _materialize). Returns the
    read-back DataFrame and the hyperplanes."""
    first = corpus.select("embedding").first()
    planes = hyperplanes(nbits, dim=len(first["embedding"]))
    assigned = corpus.withColumn(
        "bucket", bucket_udf(planes)(F.col("embedding"))
    )
    assigned.repartition(1 << nbits, "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(persist_path)
    return corpus.sparkSession.read.parquet(persist_path), planes


def lsh_topk_plan_persisted(
    layout: DataFrame,
    planes: np.ndarray,
    qvec: Sequence[float],
    k: int,
    probe_hamming: int = 1,
    id_col: str = "id",
) -> tuple[DataFrame, list[int]]:
    """Top-K over the persisted bucket layout: ``bucket IN (probes)`` is
    a PartitionFilter (only probed bucket directories are read), scoring
    is the single-query JVM kernel — no Python anywhere in the plan."""
    from hybrid_vector_search_spark.functions.vector import dot_score_column

    probes = probe_set(qvec, planes, probe_hamming)
    scored = layout.filter(F.col("bucket").isin(probes)).select(
        F.col(id_col), dot_score_column(qvec).alias("score")
    )
    return topk(scored, k, id_col=id_col), probes
