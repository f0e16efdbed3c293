"""Column statistics + selectivity estimation — the costed ladder's
O(1) ``|allowed|`` input at scale.

The cost-based post_filter entry (operators/ivf.py PostFilterBackend
``costed=True``) needs ``|allowed|``, the row count passing the query's
filters. Small corpora just count; at 100 TB that count is itself a scan,
so every warehouse engine answers it from table statistics instead. This
module is that path, Spark-style:

* :func:`collect_column_stats` — ONE aggregation pass over the table
  (the moral equivalent of ``ANALYZE TABLE t COMPUTE STATISTICS FOR
  COLUMNS ...``): per column ``count / nulls / approx ndv / min / max``.
  Run it at ingest alongside the index build; the result is a tiny dict
  that lives with the index metadata (the reference keeps its corpus
  sidecar the same way — src/dataio/loaders.py:60-70).
* :func:`estimate_allowed` — a System-R-style estimator mapping a filter
  dict (the engine's predicate DSL, functions/predicates.py) onto those
  stats: equality = 1/ndv, ranges = uniform min–max fraction, conjuncts
  multiply under independence, every predicate scaled by the column's
  not-null fraction (the DSL is null-fail throughout).

The estimate feeds ``selectivity_hint``; the entry decision then runs
with ZERO jobs. The ladder's rungs are coarse (200/500/1000), so the
estimate only has to land the right ORDER OF MAGNITUDE — the same
robustness argument behind every CBO's uniformity assumption; and the
costed design degrades gracefully: a wrong rung costs extra rungs or
extra candidates, never wrong answers (the final rung is identical in
both regimes).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

#: classic fallback selectivity for predicates stats can't see through
#: (LIKE substring, geo boxes without lat/lon stats)
DEFAULT_SEL = 0.1


def collect_column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
    histogram_bins: int = 0,
) -> dict[str, dict[str, Any]]:
    """One aggregation pass computing per-column statistics.

    Returns ``{col: {count, nulls, ndv, min, max}}`` (min/max only for
    numeric columns; ndv is HLL-approximate — rsd 5%, the default —
    or exact with ``exact_ndv=True``, the mode an ANSI-SQL oracle can
    replay as ``COUNT(DISTINCT col)``). ``columns`` defaults to every
    non-array column. The special key ``"__table__"`` holds the table
    row count.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            c for c, t in dtypes.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType))
        ]
    ndv_agg = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(ndv_agg(c).alias(f"{c}__ndv"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__n"])
    stats: dict[str, dict[str, Any]] = {"__table__": {"count": n}}
    for c in columns:
        stats[c] = {
            "count": n,
            "nulls": n - int(row[f"{c}__nn"]),
            "ndv": max(int(row[f"{c}__ndv"]), 1),
            "min": row.get(f"{c}__min"),
            "max": row.get(f"{c}__max"),
        }
    if histogram_bins > 1:
        # second pass (ANALYZE ... FOR COLUMNS with histograms is also
        # two-pass: bounds first, then bin counts): equi-width bin
        # counts per numeric column, all columns in ONE conditional
        # aggregation — bins × numeric-cols counters, map-side combined.
        hist_aggs = []
        hist_cols = []
        for c in columns:
            st = stats[c]
            if (
                isinstance(dtypes[c], _NUMERIC)
                and st["min"] is not None
                and st["max"] is not None
                and float(st["max"]) > float(st["min"])
            ):
                lo, hi = float(st["min"]), float(st["max"])
                w = (hi - lo) / histogram_bins
                bucket = F.least(
                    F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(w)),
                    F.lit(histogram_bins - 1),
                )
                hist_cols.append(c)
                for b in range(histogram_bins):
                    hist_aggs.append(
                        F.sum(
                            F.when(bucket == b, 1).otherwise(0)
                        ).alias(f"{c}__h{b}")
                    )
        if hist_aggs:
            hrow = df.agg(*hist_aggs).collect()[0].asDict()
            for c in hist_cols:
                stats[c]["histogram"] = [
                    int(hrow[f"{c}__h{b}"] or 0)
                    for b in range(histogram_bins)
                ]
    return stats


def _range_fraction_hist(
    lo: float | None, hi: float | None, st: Mapping[str, Any]
) -> float:
    """Histogram-refined range fraction: full bins count whole, edge
    bins contribute their uniform-within-bin overlap — the standard
    equi-width histogram estimate, exact when the predicate aligns to
    bin edges and off by at most one bin's mass otherwise (vs the
    min–max uniform assumption, which a skewed column defeats by orders
    of magnitude)."""
    hist = st["histogram"]
    cmin, cmax = float(st["min"]), float(st["max"])
    nn = max(st["count"] - st["nulls"], 1)
    nbins = len(hist)
    w = (cmax - cmin) / nbins
    lo = cmin if lo is None else max(float(lo), cmin)
    hi = cmax if hi is None else min(float(hi), cmax)
    if hi <= lo and not (hi == lo == cmax):
        return 0.0
    kept = 0.0
    for b, cnt in enumerate(hist):
        b_lo = cmin + b * w
        b_hi = cmin + (b + 1) * w if b < nbins - 1 else cmax
        if b_hi <= lo or b_lo >= hi:
            continue
        if b_hi <= b_lo:
            continue
        overlap = (min(hi, b_hi) - max(lo, b_lo)) / (b_hi - b_lo)
        kept += cnt * max(min(overlap, 1.0), 0.0)
    return min(kept / nn, 1.0)


def _range_fraction(
    lo: float | None, hi: float | None, cmin: Any, cmax: Any
) -> float:
    """Uniform-distribution fraction of [cmin, cmax] inside [lo, hi]."""
    if cmin is None or cmax is None:
        return DEFAULT_SEL
    cmin, cmax = float(cmin), float(cmax)
    if cmax <= cmin:  # single-point column: any overlapping range keeps all
        inside = (lo is None or lo <= cmin) and (hi is None or hi >= cmin)
        return 1.0 if inside else 0.0
    lo = cmin if lo is None else max(float(lo), cmin)
    hi = cmax if hi is None else min(float(hi), cmax)
    if hi <= lo:
        return 0.0
    return (hi - lo) / (cmax - cmin)


def _range_sel(st: Mapping[str, Any], lo, hi) -> float:
    """Range selectivity: histogram-refined when the stats carry one
    (collect_column_stats(histogram_bins=...)), min–max uniform
    otherwise."""
    if st.get("histogram") and st.get("min") is not None:
        return _range_fraction_hist(lo, hi, st)
    return _range_fraction(lo, hi, st.get("min"), st.get("max"))


def estimate_allowed(
    stats: Mapping[str, Mapping[str, Any]],
    filters: Mapping[str, Any] | None,
) -> int:
    """Estimate ``|allowed|`` for a filter dict from column statistics.

    Independence across conjuncts (every CBO's default), uniformity
    within a column, and the DSL's null-fail contract (each predicate's
    selectivity is scaled by the column's not-null fraction). Unknown
    columns/ops fall back to :data:`DEFAULT_SEL`. Result is clamped to
    [1, N] — the costed entry divides by it.
    """
    n = int(stats["__table__"]["count"])
    if not filters or n == 0:
        return max(n, 1)
    sel = 1.0
    for col_name, ops in filters.items():
        if col_name in {"lat_between", "lon_between"}:
            st = stats.get(
                "latitude" if col_name == "lat_between" else "longitude"
            )
            if st is None:
                sel *= DEFAULT_SEL
                continue
            lo, hi = ops if isinstance(ops, (list, tuple)) else (None, None)
            # histogram-refined when the geo column carries one — same
            # rule as plain numeric ranges (a skewed point distribution
            # is the NORM for geo data)
            frac = _range_sel(st, lo, hi)
            sel *= frac * (1.0 - st["nulls"] / max(st["count"], 1))
            continue
        st = stats.get(col_name)
        if st is None:
            sel *= DEFAULT_SEL
            continue
        notnull = 1.0 - st["nulls"] / max(st["count"], 1)
        ndv = max(int(st["ndv"]), 1)
        # the not-null fraction is a COLUMN property: apply it once per
        # column, not once per operator — {'ge':…, 'le':…} must not
        # penalize nulls twice vs the equivalent {'between': …}. The
        # first-op association (s * notnull) is kept so single-op
        # columns replay the SQL oracle's float arithmetic exactly.
        first_op = True
        for op, val in ops.items():
            if op == "eq":
                s = 1.0 / ndv
            elif op == "ne":
                s = 1.0 - 1.0 / ndv
            elif op == "in":
                vals = val if isinstance(val, (list, tuple, set)) else [val]
                s = min(len(vals) / ndv, 1.0)
            elif op in {"ge", "gt"}:
                s = _range_sel(st, val, None)
            elif op in {"le", "lt"}:
                s = _range_sel(st, None, val)
            elif op == "between":
                s = _range_sel(st, val[0], val[1])
            else:  # like, and anything stats can't see through
                s = DEFAULT_SEL
            sel *= s * notnull if first_op else s
            first_op = False
    # half-up, not banker's: FLOOR(x + 0.5) is what ANSI SQL replays
    # (the stats-fed registry query's oracle re-derives this estimate)
    est = int(n * sel + 0.5)
    return min(max(est, 1), n)
