"""Engine-portable rounding for oracle-compared aggregates.

``ROUND(double, n)`` is NOT portable across engines when the true value
lands exactly on the rounding grid: Spark routes through Java's
shortest-decimal ``BigDecimal(Double.toString(x))`` then HALF_UP, while
DuckDB scales the raw binary double — so ``1114.23 / 32 = 34.8196875``
rounds to ``34.819688`` in Spark but ``34.819687`` in DuckDB (the double
is ``34.81968749999…``). This bites precisely when inputs are
decimal-grid values (currency-like 2-decimal columns, integer averages):
sums/averages of them land on exact half-ties with probability ~1/scale,
not ~0.

Fix: express the rounding as explicit double arithmetic —
``floor(x * 10^n + 0.5) / 10^n`` — the same IEEE-754 operations in every
engine, so both sides of the compare compute bit-identical doubles. (For
negative inputs this is half-toward-+inf rather than SQL's
half-away-from-zero; the tie-break choice is irrelevant here — what
matters is both engines making the SAME choice.)

Use these for rounded aggregates of decimal-grid inputs; plain
``F.round`` stays fine for values with no decimal structure (dot-product
scores, ratios of token counts) where exact grid ties have measure ~0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_portable(col: Column | str, digits: int) -> Column:
    """``floor(x·10^d + 0.5)/10^d`` as a Spark Column (doubles only)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c.cast("double") * scale + F.lit(0.5)) / scale


def round_portable_sql(expr: str, digits: int) -> str:
    """The identical arithmetic as a DuckDB SQL fragment."""
    scale = float(10**digits)
    return f"(floor(({expr})::DOUBLE * {scale} + 0.5) / {scale})"


def grid_avg(sum_col: Column, count_col: Column, grid_digits: int, digits: int) -> Column:
    """Portable AVG of a decimal-grid column.

    Identical rounding arithmetic is NOT enough for averages: the two
    engines accumulate the sum in different orders, so their sum doubles
    differ by an ULP — and an average that lands exactly on the rounding
    tie flips direction on that ULP. Snapping the sum back onto its exact
    grid first (``round_portable(sum, grid_digits)``) collapses the ULP
    noise to the same double in both engines (grid points are far from
    the floor boundary); the division and final rounding are then
    bit-identical everywhere.
    """
    snapped = round_portable(sum_col, grid_digits)
    return round_portable(snapped / count_col.cast("double"), digits)


def grid_avg_sql(sum_expr: str, count_expr: str, grid_digits: int, digits: int) -> str:
    snapped = round_portable_sql(sum_expr, grid_digits)
    return round_portable_sql(f"{snapped} / ({count_expr})::DOUBLE", digits)
