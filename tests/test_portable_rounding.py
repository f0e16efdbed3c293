"""Cross-engine property test for functions/portable.py: the portable
rounding arithmetic must produce IDENTICAL values in Spark and DuckDB on
adversarial decimal-grid inputs — including exact rounding ties, where
plain ROUND is known to disagree (the bug this module fixes)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.functions.portable import (
    grid_avg,
    grid_avg_sql,
    round_portable,
    round_portable_sql,
)


def _tie_heavy_cents(rng: np.random.Generator, n: int) -> np.ndarray:
    """2-decimal values whose group sums/averages often land exactly on
    rounding ties (multiples of 0.16 make sum/32 end in ...5)."""
    base = rng.integers(0, 20000, size=n)  # cents
    # half the rows: force multiples of 16 cents (ties against /32 groups)
    base[: n // 2] = (base[: n // 2] // 16) * 16
    return base / 100.0


@pytest.fixture(scope="module")
def groups(spark):
    rng = np.random.default_rng(7)
    n = 4096
    pdf = pd.DataFrame(
        {
            "g": np.repeat(np.arange(n // 32), 32),  # 32 rows per group
            "v": _tie_heavy_cents(rng, n),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_round_portable_matches_duckdb_per_row(spark, groups):
    pdf, df = groups
    got = (
        df.select(F.col("v"), round_portable(F.col("v") / 3.0, 6).alias("r"))
        .toPandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT v, {round_portable_sql('v / 3.0', 6)} AS r FROM t ORDER BY v"
    ).fetchdf()
    assert list(got["r"]) == list(exp["r"])


def test_grid_avg_matches_duckdb_on_tie_heavy_groups(spark, groups):
    """Group averages sit exactly on 6-decimal ties by construction;
    grid_avg must agree bit-for-bit while both engines aggregate in
    different orders."""
    pdf, df = groups
    got = (
        df.groupBy("g")
        .agg(grid_avg(F.sum("v"), F.count(F.lit(1)), 2, 6).alias("a"))
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT g, {grid_avg_sql('SUM(v)', 'COUNT(*)', 2, 6)} AS a "
        "FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert list(got["a"]) == list(exp["a"])
    assert len(exp) == 128
