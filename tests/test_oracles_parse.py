"""Every registered oracle must parse AND bind in DuckDB.

The full value-compare lives in tools/selfcheck.py (and the driver);
this is the fast CI guard — ``EXPLAIN`` against views over the sf0.001
parquet catches syntax errors, misspelled columns, and dialect slips in
seconds, without executing the queries.
"""

from pathlib import Path

import duckdb
import pytest

from hybrid_vector_search_spark.plans.registry import ORACLES, QUERIES

SF_DIR = Path("/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    if not SF_DIR.exists():  # pragma: no cover - driver env always has it
        pytest.skip("testdata not present")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR / (t + '.parquet')}'"
        )
    return c


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_all_oracles_explain(con):
    bad: dict[str, str] = {}
    for name, sql in sorted(ORACLES.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - collecting all failures
            bad[name] = f"{type(e).__name__}: {e}"[:200]
    assert not bad, f"{len(bad)} oracle(s) failed to bind: {bad}"
