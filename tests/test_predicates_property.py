"""Property-based cross-engine check: random filter specs produce the same
allowed-id set in Spark (compile_filters) and DuckDB (filters_to_sql).

One semantics, two engines, fuzzed inputs — covers value casting, NULL-fail,
like-substring, in-lists with uncastable elements, and empty results.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hybrid_vector_search_spark.functions.predicates import (
    compile_filters,
    filters_to_sql,
)
from hybrid_vector_search_spark.sources.loaders import load_corpus

SF_DIR = "/root/testdata/sf0.001"

_scalar_ops = st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"])

_label_vals = st.one_of(
    st.integers(min_value=-1, max_value=9),
    st.sampled_from(["3", "7", "notanint"]),  # castable and uncastable strings
)
_lang_vals = st.sampled_from(["en", "es", "de", "fr", "zh", "xx", ""])
_nchars_vals = st.integers(min_value=-10, max_value=2000)


def _col_filter() -> st.SearchStrategy:
    label = st.tuples(
        st.just("label"),
        st.one_of(
            st.tuples(_scalar_ops, _label_vals),
            st.tuples(st.just("in"), st.lists(_label_vals, min_size=1, max_size=4)),
            st.tuples(
                st.just("between"),
                st.tuples(
                    st.integers(-1, 5), st.integers(3, 9)
                ).map(list),
            ),
        ),
    )
    lang = st.tuples(
        st.just("lang"),
        st.one_of(
            st.tuples(st.sampled_from(["eq", "ne"]), _lang_vals),
            st.tuples(st.just("in"), st.lists(_lang_vals, min_size=1, max_size=3)),
        ),
    )
    nch = st.tuples(
        st.just("n_chars"),
        st.one_of(
            st.tuples(_scalar_ops, _nchars_vals),
            st.tuples(
                st.just("between"),
                st.tuples(
                    st.integers(0, 500), st.integers(200, 1500)
                ).map(list),
            ),
        ),
    )
    text = st.tuples(
        st.just("text"),
        st.tuples(st.just("like"), st.sampled_from(["the", "LOREM", "zzz", "a"])),
    )
    return st.one_of(label, lang, nch, text)


filter_specs = st.lists(_col_filter(), min_size=0, max_size=3).map(
    lambda pairs: {c: {op: v} for c, (op, v) in pairs}
)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_corpus(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(
        f"""CREATE VIEW corpus AS
        SELECT e.vec_id AS id, e.label, d.text, d.lang, d.source, d.n_chars
        FROM '{SF_DIR}/embeddings.parquet' e
        LEFT JOIN '{SF_DIR}/documents.parquet' d ON e.vec_id = d.doc_id"""
    )
    return con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=filter_specs)
def test_spark_and_duckdb_agree(spec, corpus, ddb):
    pred = compile_filters(corpus.schema, spec)
    spark_ids = {r.id for r in corpus.filter(pred).select("id").collect()}
    where = filters_to_sql(corpus.schema, spec)
    ddb_ids = {
        r[0]
        for r in ddb.sql(f"SELECT id FROM corpus WHERE {where}").fetchall()
    }
    assert spark_ids == ddb_ids, f"divergence for spec={spec}"
