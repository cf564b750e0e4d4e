"""Property-based check of filtered_knn's per-query constraint path:
the Arrow dictionary-encoded mask must agree exactly with the
expression-join implementation under adversarial constraint structure —
negative values, values absent from the corpus, NULLs, duplicate query
constraints, and k beyond a group's size. Spark jobs per example are
expensive, so examples are few but each one is dense with edge cases.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.operators.knn import filtered_knn


def _canon(df):
    return sorted((r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect())


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_corpus=st.integers(5, 30),
    n_labels=st.integers(1, 4),
    k=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_arrow_matches_expr_under_adversarial_constraints(
    _spark, n_corpus, n_labels, k, seed
):
    rng = np.random.default_rng(seed)
    # labels drawn from a pool that includes negatives and sparse ids
    pool = [-7, -1, 0, 3, 424242][:n_labels]
    rows = [
        (
            int(i),
            [float(x) for x in rng.uniform(-1, 1, size=4)],
            int(pool[rng.integers(0, len(pool))]),
        )
        for i in range(n_corpus)
    ]
    corpus = _spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    # queries: one per pool label, plus an absent value and a NULL
    qrows = [
        (100 + j, [float(x) for x in rng.uniform(-1, 1, size=4)], int(v))
        for j, v in enumerate(pool)
    ]
    qrows.append((900, [0.0, 0.0, 0.0, 0.0], 31337))
    qrows.append((901, [0.1, 0.1, 0.1, 0.1], None))
    queries = _spark.createDataFrame(
        qrows, "qid long, qvec array<float>, qlabel long"
    )
    kwargs = dict(k=k, filter_col="label", qfilter_col="qlabel")
    arrow = _canon(filtered_knn(corpus, queries, impl="arrow", **kwargs))
    expr = _canon(filtered_knn(corpus, queries, impl="expr", **kwargs))
    assert arrow == expr
    # every neighbor obeys its query's constraint
    labels = {r[0]: r[2] for r in rows}
    constraint = {q[0]: q[2] for q in qrows}
    for qid, nid, _, _ in arrow:
        assert labels[nid] == constraint[qid]
