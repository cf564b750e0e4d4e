"""Drift monitor: PSI/SMD algebra against an independent numpy
reference, identical-distribution near-zero behavior, alarm response
to a genuinely shifted snapshot, and edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.drift import embedding_drift


def _mk(spark, arrays):
    return spark.createDataFrame(
        [(i, [float(x) for x in a]) for i, a in enumerate(arrays)],
        "vec_id long, embedding array<double>",
    )


def _ref_psi_smd(ref_vals, cur_vals, bins):
    """Independent scalar implementation for one dimension."""
    ref_vals, cur_vals = np.asarray(ref_vals), np.asarray(cur_vals)
    allv = np.concatenate([ref_vals, cur_vals])
    vmin, vmax = allv.min(), allv.max()
    span = vmax - vmin
    def binixs(v):
        if span <= 0:
            return np.zeros(len(v), dtype=int)
        return np.minimum(np.floor((v - vmin) * bins / span).astype(int), bins - 1)
    cr = np.bincount(binixs(ref_vals), minlength=bins)
    cc = np.bincount(binixs(cur_vals), minlength=bins)
    pr = (cr + 1.0) / (len(ref_vals) + bins)
    pc = (cc + 1.0) / (len(cur_vals) + bins)
    psi = float(np.sum((pc - pr) * np.log(pc / pr)))
    smd_den = np.sqrt((ref_vals.var(ddof=1) + cur_vals.var(ddof=1)) / 2.0)
    smd = float((cur_vals.mean() - ref_vals.mean()) / smd_den) if smd_den > 0 else 0.0
    return psi, smd


def test_matches_independent_reference(spark):
    rng = np.random.default_rng(0)
    ref = rng.normal(0, 1, (80, 3))
    cur = rng.normal(0.3, 1.2, (60, 3))
    out = {r.dim: r for r in embedding_drift(_mk(spark, ref), _mk(spark, cur), bins=10).collect()}
    assert set(out) == {0, 1, 2}
    for d in range(3):
        psi, smd = _ref_psi_smd(ref[:, d], cur[:, d], 10)
        assert abs(out[d].psi - psi) < 1e-9, d
        assert abs(out[d].smd - smd) < 1e-9, d
        assert out[d].n_ref == 80 and out[d].n_cur == 60


def test_identical_snapshots_read_stable(spark):
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, (200, 4))
    out = embedding_drift(_mk(spark, a), _mk(spark, a), bins=10).collect()
    assert all(abs(r.psi) < 1e-9 and abs(r.smd) < 1e-9 for r in out)


def test_shifted_snapshot_raises_alarm(spark):
    """A real shift must cross the standard PSI alarm (0.25) while an
    iid resample of the same distribution stays under the stable bar
    (0.1) — the monitor separates signal from sampling noise."""
    rng = np.random.default_rng(2)
    ref = rng.normal(0, 1, (500, 2))
    same = rng.normal(0, 1, (500, 2))
    shifted = rng.normal(1.5, 1, (500, 2))
    stable = embedding_drift(_mk(spark, ref), _mk(spark, same), bins=10).collect()
    alarmed = embedding_drift(_mk(spark, ref), _mk(spark, shifted), bins=10).collect()
    assert all(r.psi < 0.1 for r in stable), [r.psi for r in stable]
    assert all(r.psi > 0.25 for r in alarmed), [r.psi for r in alarmed]
    assert all(abs(r.smd) > 1.0 for r in alarmed)


def test_constant_dimension_and_validation(spark):
    ref = [[1.0, 0.0], [1.0, 1.0]]
    cur = [[1.0, 0.5], [1.0, 2.0]]
    out = {r.dim: r for r in embedding_drift(_mk(spark, ref), _mk(spark, cur), bins=5).collect()}
    # dim 0 constant on both sides: zero span -> single bin, psi only
    # reflects count imbalance (none here), smd 0
    assert abs(out[0].psi) < 1e-12 and out[0].smd == 0.0
    with pytest.raises(ValueError, match="bins"):
        embedding_drift(_mk(spark, ref), _mk(spark, cur), bins=1)


def test_plan_has_no_python_udfs(spark):
    df = _mk(spark, np.zeros((4, 2)))
    plan = embedding_drift(df, df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_all_joins_broadcast(spark):
    """The O(d)-row range/moment/psi frames must broadcast into the
    N·d exploded rows — a sort-merge join here shuffles the whole
    exploded corpus on every monitoring run (VERDICT r9 #5)."""
    df = _mk(spark, np.zeros((4, 2)))
    plan = embedding_drift(df, df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan
