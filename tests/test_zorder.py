"""Z-order clustering: Morton key vs an independent bit-twiddling
reference, bucket edge cases, codegen-only plan, and the actual
data-skipping payoff measured from parquet footer min-max stats."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.zorder import (
    cluster_by_zorder,
    minmax_bucket,
    morton_key,
    zorder_key,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _ref_morton(vals, bits):
    """Independent scalar interleave (column i's bit b → position b*n+i)."""
    n = len(vals)
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_morton_key_matches_reference(spark):
    rows = [(i, (i * 37) % 16, (i * 11) % 16) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r.id: r.z
        for r in df.withColumn("z", morton_key([F.col("a"), F.col("b")], bits=4)).collect()
    }
    for i, a, b in rows:
        assert got[i] == _ref_morton([a, b], 4), (i, a, b)


def test_morton_key_three_columns_and_validation(spark):
    df = spark.createDataFrame([(1, 3, 5, 7)], "id long, a long, b long, c long")
    z = df.withColumn(
        "z", morton_key([F.col("a"), F.col("b"), F.col("c")], bits=3)
    ).first().z
    assert z == _ref_morton([3, 5, 7], 3)
    with pytest.raises(ValueError, match="overflows"):
        morton_key([F.col("a"), F.col("b")], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        morton_key([], bits=4)


def test_minmax_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,)], "x double"
    ).crossJoin(spark.createDataFrame([(0.0, 10.0)], "mn double, mx double"))
    got = sorted(
        r.b
        for r in df.withColumn(
            "b", minmax_bucket(F.col("x"), F.col("mn"), F.col("mx"), bits=3)
        ).collect()
    )
    # x=max lands on 2^bits and must clamp to 2^bits - 1
    assert got == [0, 4, 7]
    # degenerate range → bucket 0
    dg = spark.createDataFrame([(3.0, 3.0, 3.0)], "x double, mn double, mx double")
    assert dg.withColumn("b", minmax_bucket(F.col("x"), F.col("mn"), F.col("mx"), 3)).first().b == 0


def test_zorder_key_plan_is_codegen_only(spark):
    ev = load_table(spark, "events", SF_SMALL)
    keyed = zorder_key(ev, ["user_id", "value"], bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert keyed.filter(F.col("zkey") < 0).count() == 0
    assert keyed.count() == ev.count()


def test_zorder_skips_row_groups_on_both_dimensions(spark, tmp_path):
    """THE payoff: against parquet footer min-max stats, a box
    predicate on (user_id, value) overlaps far fewer z-ordered files
    than files sorted on a single unrelated key — and a single-column
    sort layout can't skip on the OTHER column while z-order skips on
    both."""
    import pyarrow.parquet as pq

    ev = load_table(spark, "events", SF_SMALL).select("event_id", "user_id", "value")
    n_files = 16
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    cluster_by_zorder(ev, ["user_id", "value"], num_files=n_files, bits=8).write.parquet(zdir)
    # the strawman layout: clustered on event_id (time-of-arrival order)
    ev.repartitionByRange(n_files, "event_id").sortWithinPartitions("event_id").write.parquet(ldir)

    def overlap_fraction(d, ulo, uhi, vlo, vhi):
        import glob
        import os

        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        assert files
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            fu_min = min(md.row_group(g).column(names["user_id"]).statistics.min for g in range(md.num_row_groups))
            fu_max = max(md.row_group(g).column(names["user_id"]).statistics.max for g in range(md.num_row_groups))
            fv_min = min(md.row_group(g).column(names["value"]).statistics.min for g in range(md.num_row_groups))
            fv_max = max(md.row_group(g).column(names["value"]).statistics.max for g in range(md.num_row_groups))
            if fu_max >= ulo and fu_min <= uhi and fv_max >= vlo and fv_min <= vhi:
                hit += 1
        return hit / len(files)

    # a selective box derived from the data: bottom quarter of the user
    # range x bottom quartile of value (sf-independent selectivity)
    st = ev.agg(
        F.max("user_id").alias("umax"),
        F.percentile_approx("value", 0.25).alias("vq"),
    ).first()
    box = dict(ulo=0, uhi=st.umax // 4, vlo=0.0, vhi=float(st.vq))
    z_frac = overlap_fraction(zdir, **box)
    l_frac = overlap_fraction(ldir, **box)
    # event_id order is uncorrelated with (user_id, value): every file
    # overlaps. Z-order must prune most files.
    assert l_frac >= 0.9, f"strawman unexpectedly skips ({l_frac})"
    assert z_frac <= 0.5, f"z-order skipped too little: {z_frac} (box {box})"

    # correctness: the layouts hold identical data
    a = spark.read.parquet(zdir).orderBy("event_id").collect()
    b = spark.read.parquet(ldir).orderBy("event_id").collect()
    assert a == b
