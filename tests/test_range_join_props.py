"""Property test: banded_range_join must equal the naive theta join on
arbitrary inputs — the banding (bucket + replicate + re-filter) is a
physical rewrite only, so ANY value distribution (negatives, exact
band-boundary values, duplicates, empty sides) must give identical
pair sets. Boundary values matter most: floor(v/width) assigns a value
sitting exactly on a band edge to one bucket, and the ±1 replication
must still produce every |l-r| <= width pair."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mongodb_iceberg_sync_spark.functions.range_join import banded_range_join

_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=0, max_size=12
)


@settings(max_examples=15, deadline=None)
@given(left=_vals, right=_vals, width_i=st.integers(min_value=1, max_value=7))
def test_banded_equals_naive_theta(spark, left, right, width_i):
    # integer-valued data at integer widths maximizes exact-boundary
    # collisions (|l-r| == width), the precision-sensitive case
    width = float(width_i)
    ldf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(left)], "lid int, lv double"
    )
    rdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(right)], "rid int, rv double"
    )
    got = sorted(
        (r.lid, r.rid)
        for r in banded_range_join(ldf, rdf, "lv", "rv", width).collect()
    )
    want = sorted(
        (i, j)
        for i, lv in enumerate(left)
        for j, rv in enumerate(right)
        if abs(lv - rv) <= width
    )
    assert got == want
