"""Round-5 pin: the detfloat round_det / round_det_sql pair is
bitwise identical across Spark DataFrame, Spark SQL, and DuckDB —
the property the driver's value-hash gate rests on. Hypothesis
drives random doubles; a deterministic tie-rich grid covers the
exact representation-tie values where native round(double) diverges
between engines (and across DuckDB releases)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from siem_on_amazon_opensearch_service_spark.detfloat import (
    round_det,
    round_det_sql,
)


def _cross_engine(spark, vals, digits):
    rows = [(float(v),) for v in vals]
    df = spark.createDataFrame(rows, "x double")
    s_col = [r[0] for r in df.select(round_det("x", digits)).collect()]
    s_sql = [r[0] for r in
             df.selectExpr(round_det_sql("x", digits)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    duck = [r[0] for r in
            con.execute(f"SELECT {round_det_sql('x', digits)} FROM t")
            .fetchall()]
    return s_col, s_sql, duck


def test_round_det_tie_grid_bitwise_identical(spark):
    vals = []
    for k in range(-40, 40):
        vals += [k / 2 * 10**-6,          # exact 6dp ties
                 k / 2 * 10**-4,          # exact 4dp ties
                 0.0000125 + k * 1e-6,    # JLH-score magnitudes
                 46.49875 + k * 1e-3,     # events.value avg ties
                 -3.14159 + k * 0.25]
    vals += [0.0, -0.0, 1.0000005, -1.0000005, 199.995, 1e12]
    for d in (0, 4, 6):
        a, b, c = _cross_engine(spark, vals, d)
        assert [repr(x) for x in a] == [repr(x) for x in b] \
            == [repr(x) for x in c], f"digits={d}"


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30))
def test_round_det_random_bitwise_identical(spark, xs):
    a, b, c = _cross_engine(spark, xs, 4)
    assert [repr(x) for x in a] == [repr(x) for x in b] \
        == [repr(x) for x in c]


def test_round_det_differs_from_native_round_only_at_ties(spark):
    """Sanity: away from representation ties the floor form equals
    the old native round — the sweep changed values only where the
    engines disagreed anyway."""
    import math

    vals = [0.12345678, 3.14159265, 0.33333333, 42.4242, 7.00001]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    det = [r[0] for r in df.select(round_det("x", 4)).collect()]
    for v, got in zip(vals, det):
        assert math.isclose(got, round(v, 4), abs_tol=1e-12)
