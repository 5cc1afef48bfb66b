"""Numerical accuracy of the shared special-function SQL kernels.

The kernels (_lf_sql ln-factorial, _erfc_sql complementary error
function) guarantee cross-engine PARITY by running identical expression
text on Spark and DuckDB — these tests pin their ACCURACY against
Python's libm (math.lgamma / math.erfc), evaluated through DuckDB
(same arithmetic, no Spark session needed), so a kernel that drifted
from the true function could not hide behind matching itself.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mongodb_iceberg_sync_spark.operators.aggregates import _erfc_sql, _lf_sql


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@given(n=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_lf_kernel_matches_lgamma(con, n):
    (got,) = con.execute(f"SELECT {_lf_sql(str(n))}").fetchone()
    want = math.lgamma(n + 1)
    if want == 0.0:
        assert abs(got) < 1e-12
    else:
        # 3-term Stirling: ~1e-12 relative at n>=13, exact literals below
        assert abs(got - want) <= 2e-11 * max(1.0, abs(want)), (n, got, want)


@given(x=st.floats(min_value=0.0, max_value=8.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_erfc_kernel_matches_libm(con, x):
    (got,) = con.execute(f"SELECT {_erfc_sql(repr(x))}").fetchone()
    want = math.erfc(x)
    # Abramowitz-Stegun 7.1.26: |eps| <= 1.5e-7 ABSOLUTE
    assert abs(got - want) <= 1.6e-7, (x, got, want)


def test_lf_kernel_exact_small_values(con):
    for n in range(13):
        (got,) = con.execute(f"SELECT {_lf_sql(str(n))}").fetchone()
        assert got == pytest.approx(math.lgamma(n + 1), abs=1e-12)


def test_erfc_kernel_boundary_values(con):
    (at0,) = con.execute(f"SELECT {_erfc_sql('0.0')}").fetchone()
    assert abs(at0 - 1.0) <= 1.6e-7
    (far,) = con.execute(f"SELECT {_erfc_sql('6.0')}").fetchone()
    assert far == pytest.approx(0.0, abs=1e-7)


# ---- literal-robustness pins (r9) ------------------------------------
# Every shared kernel must survive a bare full-precision decimal literal
# as its argument: DuckDB types such literals DECIMAL(p,s) with s up to
# ~20, and any textual multiplication of the raw argument then needs
# scale > 38 -> OutOfRangeException (the r8 erfc regression). These pins
# feed repr()-precision literals straight in — no caller-side CAST.

@given(x=st.floats(min_value=1e-12, max_value=8.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_erfc_kernel_survives_decimal_literals(con, x):
    (got,) = con.execute(f"SELECT {_erfc_sql(repr(x))}").fetchone()
    assert abs(got - math.erfc(x)) <= 1.6e-7, (x, got)


@given(n=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=100, deadline=None)
def test_lf_kernel_survives_decimal_literals(con, n):
    # integer-valued but DECIMAL-typed at maximum scale: the kernel's
    # contract is integer counts, so only the literal's TYPE is hostile
    lit = f"{n}.00000000000000000000"
    (got,) = con.execute(f"SELECT {_lf_sql(lit)}").fetchone()
    want = math.lgamma(n + 1)
    assert abs(got - want) <= 2e-11 * max(1.0, abs(want)), (n, got, want)


def test_bauc_w_kernel_thresholds(con):
    from mongodb_iceberg_sync_spark.operators.mleval import (
        _BAUC_W,
        _bauc_w_sql,
    )

    # exact threshold semantics: u < thr picks val; >= last thr -> 4;
    # and a high-scale DECIMAL literal argument must not error
    edges = [0, 36787, 36788, 73575, 73576, 91969, 91970, 98100, 98101, 99999]
    for u in edges:
        (got,) = con.execute(f"SELECT {_bauc_w_sql(str(u))}").fetchone()
        want = next((val for thr, val in _BAUC_W if u < thr), 4)
        assert got == want, (u, got, want)
    (dec,) = con.execute(
        f"SELECT {_bauc_w_sql('50000.00000000000000000001')}"
    ).fetchone()
    assert dec == 1


# ---- chi-square even-df survival kernel (r9) --------------------------

def _chi2_sf_even_ref(x: float, m: int) -> float:
    """Independent reference: P(chi2_{2m} > x) = exp(-x/2) sum (x/2)^i/i!"""
    t = x / 2.0
    acc, term = 0.0, 1.0
    for i in range(m):
        if i > 0:
            term *= t / i
        acc += term
    return math.exp(-t) * acc


@given(
    x=st.floats(min_value=0.0, max_value=200.0, allow_nan=False),
    m=st.sampled_from([1, 2, 12]),
)
@settings(max_examples=200, deadline=None)
def test_chi2_sf_even_kernel_matches_reference(con, x, m):
    from mongodb_iceberg_sync_spark.operators.aggregates import (
        _chi2_sf_even_sql,
    )

    # repr() literal: the DECIMAL-typed-argument robustness the r8 erfc
    # regression taught us to pin for every shared kernel
    (got,) = con.execute(f"SELECT {_chi2_sf_even_sql(repr(x), m)}").fetchone()
    want = _chi2_sf_even_ref(x, m)
    assert abs(got - want) <= 1e-12 + 1e-9 * abs(want), (x, m, got, want)


def test_chi2_sf_even_kernel_known_values(con):
    from mongodb_iceberg_sync_spark.operators.aggregates import (
        _chi2_sf_even_sql,
    )

    # df=2: P(X>x) = exp(-x/2); chi2_{0.05,2} = 5.991464...
    (p,) = con.execute(f"SELECT {_chi2_sf_even_sql('5.991464547107979', 1)}").fetchone()
    assert p == pytest.approx(0.05, abs=1e-9)
    # df=4 at x=0 -> 1
    (p0,) = con.execute(f"SELECT {_chi2_sf_even_sql('0.0', 2)}").fetchone()
    assert p0 == pytest.approx(1.0, abs=1e-12)
