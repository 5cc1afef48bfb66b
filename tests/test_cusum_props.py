"""Property test for q_timeseries_cusum's closed form.

The operator computes s_t = R_t - min(R_0..R_t) (R = running sum of the
demeaned series, R_0 = 0) because the textbook recursion
s_t = max(0, s_{t-1} + d_t) cannot be expressed as a window function.
Hypothesis checks the identity on arbitrary integer series, including
the R_0 edge (first demeaned value positive) that a prefix-min over
R_1..R_t alone gets wrong.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st


def _recursive(d):
    s, out = 0, []
    for x in d:
        s = max(0, s + x)
        out.append(s)
    return out


def _closed_form(d):
    out, r, m = [], 0, 0  # m = min over R_0..R_t, seeded with R_0 = 0
    for x in d:
        r += x
        m = min(m, r)
        out.append(r - m)
    return out


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=200))
def test_cusum_closed_form_equals_recursion(xs):
    # the operator demeans via x*n - total, which just rescales; the
    # identity must hold for ANY integer series
    assert _closed_form(xs) == _recursive(xs)


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=50))
def test_cusum_demeaned_series_identity(xs):
    n, tot = len(xs), sum(xs)
    d = [x * n - tot for x in xs]  # the operator's exact-integer demeaning
    assert _closed_form(d) == _recursive(d)
    assert sum(d) == 0  # demeaned series sums to zero exactly
