"""Pin the closed-form Bernstein matrices to the reference's hard-coded
n=5, phi=3 values (rbp_planner.hpp:327-405)."""
import numpy as np

from swarm_simulator_tpu.core import bernstein

Q_BASE_REF = np.array([
    [720, -1800, 1200, 0, 0, -120],
    [-1800, 4800, -3600, 0, 600, 0],
    [1200, -3600, 3600, -1200, 0, 0],
    [0, 0, -1200, 3600, -3600, 1200],
    [0, 600, 0, -3600, 4800, -1800],
    [-120, 0, 0, 1200, -1800, 720],
], dtype=float)

BASIS_REF = np.array([
    [-1, 5, -10, 10, -5, 1],
    [5, -20, 30, -20, 5, 0],
    [-10, 30, -30, 10, 0, 0],
    [10, -20, 10, 0, 0, 0],
    [-5, 5, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0],
], dtype=float)

A0_REF = np.array([
    [1, 0, 0, 0, 0, 0],
    [-1, 1, 0, 0, 0, 0],
    [1, -2, 1, 0, 0, 0],
    [-1, 3, -3, 1, 0, 0],
    [1, -4, 6, -4, 1, 0],
    [-1, 5, -10, 10, -5, 1],
], dtype=float)

AT_REF = np.array([
    [0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, -1, 1],
    [0, 0, 0, 1, -2, 1],
    [0, 0, -1, 3, -3, 1],
    [0, 1, -4, 6, -4, 1],
    [-1, 5, -10, 10, -5, 1],
], dtype=float)


def test_basis_matches_reference():
    np.testing.assert_allclose(bernstein.bernstein_power_matrix(5), BASIS_REF)


def test_endpoint_matrices_match_reference():
    A0, AT = bernstein.endpoint_derivative_matrices(5)
    np.testing.assert_allclose(A0, A0_REF)
    np.testing.assert_allclose(AT, AT_REF)


def test_q_base_matches_reference():
    Q = bernstein.derivative_cost_matrix(5, 3)
    np.testing.assert_allclose(Q, Q_BASE_REF, atol=1e-9)


def test_bernstein_partition_of_unity():
    for n in (3, 5, 7):
        B = bernstein.bernstein_power_matrix(n)
        # sum of Bernstein polynomials == 1: power coeffs sum to [0,...,0,1]
        s = B.sum(axis=0)
        expect = np.zeros(n + 1)
        expect[-1] = 1.0
        np.testing.assert_allclose(s, expect, atol=1e-12)


def test_bernstein_to_power_roundtrip():
    rng = np.random.default_rng(0)
    n = 5
    ctrl = rng.normal(size=(4, n + 1, 3))  # M=4 segments
    dt = np.array([1.0, 0.5, 2.0, 1.0])
    coef = bernstein.bernstein_to_power(ctrl, dt, n)
    # evaluate both representations at several local times
    for m in range(4):
        for s in (0.0, 0.3, 0.77, 1.0):
            t = s * dt[m]
            powers = t ** np.arange(n, -1, -1)
            p_power = coef[m].T @ powers
            import math
            bern = np.array([
                math.comb(n, i) * s**i * (1 - s) ** (n - i)
                for i in range(n + 1)
            ])
            p_bern = ctrl[m].T @ bern
            np.testing.assert_allclose(p_power, p_bern, atol=1e-9)


def test_endpoint_derivatives_numeric():
    """A_0/A_T rows reproduce numerical endpoint derivatives."""
    import math
    rng = np.random.default_rng(1)
    n, dt = 5, 0.7
    ctrl = rng.normal(size=(n + 1,))
    coef = bernstein.bernstein_to_power(
        ctrl[None, :, None], np.array([dt]), n)[0, :, 0]

    A0, AT = bernstein.endpoint_derivative_matrices(n)
    nn = 1.0
    for r in range(4):
        # derivative from power representation at t=0 and t=dt
        dcoef = coef.copy()
        for k in range(r):
            powers = np.arange(n, -1, -1) - k
            dcoef = dcoef * np.maximum(powers, 0)
        p0 = dcoef[n - r] if r <= n else 0.0
        powers = np.maximum(np.arange(n, -1, -1) - r, 0)
        valid = np.arange(n, -1, -1) >= r
        pT = np.sum(dcoef * np.where(valid, dt ** powers, 0.0))

        d0 = dt ** (-r) * nn * (A0[r] @ ctrl)
        dT = dt ** (-r) * nn * (AT[r] @ ctrl)
        np.testing.assert_allclose(d0, p0, atol=1e-8)
        np.testing.assert_allclose(dT, pT, atol=1e-8)
        nn *= (n - r)
