"""PAO solver: ADMM (JAX) against the exact scipy/HiGHS LP oracle."""
import numpy as np
import pytest

from pantax_tpu.profile.pao import sample_valid_nodes, solve_pao


def random_instance(rng, n=200, p=4):
    A = (rng.random((n, p)) < 0.45).astype(np.float64)
    A[:, 0] = (rng.random(n) < 0.8)  # denser first path
    x_true = rng.uniform(0, 5, size=p)
    x_true[rng.random(p) < 0.3] = 0.0
    noise = rng.normal(0, 0.05, size=n)
    b = np.maximum(A @ x_true + noise, 0.0)
    ub = 1.05 * max(b.max(), 1e-9)
    return A, b, ub


@pytest.mark.parametrize("seed", range(6))
def test_admm_matches_highs_objective(seed):
    rng = np.random.default_rng(seed)
    A, b, ub = random_instance(rng)
    exact = solve_pao(A, b, ub, solver="highs")
    admm = solve_pao(A, b, ub, solver="admm")
    # objective within tight relative tolerance of the exact LP optimum
    assert admm.objective <= exact.objective * (1 + 1e-3) + 1e-6
    np.testing.assert_allclose(admm.x, exact.x, atol=0.05)


def test_pinned_paths_are_zero():
    rng = np.random.default_rng(42)
    A, b, ub = random_instance(rng, p=5)
    pinned = np.array([False, True, False, True, False])
    res = solve_pao(A, b, ub, solver="admm", fixed_zero=pinned)
    assert res.x[1] == 0.0 and res.x[3] == 0.0
    exact = solve_pao(A, b, ub, solver="highs", fixed_zero=pinned)
    assert res.objective <= exact.objective * (1 + 1e-3) + 1e-6


def test_empty_rows():
    res = solve_pao(np.zeros((0, 3)), np.zeros(0), 1.0, solver="admm")
    assert res.x.shape == (3,)


def test_sampling_deterministic():
    nodes = np.arange(10000)
    a = sample_valid_nodes(nodes, 500, False)
    b = sample_valid_nodes(nodes, 500, False)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 500
    assert (np.diff(a) > 0).all()
    c = sample_valid_nodes(np.arange(300), 500, False)
    assert len(c) == 300
