"""Discovery-stack unit tests: library ordering, savgol/FD parity with
scipy, STLSQ recovery of known sparse dynamics."""

import jax.numpy as jnp
import numpy as np
from scipy.signal import savgol_filter

from insite_tpu.discovery import (PolynomialLibrary, finite_difference,
                                  savgol_smooth, stlsq)
from insite_tpu.discovery.differentiate import smoothed_finite_difference


def test_library_ordering_matches_pysindy():
    lib = PolynomialLibrary(n_inputs=3, degree=2, interaction_only=True)
    names = lib.feature_names(['x0', 'u0', 'u1'])
    assert names == ['1', 'x0', 'u0', 'u1', 'x0 u0', 'x0 u1', 'u0 u1']
    X = jnp.array([[2.0, 3.0, 5.0]])
    theta = np.asarray(lib(X))[0]
    np.testing.assert_allclose(theta, [1, 2, 3, 5, 6, 10, 15])


def test_library_degree4_full():
    lib = PolynomialLibrary(n_inputs=2, degree=4, interaction_only=False)
    # sklearn count: C(n+d, d) = C(6,4) = 15
    assert lib.n_features == 15
    X = jnp.array([[2.0, 3.0]])
    theta = np.asarray(lib(X))[0]
    assert theta[0] == 1.0 and 16.0 in theta and 81.0 in theta  # x^4, y^4


def test_savgol_matches_scipy_interp():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 40).cumsum(axis=1)
    lengths = np.array([40, 40, 17, 9])
    ours = np.asarray(savgol_smooth(jnp.asarray(x), jnp.asarray(lengths)))
    for i, L in enumerate(lengths):
        ref = savgol_filter(x[i, :L], 5, 3, mode='interp')
        np.testing.assert_allclose(ours[i, :L], ref, rtol=1e-9, atol=1e-9)


def test_finite_difference_orders():
    # a stencil of order+1 points is exact for polynomials of degree <= order
    t = np.linspace(0, 3, 31)
    dt = t[1] - t[0]
    lengths = np.array([31])
    for order, poly_deg in ((2, 2), (4, 4)):
        x = (t ** poly_deg)[None, :]
        d_true = poly_deg * t ** (poly_deg - 1)
        ours = np.asarray(finite_difference(jnp.asarray(x),
                                            jnp.asarray(lengths), dt,
                                            order=order))[0]
        np.testing.assert_allclose(ours, d_true, rtol=1e-8, atol=1e-8)
    # order=1 forward difference semantics
    x = (t ** 3 - 2 * t ** 2)[None, :]
    ours1 = np.asarray(finite_difference(jnp.asarray(x),
                                         jnp.asarray(lengths), dt,
                                         order=1))[0]
    fwd = (x[0, 1:] - x[0, :-1]) / dt
    np.testing.assert_allclose(ours1[:-1], fwd, rtol=1e-12)


def test_stlsq_recovers_sparse_linear_system():
    rng = np.random.RandomState(1)
    N, F = 2000, 7
    theta = rng.randn(N, F)
    true = np.array([0.0, -0.8, 0.0, 0.0, 0.5, 0.0, 0.0])
    y = theta @ true + 1e-4 * rng.randn(N)
    coefs, mask = stlsq(jnp.asarray(theta), jnp.asarray(y),
                        threshold=0.1, alpha=0.05)
    np.testing.assert_allclose(np.asarray(coefs), true, atol=1e-3)
    assert np.asarray(mask).sum() == 2


def test_stlsq_sample_weight_ignores_masked_rows():
    rng = np.random.RandomState(2)
    theta = rng.randn(100, 3)
    y = theta @ np.array([1.0, 0.0, -2.0])
    # poison the second half; weights must hide it
    theta2 = np.concatenate([theta, rng.randn(100, 3) * 100])
    y2 = np.concatenate([y, rng.randn(100) * 100])
    w = np.concatenate([np.ones(100), np.zeros(100)])
    coefs, _ = stlsq(jnp.asarray(theta2), jnp.asarray(y2), 0.1, 0.05,
                     sample_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(coefs), [1.0, 0.0, -2.0],
                               atol=1e-6)


def test_smoothed_fd_on_noisy_decay():
    # the EQ_4 discovery setting: recover d/dt of exp decay through noise
    t = np.arange(59) / 6.0
    x = 10 * np.exp(-0.5 * t)
    rng = np.random.RandomState(3)
    xn = (x + 0.01 * rng.randn(59))[None, :]
    d = np.asarray(smoothed_finite_difference(jnp.asarray(xn),
                                              jnp.asarray([59]), 1 / 6.0,
                                              order=4))[0]
    d_true = -0.5 * x
    # interior points: savgol(5,3) + 5-point FD tracks the derivative to the
    # noise floor; edges use one-sided windows and are a bit looser
    assert np.abs(d[4:-4] - d_true[4:-4]).max() < 0.1
    assert np.abs(d - d_true).max() < 0.5


# ---------------------------------------------------------------------------
# WSINDy threshold x alpha grid selection (EQ_4_D seed-6 regression class:
# the whitened ridge at alpha=0.5 can collapse the weak support at unlucky
# cohort draws; the grid + strong-form score must recover the true model)

def _weak_fixture():
    """20 noisy exponential decays x' = -x0 with 2 static features."""
    from insite_tpu.discovery.wsindy import weak_system
    rng = np.random.RandomState(0)
    t = np.arange(59) / 6.0
    x0 = rng.uniform(2.0, 10.0, size=20)
    x = x0[:, None] * np.exp(-t)[None, :] + 0.01 * rng.randn(20, 59)
    statics = rng.uniform(0.5, 2.0, size=(20, 2))
    lib = PolynomialLibrary(n_inputs=3, degree=2, interaction_only=True)
    A, b, w = weak_system(jnp.asarray(x), jnp.asarray(statics),
                          jnp.asarray(np.full(20, 59)), lib, 1 / 6.0)
    return A, b, w, lib


def test_weak_stlsq_host_matches_device():
    from insite_tpu.discovery.wsindy import weak_stlsq, weak_stlsq_host
    A, b, w = _weak_fixture()[:3]
    c_dev = np.asarray(weak_stlsq(A, b, w, 0.1))
    c_host = weak_stlsq_host(np.asarray(A), np.asarray(b), np.asarray(w),
                             0.1)
    np.testing.assert_allclose(c_host, c_dev, atol=1e-4)


def test_weak_grid_select_recovers_true_support():
    from insite_tpu.discovery.wsindy import weak_stlsq_host, weak_select_host
    A, b, w, lib = _weak_fixture()
    ths = np.repeat([0.025, 0.05, 0.1, 0.2, 0.4], 3)
    als = np.tile([0.5, 0.05, 0.005], 5)
    cands = np.stack([weak_stlsq_host(np.asarray(A), np.asarray(b),
                                      np.asarray(w), t, alpha=al)
                      for t, al in zip(ths, als)])
    # score on a strong-form design: exact derivative of the clean decay
    rng = np.random.RandomState(1)
    xs = rng.uniform(1.0, 10.0, size=500)
    ss = rng.uniform(0.5, 2.0, size=(500, 2))
    theta = np.asarray(lib(jnp.asarray(
        np.concatenate([xs[:, None], ss], -1))))
    y = -xs
    c, g = weak_select_host(cands, ths, theta, y, np.ones(500))
    # true model: x_dot = -x0 (feature index 1 of [1, x0, u0, u1, ...])
    assert abs(c[1] + 1.0) < 0.02
    assert np.abs(np.delete(c, 1)).max() < 0.02


def test_weak_select_prefers_sparser_within_tol():
    from insite_tpu.discovery.wsindy import weak_select_host
    # two candidates fit equally well (to the noise floor); the sparser
    # one must win the tie
    rng = np.random.RandomState(0)
    theta = np.eye(3).repeat(10, 0)
    y = theta @ np.array([1.0, 0.0, 0.0]) + 0.01 * rng.randn(30)
    cands = np.array([[1.0, 0.0, 0.001],    # denser, same noise floor
                      [1.0, 0.0, 0.0]])     # sparser, within 5%
    c, g = weak_select_host(cands, np.array([0.1, 0.2]), theta, y,
                            np.ones(30), select_tol=0.05)
    assert g == 1


def test_weak_device_select_matches_host():
    from insite_tpu.discovery.wsindy import (weak_stlsq_host,
                                             weak_select_host)
    from insite_tpu.discovery.wsindy import weak_stlsq
    import jax
    A, b, w, lib = _weak_fixture()
    ths = np.repeat([0.05, 0.1, 0.2], 2)
    als = np.tile([0.5, 0.05], 3)
    rng = np.random.RandomState(1)
    xs = rng.uniform(1.0, 10.0, size=200)
    ss = rng.uniform(0.5, 2.0, size=(200, 2))
    theta = np.asarray(lib(jnp.asarray(
        np.concatenate([xs[:, None], ss], -1))))
    y = -xs
    cands = np.stack([weak_stlsq_host(np.asarray(A), np.asarray(b),
                                      np.asarray(w), t, alpha=al)
                      for t, al in zip(ths, als)])
    c_host, _ = weak_select_host(cands, ths, theta, y, np.ones(200))
    # the traced selection rule (vectorized wsindy column) agrees in f64
    from insite_tpu.discovery.wsindy import weak_select_traced
    cands_dev = jax.vmap(
        lambda th, al: weak_stlsq(A, b, w, th, alpha=al))(
        jnp.asarray(ths), jnp.asarray(als))
    g = weak_select_traced(cands_dev, jnp.asarray(theta), jnp.asarray(y),
                           jnp.ones(200))
    c_dev = np.asarray(cands_dev[g])
    np.testing.assert_allclose(c_host, c_dev, atol=1e-4)


def test_weak_select_null_model_is_last_resort():
    """Regression: the zero-support sentinel used to be iinfo.max//2,
    whose *G key wrapped int32 NEGATIVE for G >= 2 — an admissible null
    model then beat every real candidate at argmin.  When a nonzero
    candidate is admissible, the null model must never win (and the
    traced and host rules must agree on the pick)."""
    import jax.numpy as jnp
    from insite_tpu.discovery.wsindy import (weak_select_host,
                                             weak_select_traced)
    # y is mostly outside the column space: the best candidate improves
    # the residual by only ~0.5%, so the null model IS admissible at 5%
    theta = np.zeros((4, 3))
    theta[:3, :3] = np.eye(3)
    y = np.array([1.0, 0.0, 0.0, 10.0])
    cands = np.array([[0.0, 0.0, 0.0],     # null: rmse ~ 10.05
                      [1.0, 0.0, 0.0],     # nnz 1: rmse = 10.0 (best)
                      [1.0, 1.0, 0.0]])    # nnz 2: rmse ~ 10.05
    w = np.ones(4)
    g_traced = int(weak_select_traced(jnp.asarray(cands),
                                      jnp.asarray(theta), jnp.asarray(y),
                                      jnp.asarray(w)))
    _, g_host = weak_select_host(cands, np.array([0.1, 0.2, 0.4]), theta,
                                 y, w)
    assert g_traced == 1, "null model must not beat an admissible fit"
    assert g_host == 1
    # the null model IS picked when it is the only admissible candidate
    # (all-noise target: no candidate reduces the residual)
    y2 = np.array([0.0, 0.0, 0.0, 10.0])
    # rmse(null) = 5.0; rmse(c1) = sqrt(116)/2 ~ 5.39 > 5.0 * 1.05:
    # only the null model is admissible
    cands2 = np.array([[0.0, 0.0, 0.0],
                       [4.0, 0.0, 0.0]])
    g2 = int(weak_select_traced(jnp.asarray(cands2), jnp.asarray(theta),
                                jnp.asarray(y2), jnp.asarray(w)))
    assert g2 == 0


# ---------------------------------------------------------------------------
# segment-constrained weak systems (tumor family: wsindy beyond the
# reference's EQ_4-only gate — models/sindy.py::_fit_weak_tumor)

def test_tiny_window_test_function_nondegenerate():
    """window_len=3 with the default p=2 test function has phi' = 0 at
    all three grid points (the weak equation degenerates to 0 = <phi,
    theta>); the p=1 function must carry derivative signal."""
    from insite_tpu.discovery.wsindy import _test_functions
    _, _, dphi2 = _test_functions(1, 3, 10, p=2, all_starts=False)
    assert np.abs(dphi2).max() == 0.0          # the degenerate case
    _, phi1, dphi1 = _test_functions(1, 3, 10, p=1, all_starts=False)
    assert np.abs(dphi1).max() > 0.0
    assert phi1[0, 0] == 0.0 and phi1[0, -1] == 0.0   # compact support


def test_weak_system_segment_mask_excludes_arm_crossings():
    """A window is kept iff every transition it spans ran the target arm
    and it fits inside the valid volume range."""
    from insite_tpu.discovery.wsindy import weak_system
    lib = PolynomialLibrary(n_inputs=2, degree=2, interaction_only=True)
    B, T, w = 1, 10, 4
    x = jnp.asarray(np.linspace(1.0, 2.0, T)[None, :])
    statics = jnp.ones((B, 1))
    # transitions: arm 1 on steps 2..6, arm 0 elsewhere
    arms = np.zeros((B, T - 1), np.int32)
    arms[0, 2:7] = 1
    _, _, wt = weak_system(x, statics, jnp.asarray([T]), lib, 0.1,
                           window_len=w, all_starts=True,
                           step_arms=jnp.asarray(arms), arm=1, p=1)
    wt = np.asarray(wt).reshape(B, -1)          # [B, K] window keep-mask
    # window [s, s+4) spans transitions s..s+2 -> arm-1-valid s in {2,3,4}
    expected = np.zeros(T - w + 1)
    expected[2:5] = 1.0
    np.testing.assert_array_equal(wt[0], expected)


def test_weak_segments_recover_per_arm_decay():
    """Piecewise constant-arm exponential decays: x' = -k_a * x with
    k_0=0.3, k_1=1.2 on alternating segments; the stacked multi-scale
    segment system + host solve recovers each arm's rate."""
    from insite_tpu.discovery.wsindy import (weak_system_segments,
                                             weak_stlsq_host)
    rng = np.random.RandomState(0)
    B, T, dt = 40, 60, 0.1
    ks = np.array([0.3, 1.2])
    x = np.zeros((B, T))
    arms = np.zeros((B, T - 1), np.int32)
    x[:, 0] = rng.uniform(2.0, 8.0, B)
    seg_arm = rng.randint(0, 2, size=(B,))
    seg_left = rng.randint(2, 7, size=(B,))
    for j in range(T - 1):
        flip = seg_left <= 0
        seg_arm = np.where(flip, 1 - seg_arm, seg_arm)
        seg_left = np.where(flip, rng.randint(2, 7, size=(B,)), seg_left)
        arms[:, j] = seg_arm
        x[:, j + 1] = x[:, j] * np.exp(-ks[seg_arm] * dt)
        seg_left -= 1
    statics = rng.uniform(0.5, 2.0, size=(B, 1))
    lib = PolynomialLibrary(n_inputs=2, degree=2, interaction_only=True)
    for a in range(2):
        A, b, w = weak_system_segments(
            jnp.asarray(x), jnp.asarray(statics), jnp.asarray(np.full(B, T)),
            lib, dt, jnp.asarray(arms), a, window_lens=(8, 5, 3))
        assert float(jnp.sum(w)) > 50, 'segment windows must exist'
        c = weak_stlsq_host(np.asarray(A), np.asarray(b), np.asarray(w),
                            0.05)
        names = lib.feature_names(['x0', 'u0'])
        cx = c[names.index('x0')]
        np.testing.assert_allclose(cx, -ks[a], rtol=0.05)
        # nothing else carries weight
        others = [c[i] for i, nm in enumerate(names) if nm != 'x0']
        assert np.abs(np.asarray(others)).max() < 0.05 * ks[a]
