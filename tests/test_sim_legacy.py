"""Legacy eq_1-eq_8 generator tests (exp_utils.py:40-295)."""

import numpy as np
import pytest

from insite_tpu.sim import legacy


@pytest.mark.parametrize('name', list(legacy.EQUATIONS))
def test_shapes_and_finiteness(name):
    train, val, test, meta = legacy.load_dataset(
        name, seed=0, train_samples=8, val_samples=4, test_samples=4,
        gamma=1.0, total_time_steps=30)
    D = meta['x_dim']
    A = meta['action_dim']
    assert train['x'].shape == (8, 30, D)
    assert train['a'].shape == (8, 30, A)
    assert val['x'].shape[0] == 4
    assert np.isfinite(train['x']).all()
    assert set(np.unique(train['a'])) <= {0.0, 1.0}
    if name.startswith(('eq_5', 'eq_6', 'eq_7', 'eq_8')):
        assert D == 2 and A == 2
        assert train['y'].shape[-1] == 1
    else:
        assert D == 1 and A == 1


def test_single_dynamics_direction():
    """Untreated trajectories grow (dx = +x), treated decay (dx = -x)."""
    train, _, _, _ = legacy.load_dataset('eq_1', seed=0, train_samples=64,
                                         val_samples=2, test_samples=2,
                                         gamma=0.0, total_time_steps=30,
                                         step_actions=30)
    x, a = train['x'][:, :, 0], train['a'][:, :, 0]
    always_on = a.all(axis=1) & (x[:, 0] > 1e-3)
    always_off = (~a.astype(bool)).all(axis=1) & (x[:, 0] > 1e-3)
    assert always_on.any() and always_off.any()
    assert (x[always_on, -1] < x[always_on, 0]).all()
    assert (x[always_off, -1] > x[always_off, 0]).all()


def test_actions_held_for_step_actions():
    train, _, _, _ = legacy.load_dataset('eq_1', seed=1, train_samples=16,
                                         val_samples=2, test_samples=2,
                                         gamma=2.0, total_time_steps=60,
                                         step_actions=30)
    a = train['a'][:, :, 0]
    # actions re-drawn every 30 steps: within [1, 31) they are constant
    assert (a[:, 1:31].std(axis=1) == 0).all()


def test_confounding_direction():
    """gamma > 0 ties treatment to large x (the policy sigmoid)."""
    train, _, _, _ = legacy.load_dataset('eq_1', seed=0, train_samples=400,
                                         val_samples=2, test_samples=2,
                                         gamma=10.0, total_time_steps=30,
                                         step_actions=30)
    x0 = train['x'][:, 0, 0]
    a0 = train['a'][:, 1, 0]
    assert a0[x0 > 7.5].mean() > a0[x0 < 7.5].mean() + 0.2


def test_bsv_variants_differ():
    t3, _, _, _ = legacy.load_dataset('eq_3', seed=0, train_samples=8,
                                      val_samples=2, test_samples=2,
                                      total_time_steps=20)
    t1, _, _, _ = legacy.load_dataset('eq_1', seed=0, train_samples=8,
                                      val_samples=2, test_samples=2,
                                      total_time_steps=20)
    assert not np.allclose(t3['x'], t1['x'])
