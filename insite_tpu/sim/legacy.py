"""Legacy eq_1-eq_8 PKPD generators (reference: utils/exp_utils.py:40-295 —
kept off the run.py main path for older experiments, reproduced here for
capability completeness).

Two ODE families, each in four noise variants:

- *single* (eq_1-eq_4): 1-D PKPD  dx = x * (u*(c0 - c1)/v - c0/v) with
  c1 = 1, v = 1, c0 = -1  (exp growth untreated, exp decay treated);
  x0 ~ U[0, 10].
- *double* (eq_5-eq_8): 2-D (volume, concentration) with
  dv = -0.05 * log(v) * v (clipped at 0) and dc = -c/2 + chemo —
  faithfully including the reference's quirk that the volume equation
  ignores the treatments (exp_utils.py:236-244: the beta_c / alpha_r terms
  are sampled but unused by the shipped skeleton).

Variant table (load_dataset_internal, exp_utils.py:63-84):
  eq_1/eq_5 clean; eq_2/eq_6 +observation noise; eq_3/eq_7 +between-subject
  (additive) parameter noise; eq_4/eq_8 fractional-weight parameter noise.

Treatment policy: binary action per dim, probability
sigma(gamma * (window_mean(x_0)/max_cov - 1/2)), re-drawn every
`step_actions` steps and held in between (the action-buffer deque,
exp_utils.py:100-122) — expressed as one `lax.scan` carrying the whole
cohort and a rolling window buffer.

Documented deviations: all randomness is jax.random (the reference mixes
np.random inside python loops), and the high-resolution re-integration uses
fixed-step Euler with 10 sub-steps instead of scipy RK45 with
max_step=dt/10 — distribution-level, not bitwise, parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from insite_tpu.sim.tumor import calc_volume

SUBSTEPS = 10


def _policy_prob(window_mean, gamma, max_cov):
    return jax.nn.sigmoid(gamma * (window_mean / max_cov - 0.5))


def _rollout(f, x0, key, T, dt, gamma, max_cov, step_actions: int,
             window: int, action_dim: int):
    """Batched Euler rollout with held, confounded binary actions.

    x0: [B, D]. Returns (states [B, T, D], actions [B, T, action_dim])."""
    B, D = x0.shape
    buf0 = jnp.zeros((B, window)).at[:, -1].set(x0[:, 0])
    count0 = jnp.ones((B,), jnp.int32)   # entries filled in the window

    def step(carry, inputs):
        x, u, buf, count, hold = carry
        t_idx, key_t = inputs

        redraw = hold <= 0
        mean = jnp.sum(buf, axis=1) / jnp.maximum(count, 1)
        p = _policy_prob(mean, gamma, max_cov)
        u_new = random.bernoulli(
            key_t, p[:, None], (B, action_dim)).astype(x.dtype)
        u = jnp.where(redraw[:, None], u_new, u)
        hold = jnp.where(redraw, step_actions - 1, hold - 1)

        h = dt / SUBSTEPS
        for _ in range(SUBSTEPS):
            x = x + h * f(x, u)

        buf = jnp.concatenate([buf[:, 1:], x[:, :1]], axis=1)
        count = jnp.minimum(count + 1, window)
        return (x, u, buf, count, hold), (x, u)

    keys = random.split(key, T - 1)
    init_u = jnp.zeros((B, action_dim), x0.dtype)
    init = (x0, init_u, buf0, count0, jnp.zeros((B,), jnp.int32))
    _, (xs, us) = lax.scan(step, init, (jnp.arange(1, T), keys))
    states = jnp.concatenate([x0[:, None], jnp.moveaxis(xs, 0, 1)], axis=1)
    # action at step t applies over [t, t+1); the reference records the
    # first drawn action at t=0 as well (u_sol = [u], exp_utils.py:115)
    actions = jnp.moveaxis(us, 0, 1)
    actions = jnp.concatenate([actions[:, :1], actions], axis=1)[:, :T]
    return states, actions


def _sample_params(key, base: dict, noise_stds: dict, bsv_noise: float,
                   fractional_weight: bool, n: int):
    """Between-subject variability: additive (eq_3/eq_7) or
    fractional-weight (eq_4/eq_8) parameter noise
    (exp_utils.py:162-181, 247-270)."""
    out = {}
    for i, (name, mean) in enumerate(sorted(base.items())):
        sub = random.fold_in(key, i)
        std = noise_stds[name]
        eps = random.normal(sub, (n,))
        if bsv_noise > 0.0 and not fractional_weight:
            out[name] = mean + eps * std
        elif bsv_noise > 0.0 and fractional_weight:
            out[name] = mean * (1.0 + eps * std)
        else:
            out[name] = jnp.full((n,), mean)
    return out


@partial(jax.jit, static_argnums=(1, 2, 5, 6), static_argnames=(
    'step_actions', 'window'))
def _simulate_single(key, n: int, T: int, gamma, obs_noise,
                     bsv_noise: float, fractional_weight: bool,
                     step_actions: int = 30, window: int = 15):
    dt = 10.0 / T
    k_x0, k_p, k_act, k_obs = random.split(key, 4)
    x0 = random.uniform(k_x0, (n, 1), minval=0.0, maxval=10.0)
    # single family: noise std IS bsv_noise itself (additive: C +
    # N(0, bsv_noise) * bsv_std with bsv_std=1; fractional:
    # C * (1 + N(0, bsv_noise)); exp_utils.py:167-176)
    bsv = {'c_1': bsv_noise, 'v': bsv_noise, 'c_0': bsv_noise}
    p = _sample_params(k_p, {'c_1': 1.0, 'v': 1.0, 'c_0': -1.0}, bsv,
                       bsv_noise, fractional_weight, n)

    def f(x, u):
        c0v = (p['c_0'] / p['v'])[:, None]
        c1v = (p['c_1'] / p['v'])[:, None]
        return x * (u * (c0v - c1v) - c0v)

    states, actions = _rollout(f, x0, k_act, T, dt, gamma,
                               max_cov=15.0, step_actions=step_actions,
                               window=window, action_dim=1)
    states = states + obs_noise * random.normal(k_obs, states.shape)
    return states, actions


@partial(jax.jit, static_argnums=(1, 2, 5, 6), static_argnames=(
    'step_actions', 'window'))
def _simulate_double(key, n: int, T: int, gamma, obs_noise,
                     bsv_noise: float, fractional_weight: bool,
                     step_actions: int = 30, window: int = 15):
    dt = 10.0 / T
    k_x0, k_p, k_act, k_obs = random.split(key, 4)
    v13 = calc_volume(13.0)
    v0 = random.uniform(k_x0, (n, 1), minval=0.80 * v13, maxval=0.99 * v13)
    x0 = jnp.concatenate([v0, jnp.zeros_like(v0)], axis=1)
    # parameters sampled for parity but unused by the shipped skeleton
    # (exp_utils.py:236-244) — kept to preserve draw structure
    _sample_params(k_p, {'rho': 7e-5, 'beta_c': 0.028, 'alpha_r': 0.0398},
                   {'rho': 7.23e-3, 'beta_c': 0.0007, 'alpha_r': 0.168},
                   bsv_noise, bool(fractional_weight), n)

    def f(x, u):
        v = jnp.clip(x[:, 0], 0.0, None)
        c = x[:, 1]
        ca = jnp.clip(u[:, 0], 0.0, 5.0)
        dv = jnp.where(v > 0.0, -jnp.log(jnp.maximum(v, 1e-30)) * 0.05 * v,
                       0.0)
        dc = -c / 2.0 + ca
        return jnp.stack([dv, dc], axis=1)

    states, actions = _rollout(f, x0, k_act, T, dt, gamma,
                               max_cov=v13, step_actions=step_actions,
                               window=window, action_dim=2)
    states = states + obs_noise * random.normal(k_obs, states.shape)
    return states, actions


EQUATIONS = {
    'eq_1': ('single', dict(obs_noise=0.0, bsv_noise=0.0,
                            fractional_weight=False)),
    'eq_2': ('single', dict(obs_noise=0.01, bsv_noise=0.0,
                            fractional_weight=False)),
    'eq_3': ('single', dict(obs_noise=0.0, bsv_noise=0.1,
                            fractional_weight=False)),
    'eq_4': ('single', dict(obs_noise=0.0, bsv_noise=0.1,
                            fractional_weight=True)),
    'eq_5': ('double', dict(obs_noise=0.0, bsv_noise=0.0,
                            fractional_weight=False)),
    'eq_6': ('double', dict(obs_noise=0.01, bsv_noise=0.0,
                            fractional_weight=False)),
    'eq_7': ('double', dict(obs_noise=0.0, bsv_noise=0.1,
                            fractional_weight=False)),
    'eq_8': ('double', dict(obs_noise=0.0, bsv_noise=0.1,
                            fractional_weight=True)),
}


def load_dataset(dataset_name: str, seed: int, train_samples=100,
                 val_samples=100, test_samples=100, gamma=1.0,
                 step_actions=30, total_time_steps=60,
                 obs_noise=None, bsv_noise=None):
    """Train/val/test dict quadruple matching load_dataset_internal
    (exp_utils.py:63-84): {'x', 'a', 'y'} per split + metadata.  Validation
    and test are generated without confounding (gamma=0), as the reference
    does."""
    if dataset_name not in EQUATIONS:
        raise NotImplementedError(dataset_name)
    family, variant = EQUATIONS[dataset_name]
    variant = dict(variant)
    if obs_noise is not None and variant['obs_noise'] > 0:
        variant['obs_noise'] = obs_noise
    if bsv_noise is not None and variant['bsv_noise'] > 0:
        variant['bsv_noise'] = bsv_noise
    sim = _simulate_single if family == 'single' else _simulate_double
    key = random.PRNGKey(seed)

    splits = {}
    for i, (name, n, g) in enumerate([('train', train_samples, gamma),
                                      ('val', val_samples, 0.0),
                                      ('test', test_samples, 0.0)]):
        states, actions = sim(random.fold_in(key, i), n, total_time_steps,
                              g, variant['obs_noise'], variant['bsv_noise'],
                              variant['fractional_weight'],
                              step_actions=int(step_actions))
        states, actions = jax.device_get((states, actions))
        y = states if family == 'single' else states[:, :, :1]
        splits[name] = {'x': states, 'a': actions, 'y': y}

    t = np.linspace(0, 10, total_time_steps)
    metadata = {'x_dim': splits['train']['x'].shape[2],
                'action_dim': splits['train']['a'].shape[2],
                'action_type': 'binary', 't': t,
                'total_timesteps': total_time_steps}
    return splits['train'], splits['val'], splits['test'], metadata
