"""Training loops for the neural baselines — the Lightning semantics of the
reference (BRCausalModel two-optimizer simultaneous gradient descent with
parameter-group EMA and the AlphaRise schedule,
time_varying_model.py:457-571 + utils.py:146-163), re-expressed as ONE
jitted `lax.scan` program: epochs x batches run entirely on device, with
per-epoch reshuffling, per-batch variational-dropout rng, masked losses and
partitioned optax updates.  A 100-epoch fit is a single XLA dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from insite_tpu.models.nn.blocks import bce


@dataclass
class TrainConfig:
    epochs: int = 100
    batch_size: int = 64
    learning_rate: float = 0.01
    weight_decay: float = 0.0
    optimizer: str = 'adam'
    momentum: float = 0.9
    max_grad_norm: Optional[float] = None
    lr_scheduler: bool = False          # ExponentialLR(gamma=0.99)
    balancing: str = 'grad_reverse'     # grad_reverse / domain_confusion
    alpha: float = 0.0
    update_alpha: bool = True
    alpha_rate: str = 'exp'
    weights_ema: bool = False
    beta: float = 0.99                  # EMA decay
    treatment_mode: str = 'multiclass'


def _base_optimizer(cfg: TrainConfig):
    steps = []
    if cfg.max_grad_norm:
        steps.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.lr_scheduler:
        # per-epoch ExponentialLR emulated per-step is close enough at
        # gamma=0.99; the reference configs never enable it
        sched = optax.exponential_decay(cfg.learning_rate, 1, 0.99)
    else:
        sched = cfg.learning_rate
    if cfg.optimizer == 'adam':
        steps.append(optax.adam(sched))
    elif cfg.optimizer == 'adamw':
        steps.append(optax.adamw(sched, weight_decay=cfg.weight_decay))
    elif cfg.optimizer == 'sgd':
        steps.append(optax.sgd(sched, momentum=cfg.momentum))
    else:
        raise NotImplementedError(cfg.optimizer)
    return optax.chain(*steps)


def alpha_at_epoch(epoch, max_epochs, alpha_max, rate='exp',
                   update_alpha=True):
    """AlphaRise (utils.py:146-163)."""
    if not update_alpha:
        return jnp.asarray(alpha_max, jnp.float32)
    # the reference updates alpha on_epoch_end, so epoch e trains with the
    # value set after epoch e-1: f(e / max) — epoch 0 trains at alpha = 0
    p = epoch / max_epochs
    if rate == 'lin':
        return p * alpha_max
    return (2.0 / (1.0 + jnp.exp(-10.0 * p)) - 1.0) * alpha_max


def _ema_update(ema, params, count, decay):
    """torch_ema semantics: warmup-corrected decay
    min(decay, (1+n)/(10+n))."""
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    new = jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p, ema, params)
    return new, count + 1


def merge_by_mask(a, b, mask_tree):
    """Take leaves from ``a`` where mask is True, else from ``b``."""
    return jax.tree_util.tree_map(
        lambda m, x, y: x if m else y, mask_tree, a, b)


def masked_mean(x, active):
    # guard against all-padding batches (vectorized seed columns zero-pad
    # short seeds' rows; a shuffled batch can be pure padding): 0/0 -> NaN
    # would silently poison that seed's parameters for the rest of training
    return (x * active).sum() / jnp.maximum(active.sum(), 1.0)


def br_losses(treatment_pred, outcome_pred, batch, alpha, balancing,
              treatment_mode):
    """The optimizer-0 loss of BRCausalModel.training_step
    (time_varying_model.py:520-553): masked MSE + balancing BCE."""
    mse = (outcome_pred - batch['outputs']) ** 2
    active = batch['active_entries']
    mse_loss = masked_mean(mse, active)
    if balancing == 'grad_reverse':
        bce_elem = bce(treatment_pred, batch['current_treatments'],
                       treatment_mode)
    else:  # domain_confusion: push predictions to the uniform distribution
        uniform = jnp.ones_like(batch['current_treatments'])
        if treatment_mode == 'multiclass':
            uniform = uniform / uniform.shape[-1]
        else:
            uniform = uniform * 0.5
        bce_elem = alpha * bce(treatment_pred, uniform, treatment_mode)
    bce_loss = masked_mean(bce_elem, active[..., 0])
    return mse_loss, bce_loss


def make_batches(rng, n, batch_size):
    """Shuffled drop-last batch index matrix [n_batches, batch_size]."""
    perm = jax.random.permutation(rng, n)
    n_batches = n // batch_size
    return perm[:n_batches * batch_size].reshape(n_batches, batch_size)


def make_br_train_fn(apply_fn: Callable, cfg: TrainConfig,
                     treatment_mask_tree,
                     treatment_cfg: TrainConfig = None,
                     augment_fn: Callable = None) -> Callable:
    """Build the pure two-optimizer adversarial training program
    (time_varying_model.py:457-571) as ``run(params, data, rng) ->
    (params, ema_params)``.

    Pure in all its arguments, so it composes with the transforms:
    ``jax.jit(run)`` is the single-seed fit and ``jax.jit(jax.vmap(run))``
    trains a whole seed column in one dispatch (params/data/rng get a
    leading seed axis).

    apply_fn(params, batch, alpha, train, rngs, detach_treatment)
        -> (treatment_logits, outcome_pred, br)
    treatment_mask_tree: pytree of bools marking the treatment-head params
        (BRTreatmentOutcomeHead.treatment_head_params = linear2/linear3,
        utils.py:79).
    """
    treatment_cfg = treatment_cfg or cfg
    non_treat_mask = jax.tree_util.tree_map(lambda m: not m,
                                            treatment_mask_tree)

    def partitioned(opt, mask_tree, inv_mask_tree):
        # optax.masked passes the RAW gradient through for masked-out
        # leaves (a step-size-1 gradient-ascent update after
        # apply_updates!) — explicitly zero the complement partition
        return optax.chain(optax.masked(opt, mask_tree),
                           optax.masked(optax.set_to_zero(), inv_mask_tree))

    opt0 = partitioned(_base_optimizer(cfg), non_treat_mask,
                       treatment_mask_tree)
    opt1 = partitioned(_base_optimizer(treatment_cfg), treatment_mask_tree,
                       non_treat_mask)

    def loss0(p, p_ema_treat, batch, alpha, rngs):
        if cfg.weights_ema:
            p = merge_by_mask(p_ema_treat, p, treatment_mask_tree)
        tp, op, _ = apply_fn(p, batch, alpha, True, rngs, False)
        mse_loss, bce_loss = br_losses(tp, op, batch, alpha, cfg.balancing,
                                       cfg.treatment_mode)
        return mse_loss + bce_loss

    def loss1(p, p_ema_nontreat, batch, alpha, rngs):
        if cfg.weights_ema:
            p = merge_by_mask(p, p_ema_nontreat, treatment_mask_tree)
        tp, _, _ = apply_fn(p, batch, alpha, True, rngs, True)
        bce_elem = bce(tp, batch['current_treatments'], cfg.treatment_mode)
        if cfg.balancing == 'domain_confusion':
            bce_elem = alpha * bce_elem
        return masked_mean(bce_elem, batch['active_entries'][..., 0])

    def run(params, data, rng):
        n = data['outputs'].shape[0]
        bs = min(cfg.batch_size, n)

        def epoch_step(carry, epoch):
            p, s0, s1, ema, count, rng = carry
            alpha = alpha_at_epoch(epoch, cfg.epochs, cfg.alpha,
                                   cfg.alpha_rate, cfg.update_alpha)
            rng, shuffle_rng = jax.random.split(rng)
            batches = make_batches(shuffle_rng, n, bs)

            def one_batch(carry, idx):
                p, s0, s1, ema, count, rng = carry
                rng, r0, r1, r_aug = jax.random.split(rng, 4)
                batch = jax.tree_util.tree_map(lambda a: a[idx], data)
                if augment_fn is not None:
                    # e.g. CT masked-vitals augmentation (ct.py:116-126):
                    # both optimizer losses see the augmented batch
                    batch = augment_fn(batch, r_aug)

                g0 = jax.grad(loss0)(p, ema, batch, alpha, {'dropout': r0})
                upd0, s0 = opt0.update(g0, s0, p)
                p = optax.apply_updates(p, upd0)

                g1 = jax.grad(loss1)(p, ema, batch, alpha, {'dropout': r1})
                upd1, s1 = opt1.update(g1, s1, p)
                p = optax.apply_updates(p, upd1)
                # one EMA step per batch: each param belongs to exactly one
                # of the reference's two EMA objects, each updated once per
                # batch
                if cfg.weights_ema:
                    ema, count = _ema_update(ema, p, count, cfg.beta)
                return (p, s0, s1, ema, count, rng), None

            carry, _ = jax.lax.scan(one_batch, (p, s0, s1, ema, count, rng),
                                    batches)
            return carry, None

        carry = (params, opt0.init(params), opt1.init(params), params,
                 jnp.asarray(0.0), rng)
        carry, _ = jax.lax.scan(epoch_step, carry,
                                jnp.arange(cfg.epochs, dtype=jnp.float32))
        return carry[0], carry[3]

    return run


def fit_br_model(apply_fn: Callable, params, data: dict, cfg: TrainConfig,
                 treatment_mask_tree, rng, treatment_cfg: TrainConfig = None,
                 augment_fn: Callable = None):
    """Single-seed two-optimizer adversarial fit; returns
    (params, ema_params) — prediction should use EMA weights for the
    non-treatment partition (predict_step, time_varying_model.py:599-608).
    """
    run = make_br_train_fn(apply_fn, cfg, treatment_mask_tree,
                           treatment_cfg, augment_fn=augment_fn)
    return jax.jit(run)(params, data, rng)


def make_simple_train_fn(loss_fn: Callable, cfg: TrainConfig,
                         n_rows: int) -> Callable:
    """Single-optimizer masked training (RMSN sub-networks, G-Net) as a
    pure program ``run(params, data, rng) -> params``;
    loss_fn(params, batch, rngs) -> scalar.  Like `make_br_train_fn`,
    ``jax.jit(jax.vmap(run))`` trains a whole seed column in one dispatch.
    `n_rows` is static (batch-count shapes depend on it)."""
    opt = _base_optimizer(cfg)
    bs = min(cfg.batch_size, n_rows)

    def run(params, data, rng):
        def epoch_step(carry, epoch):
            p, s, rng = carry
            rng, shuffle_rng = jax.random.split(rng)
            batches = make_batches(shuffle_rng, n_rows, bs)

            def one_batch(carry, idx):
                p, s, rng = carry
                rng, r = jax.random.split(rng)
                batch = jax.tree_util.tree_map(lambda a: a[idx], data)
                g = jax.grad(loss_fn)(p, batch, {'dropout': r})
                upd, s = opt.update(g, s, p)
                p = optax.apply_updates(p, upd)
                return (p, s, rng), None

            carry, _ = jax.lax.scan(one_batch, (p, s, rng), batches)
            return carry, None

        carry, _ = jax.lax.scan(epoch_step, (params, opt.init(params), rng),
                                jnp.arange(cfg.epochs))
        return carry[0]

    return run


def fit_simple(loss_fn: Callable, params, data: dict, cfg: TrainConfig, rng):
    """Single-seed single-optimizer fit (see make_simple_train_fn)."""
    n = next(iter(data.values())).shape[0]
    run = make_simple_train_fn(loss_fn, cfg, n)
    return jax.jit(run)(params, data, rng)


def treatment_head_mask(params, head_name='br_treatment_outcome_head'):
    """Pytree mask for the adversarial-classifier params (linear2/linear3 of
    the BR head, utils.py:79)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mask_leaves = []
    for path, _ in flat:
        keys = [getattr(k, 'key', getattr(k, 'name', str(k))) for k in path]
        in_head = any(head_name == k for k in keys)
        is_treat = any(k in ('linear2', 'linear3') for k in keys)
        mask_leaves.append(bool(in_head and is_treat))
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)
