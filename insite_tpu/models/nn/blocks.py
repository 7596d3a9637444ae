"""Shared neural building blocks for the baselines (flax.linen).

JAX re-design of the reference torch modules:
- grad_reverse gradient-reversal       (src/models/utils.py:13-28)
- BRTreatmentOutcomeHead               (utils.py:52-100)
- ROutcomeVitalsHead (G-Net)           (utils.py:103-143)
- VariationalLSTM (per-batch-sampled dropout masks, utils_lstm.py:5-48)
- relative/absolute positional encodings, multi-headed attention with
  relative PE, position-wise FFN, encoder/decoder/multi-input transformer
  blocks                               (utils_transformer.py:7-321)

All sequence modules take ``[B, T, D]`` and are pure functions of (params,
rngs) — trainable under one jitted `lax.scan` training loop.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchDense(nn.Module):
    """Dense layer with torch ``nn.Linear``'s default init
    (``reset_parameters``: kaiming_uniform(a=sqrt(5)) kernel, which reduces
    to U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and a same-bound uniform bias).

    The reference's baselines are tiny (seq_hidden_units 16-64) and train
    only 100 epochs, so the init *scale* is part of the training dynamics;
    flax's lecun_normal + zero-bias default measurably shifts final RMSE on
    EQ_4_D.  Parity target: torch.nn.Linear as used throughout
    src/models/utils.py + utils_transformer.py.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param('kernel', _torch_uniform(bound),
                            (fan_in, self.features))
        bias = self.param('bias', _torch_uniform(bound), (self.features,))
        return x @ kernel + bias


@jax.custom_vjp
def _grad_reverse(x, scale):
    return x


def _grad_reverse_fwd(x, scale):
    return x, scale


def _grad_reverse_bwd(scale, g):
    return (-scale * g, None)


_grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


def grad_reverse(x, scale=1.0):
    """Identity forward, negated+scaled gradient (utils.py:13-28)."""
    return _grad_reverse(x, jnp.asarray(scale, x.dtype))


def bce(treatment_pred, current_treatments, mode):
    """Per-(sample, time) treatment loss (utils.py:43-49): softmax
    cross-entropy for multiclass, mean sigmoid BCE for multilabel.
    treatment_pred are logits [B, T, A]."""
    if mode == 'multiclass':
        logp = jax.nn.log_softmax(treatment_pred, axis=-1)
        return -(current_treatments * logp).sum(-1)
    elif mode == 'multilabel':
        logp = jax.nn.log_sigmoid(treatment_pred)
        lognotp = jax.nn.log_sigmoid(-treatment_pred)
        return -(current_treatments * logp +
                 (1 - current_treatments) * lognotp).mean(-1)
    raise NotImplementedError(mode)


class BRTreatmentOutcomeHead(nn.Module):
    """Balanced-representation projection + adversarial treatment classifier
    + treatment-conditioned outcome head (utils.py:52-100)."""

    br_size: int
    fc_hidden_units: int
    dim_treatments: int
    dim_outcome: int
    balancing: str = 'grad_reverse'

    def setup(self):
        self.linear1 = TorchDense(self.br_size)
        self.linear2 = TorchDense(self.fc_hidden_units)
        self.linear3 = TorchDense(self.dim_treatments)
        self.linear4 = TorchDense(self.fc_hidden_units)
        self.linear5 = TorchDense(self.dim_outcome)

    def build_br(self, seq_output):
        return nn.elu(self.linear1(seq_output))

    def build_treatment(self, br, alpha, detached=False):
        if detached:
            br = jax.lax.stop_gradient(br)
        if self.balancing == 'grad_reverse':
            br = grad_reverse(br, alpha)
        h = nn.elu(self.linear2(br))
        return self.linear3(h)

    def build_outcome(self, br, current_treatment):
        x = jnp.concatenate([br, current_treatment], axis=-1)
        h = nn.elu(self.linear4(x))
        return self.linear5(h)

    def __call__(self, seq_output, current_treatment, alpha=0.0,
                 detach_treatment=False):
        br = self.build_br(seq_output)
        treatment_pred = self.build_treatment(br, alpha, detach_treatment)
        outcome_pred = self.build_outcome(br, current_treatment)
        return treatment_pred, outcome_pred, br


class ROutcomeVitalsHead(nn.Module):
    """G-Net sequential conditional heads (utils.py:103-143)."""

    r_size: int
    fc_hidden_units: int
    comp_sizes: tuple

    @nn.compact
    def __call__(self, seq_output):
        r = nn.elu(TorchDense(self.r_size)(seq_output))
        outs = []
        for size in self.comp_sizes:
            h = nn.elu(TorchDense(self.fc_hidden_units)(r))
            out = TorchDense(size)(h)
            r = jnp.concatenate([out, r], axis=-1)
            outs.append(out)
        return jnp.concatenate(outs, axis=-1)


class VariationalLSTM(nn.Module):
    """Stacked LSTM with variational dropout masks sampled once per batch
    (utils_lstm.py:5-48).  ``init_states`` seeds both h and c (decoder
    warm-start from the encoder BR, utils_lstm.py:26-29)."""

    hidden_size: int
    num_layer: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, init_states=None, train: bool = False):
        B = x.shape[0]
        H = self.hidden_size
        h = x
        for layer in range(self.num_layer):
            in_dim = h.shape[-1]
            # torch LSTMCell parameterisation: uniform(-1/sqrt(H), 1/sqrt(H))
            bound = 1.0 / math.sqrt(H)
            init = nn.initializers.uniform(scale=2 * bound)

            def shifted(key, shape, dtype=jnp.float32):
                return init(key, shape, dtype) - bound

            W_ih = self.param(f'w_ih_{layer}', shifted, (in_dim, 4 * H))
            W_hh = self.param(f'w_hh_{layer}', shifted, (H, 4 * H))
            # torch keeps two bias vectors (b_ih + b_hh), both U(-1/sqrt(H),
            # 1/sqrt(H)) and summed in the gate computation — their sum is
            # triangular-distributed, not uniform, so keep both for parity
            b = self.param(f'b_{layer}', shifted, (4 * H,))
            b_hh = self.param(f'b_hh_{layer}', shifted, (4 * H,))
            b = b + b_hh

            # the scan carry must match the gate computation's promoted
            # dtype (x @ W), not init_states' (e.g. f32 adapter output
            # feeding an f64 sequence under the x64 test backend)
            comp_dtype = jnp.result_type(h.dtype, W_ih.dtype)
            if init_states is None:
                hx = jnp.zeros((B, H), comp_dtype)
                cx = jnp.zeros((B, H), comp_dtype)
            else:
                hx = cx = init_states.astype(comp_dtype)
            if train and self.dropout_rate > 0.0:
                rng = self.make_rng('dropout')
                keys = jax.random.split(rng, 3)
                keep = 1.0 - self.dropout_rate
                out_m, h_m, c_m = [
                    jax.random.bernoulli(k, keep, (B, H)).astype(x.dtype)
                    / keep for k in keys]
            else:
                out_m = h_m = c_m = jnp.ones((B, H), x.dtype)

            def step(carry, x_t):
                hx, cx = carry
                gates = x_t @ W_ih + hx @ W_hh + b
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                cx2 = nn.sigmoid(f) * cx + nn.sigmoid(i) * jnp.tanh(g)
                hx2 = nn.sigmoid(o) * jnp.tanh(cx2)
                out = hx2 * out_m
                return (hx2 * h_m, cx2 * c_m), out

            (_, _), outputs = jax.lax.scan(step, (hx, cx),
                                           jnp.moveaxis(h, 1, 0))
            h = jnp.moveaxis(outputs, 0, 1)
        return h


# ---------------------------------------------------------------------------
# transformer pieces (utils_transformer.py)

def fixed_sin_cos(d_model: int, max_len: int):
    position = jnp.arange(max_len)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2) * (-math.log(1e4) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class AbsolutePositionalEncoding(nn.Module):
    max_len: int
    d_model: int
    trainable: bool = False

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        if self.trainable:
            table = self.param('pe', nn.initializers.normal(1.0),
                               (self.max_len, self.d_model))
        else:
            table = fixed_sin_cos(self.d_model, self.max_len)
        return jnp.broadcast_to(table[None, :T, :],
                                (x.shape[0], T, self.d_model))


class RelativePositionalEncoding(nn.Module):
    """Shared-across-heads relative PE table
    (utils_transformer.py:47-74)."""

    max_relative_position: int
    d_model: int
    trainable: bool = True
    cross_attn: bool = False

    @nn.compact
    def __call__(self, length_q: int, length_k: int):
        num = (self.max_relative_position * 2 + 1 if not self.cross_attn
               else self.max_relative_position + 1)
        if self.trainable:
            table = self.param('embeddings_table',
                               nn.initializers.normal(1.0),
                               (num, self.d_model))
        else:
            table = fixed_sin_cos(self.d_model,
                                  self.max_relative_position * 2 + 1)
        if self.cross_attn:
            dist = jnp.arange(length_k - 1, -1, -1)[None, :] + \
                jnp.arange(length_q)[:, None]
            dist = jnp.clip(dist, -self.max_relative_position,
                            self.max_relative_position)
        else:
            dist = jnp.arange(length_k)[None, :] - \
                jnp.arange(length_q)[:, None]
            dist = jnp.clip(dist, -self.max_relative_position,
                            self.max_relative_position) + \
                self.max_relative_position
        return table[dist]                     # [Tq, Tk, d]


class MultiHeadedAttention(nn.Module):
    """Multi-head attention with optional relative PE on keys/values and a
    residual + LayerNorm on the query stream
    (utils_transformer.py:90-162)."""

    num_heads: int
    d_model: int
    head_size: Optional[int] = None
    dropout: float = 0.0
    rel_pos_k: bool = False
    rel_pos_v: bool = False
    max_relative_position: int = 15
    final_layer: bool = False

    @nn.compact
    def __call__(self, query, key, value, mask=None, one_direction=True,
                 train: bool = False, rel_k=None, rel_v=None):
        hs = self.head_size or self.d_model // self.num_heads
        B, Tq, _ = query.shape
        Tk = key.shape[1]

        def proj(x, name):
            y = TorchDense(self.num_heads * hs, name=name)(x)
            return y.reshape(B, -1, self.num_heads, hs).transpose(0, 2, 1, 3)

        q = proj(query, 'q_proj')
        k = proj(key, 'k_proj')
        v = proj(value, 'v_proj')

        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        # rel_k/rel_v: externally computed shared PE tables (the reference
        # creates ONE k and ONE v table per model, reused by every
        # attention module, ct.py:92-93); falls back to per-module tables
        if rel_k is not None:
            scores = scores + jnp.einsum('bhqd,qkd->bhqk', q, rel_k)
        elif self.rel_pos_k:
            R_k = RelativePositionalEncoding(
                self.max_relative_position, hs, name='rel_pe_k')(Tq, Tk)
            scores = scores + jnp.einsum('bhqd,qkd->bhqk', q, R_k)
        scores = scores / math.sqrt(hs)
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        if one_direction:
            causal = jnp.tril(jnp.ones((Tq, Tk)))
            scores = jnp.where(causal[None, None] == 0, -1e9, scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        # attention-map visualization hook (reference uses forward hooks,
        # edct.py:194-227); no-op unless 'intermediates' is made mutable
        self.sow('intermediates', 'attention', p_attn)
        p_attn = nn.Dropout(self.dropout, deterministic=not train)(p_attn)
        out = jnp.einsum('bhqk,bhkd->bhqd', p_attn, v)
        if rel_v is not None:
            out = out + jnp.einsum('bhqv,qvd->bhqd', p_attn, rel_v)
        elif self.rel_pos_v:
            R_v = RelativePositionalEncoding(
                self.max_relative_position, hs, name='rel_pe_v')(Tq, Tk)
            out = out + jnp.einsum('bhqv,qvd->bhqd', p_attn, R_v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.num_heads * hs)
        if self.final_layer:
            out = TorchDense(self.d_model, name='final')(out)
        return nn.LayerNorm(epsilon=1e-6)(out + query)


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = TorchDense(self.d_ff)(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(h))
        h = TorchDense(self.d_model)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-6)(h + x)


class TransformerEncoderBlock(nn.Module):
    """Self-attention + FFN (utils_transformer.py:179-193)."""

    hidden: int
    attn_heads: int
    head_size: int
    feed_forward_hidden: int
    dropout: float
    attn_dropout: float
    max_relative_position: int = 15

    @nn.compact
    def __call__(self, x, active_entries, train: bool = False,
                 rel_k=None, rel_v=None):
        mask = active_entries[:, None, None, :, 0] * \
            jnp.ones((1, 1, x.shape[1], 1))
        x = MultiHeadedAttention(
            self.attn_heads, self.hidden, self.head_size, self.attn_dropout,
            rel_pos_k=rel_k is None, rel_pos_v=rel_v is None,
            max_relative_position=self.max_relative_position,
            final_layer=True, name='self_attention')(
                x, x, x, mask, True, train, rel_k, rel_v)
        return PositionwiseFeedForward(
            self.hidden, self.feed_forward_hidden, self.dropout,
            name='feed_forward')(x, train)


class TransformerDecoderBlock(nn.Module):
    """Self-attention + cross-attention over encoder states + FFN
    (utils_transformer.py:196-217)."""

    hidden: int
    attn_heads: int
    head_size: int
    feed_forward_hidden: int
    dropout: float
    attn_dropout: float
    max_relative_position: int = 15

    @nn.compact
    def __call__(self, x, encoder_x, active_entries, active_encoder_br,
                 train: bool = False, rel_k=None, rel_v=None,
                 cross_rel_k=None, cross_rel_v=None):
        Tq = x.shape[1]
        self_mask = active_entries[:, None, None, :, 0] * \
            jnp.ones((1, 1, Tq, 1))
        cross_mask = (active_encoder_br[:, None, :] *
                      active_entries[:, :, :1])[:, None]
        x = MultiHeadedAttention(
            self.attn_heads, self.hidden, self.head_size, self.attn_dropout,
            rel_pos_k=rel_k is None, rel_pos_v=rel_v is None,
            max_relative_position=self.max_relative_position,
            name='self_attention')(x, x, x, self_mask, True, train,
                                   rel_k, rel_v)
        # cross-attention PEs use the cross_attn distance scheme
        # (utils_transformer.py:57-63 / reference edct.py:99-104)
        x = MultiHeadedAttention(
            self.attn_heads, self.hidden, self.head_size, self.attn_dropout,
            rel_pos_k=False, rel_pos_v=False,
            max_relative_position=self.max_relative_position,
            name='cross_attention')(x, encoder_x, encoder_x, cross_mask,
                                    False, train, cross_rel_k, cross_rel_v)
        return PositionwiseFeedForward(
            self.hidden, self.feed_forward_hidden, self.dropout,
            name='feed_forward')(x, train)


class TransformerMultiInputBlock(nn.Module):
    """CT's per-block multi-stream (treatments / outcomes [/ vitals]) self
    + cross attention with static-stream injection before the FFNs
    (utils_transformer.py:220-321).

    The 3-stream forward reproduces the reference's weight SHARING quirk
    faithfully (utils_transformer.py:286-315): the vitals stream reuses
    `self_attention_o` for its self-attention and the t/o cross-attention
    modules for every vitals cross-attention (`cross_attention_to` for
    t<-v and o<-v, `cross_attention_ot` for v<-t and v<-o) — the dedicated
    tv/vt/ov/vo modules the reference constructs are dead parameters its
    forward never calls, so they are not re-created here."""

    hidden: int
    attn_heads: int
    head_size: int
    feed_forward_hidden: int
    dropout: float
    attn_dropout: float
    max_relative_position: int = 15
    disable_cross_attention: bool = False

    @nn.compact
    def __call__(self, x_t, x_o, x_s, active_entries, train: bool = False,
                 rel_k=None, rel_v=None, x_v=None, active_vitals=None):
        T = x_t.shape[1]
        ao = active_entries[..., 0]                        # [B, T]
        mask = ao[:, None, None, :] * jnp.ones((1, 1, T, 1))

        def mha(name):
            return MultiHeadedAttention(
                self.attn_heads, self.hidden, self.head_size,
                self.attn_dropout, rel_pos_k=rel_k is None,
                rel_pos_v=rel_v is None,
                max_relative_position=self.max_relative_position, name=name)

        self_t = mha('self_attention_t')
        self_o = mha('self_attention_o')
        x_t_ = self_t(x_t, x_t, x_t, mask, True, train, rel_k, rel_v)
        x_o_ = self_o(x_o, x_o, x_o, mask, True, train, rel_k, rel_v)
        if not self.disable_cross_attention:
            cross_to = mha('cross_attention_to')
            cross_ot = mha('cross_attention_ot')
            x_to = cross_to(x_t_, x_o, x_o, mask, True, train, rel_k, rel_v)
            x_ot = cross_ot(x_o_, x_t, x_t, mask, True, train, rel_k, rel_v)
        else:
            x_to, x_ot = x_t_, x_o_

        if x_v is None:                                    # 2-stream CT
            out_t = PositionwiseFeedForward(
                self.hidden, self.feed_forward_hidden, self.dropout,
                name='ff_t')(x_to + x_s, train)
            out_o = PositionwiseFeedForward(
                self.hidden, self.feed_forward_hidden, self.dropout,
                name='ff_o')(x_ot + x_s, train)
            return out_t, out_o

        # ---- vitals stream (utils_transformer.py:302-321) ----------------
        av = (active_vitals if active_vitals is not None
              else active_entries)[..., 0]                 # [B, T]
        mask_v = av[:, None, None, :] * jnp.ones((1, 1, T, 1))
        # cross masks: query stream's activity x key stream's activity
        mask_to_v = (ao[:, :, None] * av[:, None, :])[:, None]
        mask_v_to = (av[:, :, None] * ao[:, None, :])[:, None]
        x_v_ = self_o(x_v, x_v, x_v, mask_v, True, train, rel_k, rel_v)
        if not self.disable_cross_attention:
            x_tv = cross_to(x_t_, x_v, x_v, mask_to_v, True, train,
                            rel_k, rel_v)
            x_ov = cross_to(x_o_, x_v, x_v, mask_to_v, True, train,
                            rel_k, rel_v)
            x_vt = cross_ot(x_v_, x_t, x_t, mask_v_to, True, train,
                            rel_k, rel_v)
            x_vo = cross_ot(x_v_, x_o, x_o, mask_v_to, True, train,
                            rel_k, rel_v)
        else:
            x_tv, x_ov, x_vo = 0.0, 0.0, 0.0
            x_vt = x_v_
        out_t = PositionwiseFeedForward(
            self.hidden, self.feed_forward_hidden, self.dropout,
            name='ff_t')(x_to + x_tv + x_s, train)
        out_o = PositionwiseFeedForward(
            self.hidden, self.feed_forward_hidden, self.dropout,
            name='ff_o')(x_ot + x_ov + x_s, train)
        out_v = PositionwiseFeedForward(
            self.hidden, self.feed_forward_hidden, self.dropout,
            name='ff_v')(x_vt + x_vo + x_s, train)
        return out_t, out_o, out_v
