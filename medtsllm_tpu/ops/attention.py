"""Attention family (reference models/layers/SelfAttention_Family.py).

Implemented TPU-first: one fused einsum-softmax-einsum per call (XLA fuses
the elementwise chain into the MXU matmuls). Sequence lengths here are short
(patch counts, SURVEY.md §5.7), so plain attention is optimal; the long-seq
LLM backbone uses the Pallas flash kernel in ops/pallas/flash_attention.py.

ProbAttention (Informer) is re-designed for static shapes: top-u query
selection uses jax.lax.top_k with u fixed at trace time, and the "update
context" scatter becomes a where-select — no data-dependent shapes.

ReformerLayer (LSH attention, SelfAttention_Family.py:226-264) is unused by
all six registered reference models and is intentionally descoped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn


def _causal_mask(L: int, S: int) -> jnp.ndarray:
    return jnp.triu(jnp.ones((L, S), dtype=bool), k=1)


class FullAttention(nn.Module):
    """Scaled dot-product attention (SelfAttention_Family.py:55-90).
    queries [B,L,H,E], keys/values [B,S,H,E] -> [B,L,H,E]."""

    mask_flag: bool = True
    scale: float | None = None
    attention_dropout: float = 0.1
    output_attention: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        B, L, H, E = queries.shape
        scale = self.scale or 1.0 / math.sqrt(E)
        scores = jnp.einsum("blhe,bshe->bhls", queries, keys)
        if self.mask_flag:
            mask = _causal_mask(L, keys.shape[1]) if attn_mask is None else attn_mask
            scores = jnp.where(mask, -jnp.inf, scores)
        A = jax.nn.softmax(scale * scores, axis=-1)
        A = nn.Dropout(self.attention_dropout)(A, deterministic=deterministic)
        V = jnp.einsum("bhls,bshd->blhd", A, values)
        return (V, A) if self.output_attention else (V, None)


class DSAttention(nn.Module):
    """De-stationary attention (SelfAttention_Family.py:10-52): pre-softmax
    scores rescaled by learned tau/delta factors."""

    mask_flag: bool = True
    scale: float | None = None
    attention_dropout: float = 0.1
    output_attention: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        B, L, H, E = queries.shape
        scale = self.scale or 1.0 / math.sqrt(E)
        tau = 1.0 if tau is None else tau[:, None, None, None]
        delta = 0.0 if delta is None else delta[:, None, None, :]
        scores = jnp.einsum("blhe,bshe->bhls", queries, keys) * tau + delta
        if self.mask_flag:
            mask = _causal_mask(L, keys.shape[1]) if attn_mask is None else attn_mask
            scores = jnp.where(mask, -jnp.inf, scores)
        A = jax.nn.softmax(scale * scores, axis=-1)
        A = nn.Dropout(self.attention_dropout)(A, deterministic=deterministic)
        V = jnp.einsum("bhls,bshd->blhd", A, values)
        return (V, A) if self.output_attention else (V, None)


class ProbAttention(nn.Module):
    """Informer sparse attention (SelfAttention_Family.py:92-192), static-shape
    re-design: sample_k keys score all queries, the top-u queries attend fully,
    the rest take the context prior (mean or cumsum of values)."""

    mask_flag: bool = True
    factor: int = 5
    scale: float | None = None
    attention_dropout: float = 0.1
    output_attention: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        B, L_Q, H, D = queries.shape
        L_K = keys.shape[1]
        q = jnp.transpose(queries, (0, 2, 1, 3))  # [B,H,L,D]
        k = jnp.transpose(keys, (0, 2, 1, 3))
        v = jnp.transpose(values, (0, 2, 1, 3))

        U_part = min(int(self.factor * math.ceil(math.log(L_K))), L_K)
        u = min(int(self.factor * math.ceil(math.log(L_Q))), L_Q)

        # sample keys deterministically-spaced (reference samples uniformly;
        # static strided sampling keeps the graph shape-stable)
        sample_idx = jnp.linspace(0, L_K - 1, U_part).astype(jnp.int32)
        k_sample = k[:, :, sample_idx, :]  # [B,H,U,D]
        scores_sample = jnp.einsum("bhld,bhud->bhlu", q, k_sample)
        # sparsity measure M = max - sum/L_K: the reference divides the
        # SAMPLED sum by the FULL key count (SelfAttention_Family.py:120),
        # not by sample_k — not a mean; parity pinned by
        # test_reference_oracle_systems.py::test_prob_attention_sparse
        M = (jnp.max(scores_sample, axis=-1)
             - jnp.sum(scores_sample, axis=-1) / L_K)
        _, top_idx = jax.lax.top_k(M, u)  # [B,H,u]

        q_top = jnp.take_along_axis(q, top_idx[..., None], axis=2)  # [B,H,u,D]
        scores = jnp.einsum("bhud,bhkd->bhuk", q_top, k)
        scale = self.scale or 1.0 / math.sqrt(D)

        if self.mask_flag:
            # causal mask rows gathered at the top-u query positions
            causal = _causal_mask(L_Q, L_K)
            mask_rows = causal[top_idx]  # [B,H,u,L_K]
            scores = jnp.where(mask_rows, -jnp.inf, scores)
            context = jnp.cumsum(v, axis=2)  # causal prior
        else:
            context = jnp.broadcast_to(
                jnp.mean(v, axis=2, keepdims=True), v.shape)

        A = jax.nn.softmax(scale * scores, axis=-1)
        A = nn.Dropout(self.attention_dropout)(A, deterministic=deterministic)
        v_top = jnp.einsum("bhuk,bhkd->bhud", A, v)

        # scatter the attended top-u rows into the prior context
        onehot = jax.nn.one_hot(top_idx, L_Q, dtype=v.dtype)  # [B,H,u,L_Q]
        updated = jnp.einsum("bhul,bhud->bhld", onehot, v_top)
        selected = jnp.einsum("bhul,bhud->bhld", onehot, jnp.ones_like(v_top))
        context = jnp.where(selected > 0, updated, context)
        return jnp.transpose(context, (0, 2, 1, 3)), None


class AttentionLayer(nn.Module):
    """QKV projection wrapper (SelfAttention_Family.py:195-223)."""

    inner_attention: nn.Module
    d_model: int
    n_heads: int
    d_keys: int | None = None
    d_values: int | None = None

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        d_keys = self.d_keys or self.d_model // self.n_heads
        d_values = self.d_values or self.d_model // self.n_heads
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads

        q = nn.Dense(d_keys * H, name="query_projection")(queries).reshape(B, L, H, d_keys)
        k = nn.Dense(d_keys * H, name="key_projection")(keys).reshape(B, S, H, d_keys)
        v = nn.Dense(d_values * H, name="value_projection")(values).reshape(B, S, H, d_values)

        out, attn = self.inner_attention(q, k, v, attn_mask, tau, delta,
                                         deterministic=deterministic)
        out = out.reshape(B, L, -1)
        return nn.Dense(self.d_model, name="out_projection")(out), attn


class ReformerLayer(nn.Module):
    """LSH self-attention layer (SelfAttention_Family.py:226-264).

    The reference wraps the optional pip dependency
    ``reformer_pytorch.LSHSelfAttention``; here the inner LSH attention is
    the TPU-native implementation in ops/lsh_attention.py. Same drop-in
    interface as the other attention layers (queries == keys == values for
    self-attention; `fit_length` zero-pads N to a multiple of
    2 * bucket_size exactly like the reference's fit_length,
    SelfAttention_Family.py:248-258).
    """

    d_model: int
    n_heads: int
    causal: bool = False
    bucket_size: int = 4
    n_hashes: int = 4

    @nn.compact
    def __call__(self, queries, keys=None, values=None, attn_mask=None,
                 tau=None, delta=None, *, deterministic: bool = True):
        from .lsh_attention import lsh_attention

        B, N, _ = queries.shape
        H = self.n_heads
        dh = self.d_model // H
        chunk = 2 * self.bucket_size
        pad = (-N) % chunk
        x = jnp.pad(queries, ((0, 0), (0, pad), (0, 0))) if pad else queries

        # shared QK projection (Reformer ties queries and keys); bias-free
        # like reformer_pytorch's toqk/tov so zero-padded tokens stay
        # exactly zero (a bias would give pads nonzero keys/values that
        # real tokens could attend)
        qk = nn.Dense(dh * H, use_bias=False, name="qk_projection")(x)
        v = nn.Dense(dh * H, use_bias=False, name="value_projection")(x)
        L = N + pad
        qk = qk.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

        # hash rotations are a fixed PRNG constant (not trainable —
        # matches LSH theory and keeps jit static), salted by the module
        # path so stacked layers use independent hashes
        import zlib
        salt = zlib.crc32("/".join(map(str, self.path)).encode())
        rng = jax.random.PRNGKey(
            (self.bucket_size * 7919 + self.n_hashes + salt) % (2 ** 31))
        out = lsh_attention(qk, v, rng, n_hashes=self.n_hashes,
                            bucket_size=self.bucket_size, causal=self.causal)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)[:, :N]
        return nn.Dense(self.d_model, name="out_projection")(out), None
