"""LSH (Reformer-style) self-attention, TPU-native.

Fills the reference's ReformerLayer slot
(reference models/layers/SelfAttention_Family.py:226-264, which wraps the
optional pip dependency reformer_pytorch.LSHSelfAttention). Rebuilt for
XLA rather than translated: fixed shapes throughout, bucketing by random
rotations + argmax, token order recovered with a single argsort (XLA sort
lowers to an efficient TPU sort network), chunked attention as two batched
MXU matmuls per round, and the multi-round combine as a logsumexp weight —
no data-dependent shapes, no host sync.

Algorithm (Kitaev et al., "Reformer: The Efficient Transformer"):
  1. shared-QK projection; per hash round r, a random rotation
     R_r [dh, nb/2] gives bucket(t) = argmax([x R_r; -x R_r]).
  2. stable-sort tokens by bucket (position-tiebreak keeps causal order
     inside a bucket), reshape to chunks of ``chunk_len``.
  3. each chunk attends to itself and one chunk back (the paper's
     look-back window); self-pairs are soft-masked at -5e4 (shared-QK
     scores are maximal on the diagonal, so reformer masks self unless
     a token has no other in-bucket target — then self still wins over
     the -1e30 hard masks).
  4. un-sort outputs; rounds combine via softmax over their logsumexp
     masses.

Measured guidance (v5e, BASELINE.md): the MXU makes dense flash
attention so cheap that LSH only crosses over beyond ~32k tokens —
use it for parity/long-context experiments, not the standard configs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30
# self-pairs are NOT -inf: a token whose bucket holds no other target
# (e.g. the causal-first token) must still be able to attend itself —
# reformer_pytorch uses the same two-level masking
SELF_MASK = -5e4


def _bucket(qk: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """qk [..., N, dh], rot [dh, nb/2] -> int32 bucket ids [..., N]."""
    h = qk @ rot.astype(qk.dtype)
    return jnp.argmax(jnp.concatenate([h, -h], axis=-1), axis=-1)


def lsh_attention(qk: jnp.ndarray, v: jnp.ndarray, rng: jax.Array,
                  n_hashes: int = 4, bucket_size: int = 4,
                  causal: bool = False) -> jnp.ndarray:
    """qk, v: [B, H, N, dh] (shared query/key projection) -> [B, H, N, dh].

    N must be a multiple of ``chunk_len = 2 * bucket_size`` (pad first —
    ReformerLayer below does). Buckets ≈ N / bucket_size, so every chunk
    holds ~2 buckets and the look-back window covers hash spill-over.
    """
    B, H, N, dh = qk.shape
    chunk = 2 * bucket_size
    assert N % chunk == 0, (N, chunk)
    n_chunks = N // chunk
    nb = max(2, 2 * n_chunks)  # buckets, rounded to even
    scale = 1.0 / math.sqrt(dh)
    pos = jnp.arange(N)

    outs, masses = [], []
    for r in range(n_hashes):
        rot = jax.random.normal(jax.random.fold_in(rng, r), (dh, nb // 2),
                                jnp.float32)
        buckets = _bucket(qk.astype(jnp.float32), rot)  # [B, H, N]
        # stable sort keeps original positions in order inside a bucket
        # (bucket-major, position-minor) with no composite key that
        # could overflow at long N
        order = jnp.argsort(buckets, axis=-1, stable=True)
        inv = jnp.argsort(order, axis=-1)

        def take(x, idx):
            return jnp.take_along_axis(x, idx[..., None], axis=2)

        qs = take(qk, order).reshape(B, H, n_chunks, chunk, dh)
        vs = take(v, order).reshape(B, H, n_chunks, chunk, dh)
        # sorted positions ARE the permutation itself (pos = arange)
        ps = order.reshape(B, H, n_chunks, chunk)

        # keys = own chunk + one chunk back (rolled; chunk 0 wraps, which
        # the causal mask kills and non-causal tolerates as extra context)
        k_prev = jnp.roll(qs, 1, axis=2)
        v_prev = jnp.roll(vs, 1, axis=2)
        p_prev = jnp.roll(ps, 1, axis=2)
        ks = jnp.concatenate([k_prev, qs], axis=3)   # [B,H,C,2c,dh]
        vv = jnp.concatenate([v_prev, vs], axis=3)
        pk = jnp.concatenate([p_prev, ps], axis=3)   # [B,H,C,2c]

        # shared-QK: normalize keys (reformer normalizes k = qk / |qk|).
        # rsqrt(sumsq + eps), NOT norm(): d|x|/dx is NaN at the all-zero
        # padding tokens
        sumsq = jnp.sum(jnp.square(ks.astype(jnp.float32)), axis=-1,
                        keepdims=True)
        ks = (ks.astype(jnp.float32)
              * jax.lax.rsqrt(sumsq + 1e-12)).astype(ks.dtype)
        s = jnp.einsum("bhcqd,bhckd->bhcqk", qs, ks,
                       preferred_element_type=jnp.float32) * scale
        # mask self-pairs (shared-QK makes q.(q/|q|) the maximal score in
        # every row; reformer masks them so tokens prefer OTHER bucket
        # members, falling back to self only when nothing else survives)
        s = jnp.where(ps[..., :, None] == pk[..., None, :], SELF_MASK, s)
        if causal:
            s = jnp.where(ps[..., :, None] >= pk[..., None, :], s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p_ = jnp.exp(s - m)
        denom = jnp.sum(p_, axis=-1, keepdims=True)
        o = jnp.einsum("bhcqk,bhckd->bhcqd", (p_ / jnp.maximum(denom, 1e-30)
                                              ).astype(vv.dtype), vv)
        mass = (m + jnp.log(jnp.maximum(denom, 1e-30)))[..., 0]  # [B,H,C,c]

        o = o.reshape(B, H, N, dh)
        mass = mass.reshape(B, H, N)
        outs.append(take(o, inv))
        masses.append(jnp.take_along_axis(mass, inv, axis=-1))

    mass = jnp.stack(masses)                      # [R, B, H, N]
    w = jax.nn.softmax(mass, axis=0)[..., None]   # rounds weighting
    return jnp.sum(jnp.stack(outs) * w.astype(outs[0].dtype), axis=0)
