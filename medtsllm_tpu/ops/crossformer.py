"""Two-Stage Attention (Crossformer) layer
(reference models/layers/SelfAttention_Family.py:267-360).

Not used by any of the six registered reference models, but part of the
ops-library surface (SURVEY.md §2.6). Input/output [B, D, L, d_model]:
stage 1 attends across time segments per variable; stage 2 routes
cross-variable messages through a small learned router.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .attention import AttentionLayer, FullAttention


class TwoStageAttentionLayer(nn.Module):
    seg_num: int
    factor: int
    d_model: int
    n_heads: int
    d_ff: int | None = None
    dropout: float = 0.1
    attention_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attn_mask=None, *, deterministic: bool = True):
        B, D, L, dm = x.shape
        d_ff = self.d_ff or 4 * self.d_model
        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)

        def attn_layer(name):
            return AttentionLayer(
                FullAttention(mask_flag=False,
                              attention_dropout=self.attention_dropout),
                self.d_model, self.n_heads, name=name)

        def mlp(name, v):
            h = nn.Dense(d_ff, name=f"{name}_fc1")(v)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(self.d_model, name=f"{name}_fc2")(h)

        # stage 1: cross-time per variable
        time_in = x.reshape(B * D, L, dm)
        time_enc, _ = attn_layer("time_attention")(
            time_in, time_in, time_in, deterministic=deterministic)
        dim_in = nn.LayerNorm(name="norm1")(time_in + drop(time_enc))
        dim_in = nn.LayerNorm(name="norm2")(dim_in + drop(mlp("MLP1", dim_in)))

        # stage 2: cross-variable routing through learned router tokens
        dim_send = (dim_in.reshape(B, D, L, dm)
                    .transpose(0, 2, 1, 3).reshape(B * L, D, dm))
        router = self.param("router", nn.initializers.normal(1.0),
                            (self.seg_num, self.factor, self.d_model))
        batch_router = jnp.tile(router, (B, 1, 1))  # [(B L), factor, dm]
        dim_buffer, _ = attn_layer("dim_sender")(
            batch_router, dim_send, dim_send, deterministic=deterministic)
        dim_receive, _ = attn_layer("dim_receiver")(
            dim_send, dim_buffer, dim_buffer, deterministic=deterministic)
        dim_enc = nn.LayerNorm(name="norm3")(dim_send + drop(dim_receive))
        dim_enc = nn.LayerNorm(name="norm4")(dim_enc + drop(mlp("MLP2", dim_enc)))

        return (dim_enc.reshape(B, L, D, dm)
                .transpose(0, 2, 1, 3))
