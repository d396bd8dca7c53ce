"""Transformer building blocks (Flax), re-designed TPU-first.

Functional re-expression of reference: ModelComponents/transformers.py.
Semantics preserved exactly (so training behavior matches):

- hand-rolled MHA with the scale applied to QK logits and the attention mask
  applied **multiplicatively after softmax with no renormalization**
  (reference transformers.py:87-94 — a deliberate reference quirk, gated by
  ``post_softmax_mask``);
- residual blocks: attention -> dropout(0.1) -> add -> LayerNorm(eps=1e-3)
  (reference transformers.py:139-151);
- feed-forward at constant width (no 4x expansion; reference
  transformers.py:169-177);
- encoder self-attention with Q=K=features+positional, V=features
  (reference transformers.py:222-228);
- learned positional encoding initialized with the reference's alternating
  sin/cos over flattened position index (reference transformers.py:282-292);
- zero-initialized trainable object queries, ``encoder_key = value +
  positional`` (reference transformers.py:427-448);
- first decoder block has no self-attention (reference transformers.py:324);
  later blocks use plain Q=K=V self-attention without positional add
  (reference transformers.py:378-379, a NaN-motivated reference decision).

Documented reference BUG, deliberately NOT reproduced: the reference merges
attention heads with a raw Reshape of [B, H, T, D] to [B, T, H*D] without
transposing first (transformers.py:56-57, :100), scrambling different
tokens' head outputs together before the output projection. This
implementation uses the standard transpose-then-merge; the divergence is
pinned by tests/test_reference_parity.py::test_mha_vs_reference_with_same_weights.

TPU-first design notes: attention logits/softmax are computed in f32 with
``preferred_element_type`` so the MXU accumulates correctly under bf16
compute; everything else runs in the configured compute dtype; shapes are
static so XLA tiles all matmuls onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def trig_positional_init(num_positions: int, dim: int) -> np.ndarray:
    """Reference's positional-encoding init (transformers.py:282-292):
    ``denom = 2*(1+d)/dim``; position k uses sin(k/denom) when k is odd and
    cos(k/denom) when k is even."""
    k = np.arange(num_positions, dtype=np.float64)[:, None]
    d = np.arange(dim, dtype=np.float64)[None, :]
    denom = 2.0 * (1.0 + d) / dim
    even = k % 2  # 1 for odd k (reference's variable naming)
    odd = (k + 1) % 2
    return (even * np.sin(k / denom) + odd * np.cos(k / denom)).astype(
        np.float32)


class MultiheadAttention(nn.Module):
    """From-scratch MHA (reference transformers.py:18-102).

    head_dim = query_dim // num_heads; Q/K/V/output projections use
    glorot_normal. The mask (1 = keep) multiplies the post-softmax
    probabilities without renormalization when ``post_softmax_mask`` — the
    reference's behavior; set False for standard pre-softmax additive masking.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    post_softmax_mask: bool = True
    use_pallas: bool = False
    qk_norm: bool = False  # per-head LayerNorm on q/k (ViT spike stabilizer)

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        q_dim = query.shape[-1]
        head_dim = q_dim // self.num_heads
        proj = head_dim * self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            proj, kernel_init=nn.initializers.glorot_normal(),
            dtype=self.dtype, name=name)

        q = dense("query_projection")(query)
        k = dense("key_projection")(key)
        v = dense("value_projection")(value)

        def split(x):
            b, t, _ = x.shape
            return x.reshape(b, t, self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.qk_norm:
            # QK-norm (Dehghani et al., ViT-22B): bounds attention logits so
            # one head can't blow up the softmax mid-run — the p16 ViT's
            # training-spike mitigation (benchmarks/RESULTS.md round 3).
            # f32 norm over head_dim, learned scale, no bias; OFF for the
            # reference-parity DETR transformer.
            q = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                             dtype=jnp.float32, name="q_norm")(
                                 q.astype(jnp.float32)).astype(self.dtype)
            k = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                             dtype=jnp.float32, name="k_norm")(
                                 k.astype(jnp.float32)).astype(self.dtype)

        if self.use_pallas and mask is None:
            # fused blockwise attention kernel (ops/pallas_attention.py)
            from boosted_detr_tpu.ops.pallas_attention import fused_attention

            b, tq = q.shape[:2]
            tk = k.shape[1]
            fold = lambda x: jnp.swapaxes(x, 1, 2).reshape(  # noqa: E731
                b * self.num_heads, x.shape[1], head_dim)
            out = fused_attention(fold(q), fold(k), fold(v))
            out = out.reshape(b, self.num_heads, tq, head_dim)
            out = jnp.swapaxes(out, 1, 2).reshape(b, tq, proj)
            return nn.Dense(q_dim,
                            kernel_init=nn.initializers.glorot_normal(),
                            dtype=self.dtype, name="output_projection")(
                                out.astype(self.dtype))

        # logits in f32 on the MXU regardless of compute dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(head_dim))

        if mask is not None and not self.post_softmax_mask:
            logits = jnp.where(mask.astype(bool), logits, -1e30)

        probs = jax.nn.softmax(logits, axis=-1)

        if mask is not None and self.post_softmax_mask:
            # reference quirk: multiplicative post-softmax, no renorm
            # (transformers.py:89-94)
            probs = probs * mask.astype(probs.dtype)

        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        b, t = out.shape[:2]
        out = out.reshape(b, t, proj).astype(self.dtype)
        return nn.Dense(q_dim, kernel_init=nn.initializers.glorot_normal(),
                        dtype=self.dtype, name="output_projection")(out)


class AttentionBlock(nn.Module):
    """MHA + dropout + residual + LayerNorm (reference transformers.py:112-151)."""

    num_heads: int
    dropout_rate: float = 0.1
    layernorm_epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    post_softmax_mask: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query, key, value, *, mask=None, deterministic=True):
        attn = MultiheadAttention(self.num_heads, dtype=self.dtype,
                                  post_softmax_mask=self.post_softmax_mask,
                                  use_pallas=self.use_pallas,
                                  name="attention")(query, key, value, mask)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        # residual add in f32 (reference pins Add layers to float32,
        # transformers.py:136)
        x = query.astype(jnp.float32) + attn.astype(jnp.float32)
        x = nn.LayerNorm(epsilon=self.layernorm_epsilon, dtype=jnp.float32,
                         name="layer_norm")(x)
        return x.astype(self.dtype)


class FeedForwardBlock(nn.Module):
    """Constant-width Dense(relu)->Dense + dropout + residual + LayerNorm
    (reference transformers.py:161-193)."""

    dropout_rate: float = 0.1
    layernorm_epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        dim = x.shape[-1]
        h = nn.Dense(dim, kernel_init=nn.initializers.glorot_normal(),
                     dtype=self.dtype, name="dense_relu")(x)
        h = nn.relu(h)
        h = nn.Dense(dim, kernel_init=nn.initializers.glorot_normal(),
                     dtype=self.dtype, name="dense_linear")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = x.astype(jnp.float32) + h.astype(jnp.float32)
        out = nn.LayerNorm(epsilon=self.layernorm_epsilon, dtype=jnp.float32,
                           name="layer_norm")(out)
        return out.astype(self.dtype)


class EncoderBlock(nn.Module):
    """Self-attention (Q=K=feat+pos, V=feat) + FFN
    (reference transformers.py:200-235)."""

    num_heads: int
    dropout_rate: float = 0.1
    layernorm_epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    post_softmax_mask: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, features, positional, *, deterministic=True):
        qk = features + positional.astype(features.dtype)
        features = AttentionBlock(
            self.num_heads, self.dropout_rate, self.layernorm_epsilon,
            self.dtype, self.post_softmax_mask, self.use_pallas,
            name="self_attention")(
                qk, qk, features, deterministic=deterministic)
        # NOTE (fidelity): the reference passes the positional-augmented
        # tensor as the residual stream too (AttentionBlock adds its own
        # query input), i.e. residual = features + positional. Reproduce by
        # feeding qk as query; V stays plain features.
        return FeedForwardBlock(self.dropout_rate, self.layernorm_epsilon,
                                self.dtype, name="ffn")(
                                    features, deterministic=deterministic)


class ImageEncoder(nn.Module):
    """Flatten [B,R,C,D] -> tokens, add learned positional encoding,
    apply N encoder blocks (reference transformers.py:244-315).

    Returns (features [B, R*C, D], positional [B, R*C, D]); callers reshape
    back to the grid when needed (the reference round-trips shapes; we keep
    tokens flat on device and reshape only at module boundaries).
    """

    num_blocks: int
    num_heads: int
    dropout_rate: float = 0.1
    layernorm_epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    post_softmax_mask: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, features, *, deterministic=True):
        b, r, c, d = features.shape
        tokens = features.reshape(b, r * c, d)

        pos = self.param(
            "positional_encoding",
            lambda key, shape: jnp.asarray(trig_positional_init(r * c, d)),
            (r * c, d))
        pos_b = jnp.broadcast_to(pos[None], (b, r * c, d))

        for i in range(self.num_blocks):
            tokens = EncoderBlock(
                self.num_heads, self.dropout_rate, self.layernorm_epsilon,
                self.dtype, self.post_softmax_mask, self.use_pallas,
                name=f"block_{i}")(tokens, pos_b, deterministic=deterministic)
        return tokens, pos_b


class DecoderPrep(nn.Module):
    """Object queries + encoder key construction
    (reference transformers.py:397-450): ``encoder_key = encoder_value +
    positional`` (a DETR-vs-AIAYN difference the reference flags) and
    zero-initialized trainable queries tiled per batch."""

    num_object_preds: int
    decoder_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_tokens, positional_tokens):
        b = encoder_tokens.shape[0]
        encoder_key = (encoder_tokens.astype(jnp.float32)
                       + positional_tokens.astype(jnp.float32)).astype(
                           self.dtype)
        queries = self.param("object_queries", nn.initializers.zeros,
                             (self.num_object_preds, self.decoder_dim))
        decoder_features = jnp.broadcast_to(
            queries[None].astype(self.dtype),
            (b, self.num_object_preds, self.decoder_dim))
        # decoder_positional = decoder_features (reference
        # transformers.py:448); it is unused downstream because decoder
        # self-attention omits the positional add (transformers.py:378-379).
        return encoder_tokens, decoder_features, encoder_key, decoder_features


class DecoderBlock(nn.Module):
    """Decoder block: optional self-attention (plain Q=K=V), cross-attention
    against encoder key/value, FFN (reference transformers.py:324-394)."""

    num_heads: int
    self_attention: bool = True
    dropout_rate: float = 0.1
    layernorm_epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    post_softmax_mask: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, encoder_value, decoder_features, encoder_key,
                 *, deterministic=True):
        kw = dict(deterministic=deterministic)
        if self.self_attention:
            decoder_features = AttentionBlock(
                self.num_heads, self.dropout_rate, self.layernorm_epsilon,
                self.dtype, self.post_softmax_mask, self.use_pallas,
                name="self_attention")(
                    decoder_features, decoder_features, decoder_features, **kw)
        decoder_features = AttentionBlock(
            self.num_heads, self.dropout_rate, self.layernorm_epsilon,
            self.dtype, self.post_softmax_mask, self.use_pallas,
            name="cross_attention")(
                decoder_features, encoder_key, encoder_value, **kw)
        return FeedForwardBlock(self.dropout_rate, self.layernorm_epsilon,
                                self.dtype, name="ffn")(decoder_features, **kw)
