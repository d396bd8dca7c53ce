"""Fused blockwise (flash-style) attention as a Pallas TPU kernel.

At the reference's default geometry the encoder self-attention is only
~(560/32)^2 = 324 tokens (reference transformers.py:266-275), where plain XLA
attention is already near-optimal. This kernel is the designed-in scaling
path (SURVEY §5.7): blockwise over the KV axis with an online softmax, so
memory stays O(block) instead of O(T^2). Backward is also kernelized
(flash-style: dq streamed over kv blocks, dk/dv streamed over query blocks,
p rebuilt from the forward's saved per-row log-sum-exp). Measured on v5e,
d=64, bf16, min over content-chained chunks: forward-only T=12800 8.7
ms/call vs 25.2 XLA (2.9x); fwd+bwd T=12800 18.7 vs 58.1 (3.1x), T=1600
(ViT-p16 geometry, BH=48) 3.54 vs 6.62 (1.9x). At small token counts
(T<~1000) XLA attention is faster — keep the default off there. Enabled
per-model with ``ModelConfig.use_pallas_attention``.

Layout: q/k/v are [BH, T, D] (batch*heads folded); the grid is
(BH, ceil(Tq/BLOCK_Q)); each program streams KV blocks from VMEM, keeping
running max/denominator in f32 (the numerically safe online softmax).
Head dims are zero-padded to the 128-lane width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes tuned on v5e at large token counts (T=12800, d=64):
# 256/512 reaches ~39 TFLOP/s vs ~13 for XLA attention at the same shape
# (2.9x); 128/128 was 3.9x slower than this. Small token counts should use
# the XLA path (use_pallas_attention=False, the default).
BLOCK_Q = 256
BLOCK_K = 512
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, t_k: int,
                      scale: float, n_kv_blocks: int):
    q = q_ref[0].astype(jnp.float32) * scale  # [BLOCK_Q, D_pad]

    def body(kv_i, carry):
        acc, m_run, d_run = carry
        k_blk = k_ref[0, pl.ds(kv_i * BLOCK_K, BLOCK_K), :].astype(
            jnp.float32)  # [BLOCK_K, D_pad]
        v_blk = v_ref[0, pl.ds(kv_i * BLOCK_K, BLOCK_K), :].astype(
            jnp.float32)
        logits = jnp.dot(q, k_blk.T,
                         preferred_element_type=jnp.float32)  # [BQ, BK]
        # mask out padded kv positions
        kv_ids = kv_i * BLOCK_K + lax.broadcasted_iota(
            jnp.int32, (1, BLOCK_K), 1)
        logits = jnp.where(kv_ids < t_k, logits, _NEG)

        m_new = jnp.maximum(m_run, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)  # [BQ, BK]
        alpha = jnp.exp(m_run - m_new)
        d_new = d_run * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, d_new

    d_pad = q.shape[-1]
    acc0 = jnp.zeros((BLOCK_Q, d_pad), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), _NEG, jnp.float32)
    d0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m_run, denom = lax.fori_loop(0, n_kv_blocks, body, (acc0, m0, d0))
    o_ref[0] = (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)
    # log-sum-exp of the scaled logits per query row, lane-replicated to a
    # [BQ, 128] tile (the Mosaic-friendly per-row-scalar layout); consumed
    # by the backward kernels to rebuild p without a second online pass.
    lse = m_run + jnp.log(jnp.maximum(denom, 1e-30))  # [BQ, 1]
    lse_ref[0] = jnp.broadcast_to(lse, (BLOCK_Q, 128))


def _pad_qkv(q, k, v):
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(t_q, BLOCK_Q)
    tk_pad = _round_up(t_k, BLOCK_K)

    def pad(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]),
                           (0, d_pad - d)))

    return pad(q, tq_pad), pad(k, tk_pad), pad(v, tk_pad)


def _fused_attention_fwd_impl(q: jnp.ndarray, k: jnp.ndarray,
                              v: jnp.ndarray, interpret: bool):
    """Kernel-backed forward (see fused_attention). Returns (out, lse) with
    lse the per-query log-sum-exp, lane-replicated [BH, Tq_pad, 128] f32."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    scale = 1.0 / float(d) ** 0.5
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(t_q, BLOCK_Q)
    tk_pad = _round_up(t_k, BLOCK_K)
    qp, kp, vp = _pad_qkv(q, k, v)
    n_kv_blocks = tk_pad // BLOCK_K

    kernel = functools.partial(_attention_kernel, t_k=t_k, scale=scale,
                               n_kv_blocks=n_kv_blocks)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, tq_pad // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, tq_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t_q, :d], lse


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, *,
               t_k: int, scale: float, n_kv_blocks: int):
    """dq for one query block: stream kv blocks, rebuild p from lse,
    ds = p * (dO V^T - delta), dq = scale * ds K."""
    qs = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]
    g = g_ref[0].astype(jnp.float32)  # [BQ, D]
    lse = lse_ref[0][:, :1]  # [BQ, 1]
    delta = delta_ref[0][:, :1]  # [BQ, 1]

    def body(kv_i, acc):
        k_blk = k_ref[0, pl.ds(kv_i * BLOCK_K, BLOCK_K), :].astype(
            jnp.float32)
        v_blk = v_ref[0, pl.ds(kv_i * BLOCK_K, BLOCK_K), :].astype(
            jnp.float32)
        logits = jnp.dot(qs, k_blk.T, preferred_element_type=jnp.float32)
        kv_ids = kv_i * BLOCK_K + lax.broadcasted_iota(
            jnp.int32, (1, BLOCK_K), 1)
        logits = jnp.where(kv_ids < t_k, logits, _NEG)
        p = jnp.exp(logits - lse)  # [BQ, BK]
        dp = jnp.dot(g, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    acc0 = jnp.zeros(qs.shape, jnp.float32)
    acc = lax.fori_loop(0, n_kv_blocks, body, acc0)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _dkdv_kernel(k_ref, v_ref, q_ref, g_ref, lse_ref, delta_ref, dk_ref,
                 dv_ref, *, t_q: int, scale: float, n_q_blocks: int):
    """dk/dv for one kv block: stream query blocks; contractions over the
    query axis use dot_general on dim 0 so no in-kernel transposes are
    materialized. Query rows >= t_q (zero padding) are masked out of p."""
    k_blk = k_ref[0].astype(jnp.float32)  # [BK, D]
    v_blk = v_ref[0].astype(jnp.float32)  # [BK, D]
    contract_q = (((0,), (0,)), ((), ()))  # "qk,qd->kd"

    def body(q_i, carry):
        dk_acc, dv_acc = carry
        qs = q_ref[0, pl.ds(q_i * BLOCK_Q, BLOCK_Q), :].astype(
            jnp.float32) * scale  # [BQ, D]
        g = g_ref[0, pl.ds(q_i * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(q_i * BLOCK_Q, BLOCK_Q), :1]  # [BQ, 1]
        delta = delta_ref[0, pl.ds(q_i * BLOCK_Q, BLOCK_Q), :1]
        logits = jnp.dot(qs, k_blk.T, preferred_element_type=jnp.float32)
        p = jnp.exp(logits - lse)  # [BQ, BK]
        q_ids = q_i * BLOCK_Q + lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, 1), 0)
        p = jnp.where(q_ids < t_q, p, 0.0)
        dv_acc = dv_acc + lax.dot_general(
            p, g, contract_q, preferred_element_type=jnp.float32)
        dp = jnp.dot(g, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        # accumulating against the pre-scaled q folds in dk's scale factor
        dk_acc = dk_acc + lax.dot_general(
            ds, qs, contract_q, preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    zeros = jnp.zeros(k_blk.shape, jnp.float32)
    dk_acc, dv_acc = lax.fori_loop(0, n_q_blocks, body, (zeros, zeros))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, o, lse, g, interpret: bool,
                              g_lse=None):
    """Flash-style backward: two Pallas kernels (dq over query blocks;
    dk/dv over kv blocks) rebuilding p from the forward's saved lse;
    delta = rowsum(dO * O) is one cheap XLA pass.

    ``lse`` arrives as the single-lane residual [BH, Tq_pad, 1] and is
    re-broadcast to the kernels' [.., 128] tile layout here.

    ``g_lse`` ([BH, Tq] f32 or None) is the cotangent of the per-row
    log-sum-exp when the caller consumes it (fused_attention_with_lse).
    Since d lse / d logits = p, its whole contribution is
    ds += g_lse * p = p * (-(-g_lse)) — i.e. it folds into delta as
    ``delta - g_lse`` with no kernel changes."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    scale = 1.0 / float(d) ** 0.5
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(t_q, BLOCK_Q)
    tk_pad = _round_up(t_k, BLOCK_K)
    qp, kp, vp = _pad_qkv(q, k, v)
    gp = jnp.pad(g, ((0, 0), (0, tq_pad - t_q), (0, d_pad - d)))
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if g_lse is not None:
        delta = delta - g_lse.astype(jnp.float32)
    delta = jnp.pad(delta, ((0, 0), (0, tq_pad - t_q)))
    delta = jnp.broadcast_to(delta[:, :, None], (bh, tq_pad, 128))
    lse = jnp.broadcast_to(lse, (bh, tq_pad, 128))
    n_kv_blocks = tk_pad // BLOCK_K
    n_q_blocks = tq_pad // BLOCK_Q

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, t_k=t_k, scale=scale,
                          n_kv_blocks=n_kv_blocks),
        grid=(bh, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, t_q=t_q, scale=scale,
                          n_q_blocks=n_q_blocks),
        grid=(bh, n_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_K, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_pad, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_pad, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
    )(kp, vp, qp, gp, lse, delta)
    return (dq[:, :t_q, :d], dk[:, :t_k, :d], dv[:, :t_k, :d])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, interpret):
    out, _ = _fused_attention_fwd_impl(q, k, v, interpret)
    return out


def _fwd(q, k, v, interpret):
    out, lse = _fused_attention_fwd_impl(q, k, v, interpret)
    # keep ONE lane of the lane-replicated lse tile as the residual: holding
    # the full [BH, Tq_pad, 128] between forward and backward would cost
    # 128x the HBM (e.g. ~314 MB live residuals for the ViT-p16 flagship)
    return out, (q, k, v, out, lse[:, :, :1])


def _bwd(interpret, residuals, g):
    q, k, v, o, lse = residuals
    return _fused_attention_bwd_impl(q, k, v, o, lse, g, interpret)


_fused_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_with_lse(q, k, v, interpret):
    out, lse = _fused_attention_fwd_impl(q, k, v, interpret)
    return out, lse[:, :q.shape[1], 0]


def _fwd_with_lse(q, k, v, interpret):
    out, lse = _fused_attention_fwd_impl(q, k, v, interpret)
    return (out, lse[:, :q.shape[1], 0]), (q, k, v, out, lse[:, :, :1])


def _bwd_with_lse(interpret, residuals, cotangents):
    q, k, v, o, lse = residuals
    g, g_lse = cotangents
    return _fused_attention_bwd_impl(q, k, v, o, lse, g, interpret,
                                     g_lse=g_lse)


_fused_attention_with_lse.defvjp(_fwd_with_lse, _bwd_with_lse)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             interpret: bool = False):
    """Like fused_attention, but also returns the per-query-row log-sum-exp
    of the scaled logits ([BH, Tq] f32). The pair (out, lse) is exactly what
    an *exact* cross-shard softmax merge needs (parallel/context_parallel.py
    uses it to run the kernel per KV shard and combine over the mesh), and
    both outputs are differentiable: the lse cotangent folds into the flash
    backward's delta term."""
    return _fused_attention_with_lse(q, k, v, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Softmax(q k^T / sqrt(d)) v with blockwise online softmax (Pallas
    forward kernel + flash-style Pallas backward kernels: dq streamed over
    kv blocks, dk/dv streamed over query blocks, p rebuilt from the saved
    per-row log-sum-exp — exact gradients, O(block) memory end to end).

    Args:
      q: [BH, Tq, D]; k, v: [BH, Tk, D] (any float dtype; f32 accumulation).

    Returns: [BH, Tq, D] in q's dtype.
    """
    return _fused_attention(q, k, v, interpret)


def attention_reference(q, k, v):
    """Plain XLA attention for testing."""
    d = q.shape[-1]
    logits = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / float(d) ** 0.5
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bsd->btd", p, v.astype(jnp.float32)).astype(
        q.dtype)
