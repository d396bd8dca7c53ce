"""Fused patchify-stem convolution as a Pallas TPU kernel.

The flagship's 8x8/s8 patchify stem (models/backbone.py, ``stem='patchify8'``)
is layout-hostile to XLA: a 3-channel 640px image enters the conv through a
f32->bf16 convert (0.66 ms) plus a relayout copy (0.61 ms), and the 3-channel
conv itself runs at ~12 TFLOP/s on the MXU because the tiny channel count
wastes the reduction lanes (fwd 0.64 ms + dW 0.60 ms) — together ~2.5 ms of a
16.2 ms train step (benchmarks/profile_step.py, benchmarks/RESULTS.md).

This kernel fuses convert + space-to-depth + matmul into ONE pass over HBM:

- the image is viewed as [B, H, Wo, P*C] (a free minor-dim regroup: the
  (w, c) -> (wo, dj*C+c) flatten preserves linear order, so XLA bitcasts);
- each grid step DMAs a CONTIGUOUS span of ROWS*P full image rows to VMEM,
  converts to the compute dtype there, assembles the [ROWS*Wo, P*P*C] patch
  matrix with free reshapes + sublane slices (one basic slice per intra-patch
  row di — no lane-crossing reshape anywhere), and contracts it against the
  [P*P*C, C_out] flattened kernel on the MXU;
- the backward-for-weights kernel streams the same blocks and accumulates
  dW in f32 across grid steps (sequential TPU grid), which removes the other
  slow 3-channel conv from the step. The backward-for-input (never executed
  in training — the image is a leaf) is plain XLA and gets DCE'd.

Non-overlapping stride==kernel convs only (that is what a patchify stem is);
anything else falls back to ``lax.conv_general_dilated``. Enabled per-model
with ``ModelConfig.use_pallas_stem`` (reference has no stem choice at all —
its EfficientNet entry is frozen pretrained TF layers, model.py:62-83).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

# target VMEM footprint for one input block (f32, lane-padded)
_BLOCK_BUDGET_BYTES = 2 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(x_shape, patch: int) -> bool:
    """True when the fused kernel can take this geometry."""
    _, h, w, _ = x_shape
    return h % patch == 0 and w % patch == 0


def _pick_rows(ho: int, wo: int, patch: int, c_in: int) -> int:
    """Output rows per grid step: largest power-of-two divisor of ``ho``
    whose f32 input block fits the VMEM budget (lane dim padded to 128)."""
    for rows in (16, 8, 4, 2, 1):
        if ho % rows:
            continue
        block = rows * patch * wo * _round_up(patch * c_in, 128) * 4
        if block <= _BLOCK_BUDGET_BYTES or rows == 1:
            return rows
    return 1


def _patches(x_blk, rows: int, patch: int, wo: int, c_in: int, dtype,
             clip01: bool):
    """[ROWS*P, Wo, P*C] VMEM block -> [ROWS*Wo, P*P*C] patch matrix using
    only free reshapes (major splits / sublane collapses) and basic slices.
    ``clip01`` applies the input-handling clip in VMEM (EncoderBackbone
    clips images to [0,1]; doing it here saves a full 640px HBM pass)."""
    if clip01:
        x_blk = jnp.clip(x_blk, 0.0, 1.0)
    pc = patch * c_in
    # (ROWS*P, Wo, PC) -> (ROWS, P, Wo, PC): major-dim split, free
    x4 = x_blk.reshape(rows, patch, wo, pc).astype(dtype)
    # one sublane slice per intra-patch row; lane order within a slice is
    # (dj, c), so concatenating along lanes yields the (di, dj, c) row-major
    # flatten that matches kernel.reshape(P*P*C, C_out)
    cols = [x4[:, di].reshape(rows * wo, pc) for di in range(patch)]
    return jnp.concatenate(cols, axis=1)  # [ROWS*Wo, P*PC]


def _fwd_kernel(x_ref, w_ref, o_ref, *, rows, patch, wo, c_in, dtype,
                clip01):
    pats = _patches(x_ref[0], rows, patch, wo, c_in, dtype, clip01)
    k = pats.shape[1]
    k_pad = w_ref.shape[0]
    if k_pad != k:  # lane-pad the contraction dim for the MXU
        pats = jnp.concatenate(
            [pats, jnp.zeros((pats.shape[0], k_pad - k), dtype)], axis=1)
    acc = jnp.dot(pats, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(rows, wo, -1).astype(o_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, *, rows, patch, wo, c_in, dtype,
               clip01):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    pats = _patches(x_ref[0], rows, patch, wo, c_in, dtype, clip01)
    k = pats.shape[1]
    k_pad = dw_ref.shape[0]
    if k_pad != k:
        pats = jnp.concatenate(
            [pats, jnp.zeros((pats.shape[0], k_pad - k), dtype)], axis=1)
    g = g_ref[0].reshape(rows * wo, -1).astype(dtype)
    # [K_pad, ROWS*Wo] x [ROWS*Wo, C_out] via dot_general on dim 0
    contrib = lax.dot_general(pats, g, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw_ref[...] += contrib


def _view(x, patch: int):
    """[B,H,W,C] -> [B,H,Wo,P*C]: free minor-dim regroup (order-preserving)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // patch, patch * c)


def _fwd_impl(x, w, out_dtype, interpret: bool, clip01: bool):
    b, h, width, c_in = x.shape
    patch = w.shape[0]
    c_out = w.shape[-1]
    ho, wo = h // patch, width // patch
    rows = _pick_rows(ho, wo, patch, c_in)
    k = patch * patch * c_in
    k_pad = _round_up(k, 128)
    wk = w.reshape(k, c_out)
    if k_pad != k:
        wk = jnp.concatenate(
            [wk, jnp.zeros((k_pad - k, c_out), wk.dtype)], axis=0)
    xv = _view(x, patch)
    kern = functools.partial(_fwd_kernel, rows=rows, patch=patch, wo=wo,
                             c_in=c_in, dtype=w.dtype, clip01=clip01)
    return pl.pallas_call(
        kern,
        grid=(b, ho // rows),
        in_specs=[
            pl.BlockSpec((1, rows * patch, wo, patch * c_in),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((k_pad, c_out), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, wo, c_out),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c_out), out_dtype),
        interpret=interpret,
    )(xv, wk)


def _dw_impl(x, w_shape, w_dtype, g, interpret: bool, clip01: bool):
    b, h, width, c_in = x.shape
    patch = w_shape[0]
    c_out = w_shape[-1]
    ho, wo = h // patch, width // patch
    rows = _pick_rows(ho, wo, patch, c_in)
    k = patch * patch * c_in
    k_pad = _round_up(k, 128)
    xv = _view(x, patch)
    kern = functools.partial(_dw_kernel, rows=rows, patch=patch, wo=wo,
                             c_in=c_in, dtype=w_dtype, clip01=clip01)
    dw = pl.pallas_call(
        kern,
        grid=(b, ho // rows),
        in_specs=[
            pl.BlockSpec((1, rows * patch, wo, patch * c_in),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, rows, wo, c_out), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((k_pad, c_out), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k_pad, c_out), jnp.float32),
        interpret=interpret,
    )(xv, g)
    return dw[:k].reshape(w_shape).astype(w_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _patchify_conv(x, w, out_dtype, interpret, clip01):
    return _fwd_impl(x, w, out_dtype, interpret, clip01)


def _vjp_fwd(x, w, out_dtype, interpret, clip01):
    return _fwd_impl(x, w, out_dtype, interpret, clip01), (x, w)


def _vjp_bwd(out_dtype, interpret, clip01, res, g):
    x, w = res
    dw = _dw_impl(x, w.shape, w.dtype, g, interpret, clip01)
    # dx: plain XLA depth-to-space of g @ w^T. The image is a leaf in
    # training, so this branch is dead code XLA removes; it exists for
    # full differentiability (e.g. saliency / adversarial use).
    patch, _, c_in, c_out = w.shape
    b, ho, wo, _ = g.shape
    wk = w.reshape(patch * patch * c_in, c_out)
    dx = jnp.einsum("bhwo,ko->bhwk", g.astype(jnp.float32),
                    wk.astype(jnp.float32))
    dx = dx.reshape(b, ho, wo, patch, patch, c_in)
    dx = dx.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, ho * patch, wo * patch, c_in)
    if clip01:  # clip's gradient is zero outside [0, 1]
        dx = jnp.where((x >= 0.0) & (x <= 1.0), dx, 0.0)
    return dx.astype(x.dtype), dw


_patchify_conv.defvjp(_vjp_fwd, _vjp_bwd)


def patchify_conv(x, w, *, out_dtype=None, interpret=None,
                  clip01: bool = False):
    """Non-overlapping (stride == kernel) conv of ``x`` [B,H,W,C_in] with
    ``w`` [P,P,C_in,C_out] -> [B,H/P,W/P,C_out].

    Fused Pallas path when the geometry divides cleanly; falls back to
    ``lax.conv_general_dilated`` otherwise (same math, so callers never
    need to special-case). ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU so CPU tests exercise the same code path.
    ``clip01`` fuses a [0,1] input clip into the kernel's VMEM pass."""
    out_dtype = jnp.dtype(out_dtype or w.dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    patch = w.shape[0]
    assert w.shape[0] == w.shape[1], "patchify kernels are square"
    if not supported(x.shape, patch):
        if clip01:
            x = jnp.clip(x, 0.0, 1.0)
        return lax.conv_general_dilated(
            x.astype(w.dtype), w, window_strides=(patch, patch),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)
    return _patchify_conv(x, w, out_dtype, interpret, clip01)
