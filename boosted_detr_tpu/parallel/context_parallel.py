"""Context/sequence-parallel attention over the mesh (designed-in extension).

The reference never needs sequence parallelism — its token count is the tiny
flattened backbone grid (SURVEY §5.7). This module is the designed-in hook
for high-resolution inputs: the KV token axis is sharded across a mesh axis,
each device computes attention against its local KV shard, and the shards'
partial results are combined EXACTLY via the online-softmax identity
(log-sum-exp merge) with `psum`-style collectives inside `shard_map` — the
same math as the Pallas kernel's blockwise softmax, lifted to the ICI.

`context_parallel_attention(q, k, v, mesh, axis)`: q is replicated over the
axis, k/v are sharded on their token dim; output equals plain attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

_NEG = -1e30


def _local_partial(q, k, v, scale):
    """Per-shard partial attention: returns (acc, max, denom)."""
    logits = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)  # [B, T, 1]
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bts,bsd->btd", p, v.astype(jnp.float32))
    return acc, m, denom


def context_parallel_attention(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, mesh: Mesh,
                               axis: str = "model",
                               impl: str = "xla",
                               interpret: bool = False) -> jnp.ndarray:
    """Exact attention with the KV token axis sharded over ``axis``.

    Args:
      q: [B, Tq, D] (replicated over the axis);
      k, v: [B, Tk, D] with Tk divisible by the axis size.
      impl: "xla" (plain per-shard attention) or "pallas" — each shard runs
        the fused blockwise kernel (ops/pallas_attention.py) and returns its
        local (out, lse); shards merge exactly in log-sum-exp space. Both
        impls are differentiable (the pallas lse cotangent folds into the
        flash backward's delta).
      interpret: run the pallas kernel in interpret mode (CPU tests).

    Returns [B, Tq, D] in q's dtype, equal to plain softmax attention.
    """
    d = q.shape[-1]
    scale = 1.0 / float(d) ** 0.5
    n_shards = mesh.shape[axis]
    assert k.shape[1] % n_shards == 0, "Tk must divide the mesh axis"

    if impl == "pallas":
        from boosted_detr_tpu.ops.pallas_attention import \
            fused_attention_with_lse

        def shard_fn(q_blk, k_blk, v_blk):
            out, lse = fused_attention_with_lse(q_blk, k_blk, v_blk,
                                                interpret=interpret)
            lse = lse[..., None]  # [B, Tq, 1]
            m_all = jax.lax.all_gather(lse, axis)  # [S, B, Tq, 1]
            m_glob = jnp.max(m_all, axis=0)
            denom = jax.lax.psum(jnp.exp(lse - m_glob), axis)
            lse_glob = m_glob + jnp.log(denom)
            # out_s * exp(lse_s - lse_glob) sums to the global softmax value
            out = out.astype(jnp.float32) * jnp.exp(lse - lse_glob)
            return jax.lax.psum(out, axis).astype(q_blk.dtype)
    elif impl == "xla":
        def shard_fn(q_blk, k_blk, v_blk):
            acc, m, denom = _local_partial(q_blk, k_blk, v_blk, scale)
            # exact cross-shard merge: global max, rescale, sum
            m_all = jax.lax.all_gather(m, axis)  # [S, B, T, 1]
            m_glob = jnp.max(m_all, axis=0)
            alpha = jnp.exp(m - m_glob)
            acc = jax.lax.psum(acc * alpha, axis)
            denom = jax.lax.psum(denom * alpha, axis)
            return (acc / jnp.maximum(denom, 1e-30)).astype(q_blk.dtype)
    else:
        raise ValueError(f"unknown impl '{impl}'")

    kwargs = dict(mesh=mesh,
                  in_specs=(P(), P(None, axis, None), P(None, axis, None)),
                  out_specs=P())
    if impl == "pallas":
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # disable the check (check_vma on jax>=0.8, check_rep before).
        try:
            fn = shard_map(shard_fn, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover - older jax
            fn = shard_map(shard_fn, check_rep=False, **kwargs)
    else:
        fn = shard_map(shard_fn, **kwargs)
    return fn(q, k, v)
