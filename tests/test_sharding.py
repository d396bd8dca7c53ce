"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY §4: multi-
device tests without real TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from boosted_detr_tpu.parallel import mesh as mesh_lib
from boosted_detr_tpu.parallel import sharding as sharding_lib


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_make_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m = mesh_lib.make_mesh({"data": 4, "model": 2})
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh({"data": 3, "model": 2})


@requires_8
def test_shard_batch_places_on_data_axis(rng):
    m = mesh_lib.make_mesh({"data": 8, "model": 1})
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32),
             "num_objects": np.zeros((16,), np.int32)}
    sharded = mesh_lib.shard_batch(batch, m)
    sh = sharded["image"].sharding
    assert sh.spec == P("data")
    assert len(sh.device_set) == 8


@requires_8
def test_param_sharding_rules(rng):
    m = mesh_lib.make_mesh({"data": 4, "model": 2})
    params = {
        "encoder": {"block_0": {"self_attention": {"attention": {
            "query_projection": {"kernel": jnp.zeros((32, 32)),
                                 "bias": jnp.zeros((32,))},
            "output_projection": {"kernel": jnp.zeros((32, 32)),
                                  "bias": jnp.zeros((32,))},
        }}}},
        "neck": {"conv": {"kernel": jnp.zeros((1, 1, 64, 32))}},
    }
    sh = sharding_lib.param_shardings(params, m)
    enc = sh["encoder"]["block_0"]["self_attention"]["attention"]
    assert enc["query_projection"]["kernel"].spec == P(None, "model")
    assert enc["output_projection"]["kernel"].spec == P("model", None)
    assert enc["query_projection"]["bias"].spec == P("model")
    assert enc["output_projection"]["bias"].spec == P()
    assert sh["neck"]["conv"]["kernel"].spec == P()


@requires_8
def test_param_sharding_guards_indivisible(rng):
    m = mesh_lib.make_mesh({"data": 4, "model": 2})
    params = {"query_projection": {"kernel": jnp.zeros((4, 3))}}  # 3 % 2 != 0
    sh = sharding_lib.param_shardings(params, m)
    assert sh["query_projection"]["kernel"].spec == P()


@requires_8
def test_dryrun_multichip_entrypoint():
    """The driver-facing multi-chip dryrun: full DP x TP train step."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Exactly the driver's call: fresh process, NO env setup, direct import
    + dryrun_multichip(8). Regression for round-1 MULTICHIP failure (the
    function must self-configure its 8 virtual CPU devices)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh={'data': 4, 'model': 2}" in proc.stdout, proc.stdout


def test_entry_compiles_eval_shape():
    """entry() must be jit-traceable (compile check without running)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out["category"].shape[0] == 2
    assert out["boxes"].shape[-1] == 4


@requires_8
def test_context_parallel_attention_exact(rng):
    """KV sharded over the mesh must equal plain attention exactly."""
    from boosted_detr_tpu.ops.pallas_attention import attention_reference
    from boosted_detr_tpu.parallel import context_parallel

    m = mesh_lib.make_mesh({"data": 2, "model": 4})
    q = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    out = context_parallel.context_parallel_attention(q, k, v, m,
                                                      axis="model")
    ref = attention_reference(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_context_parallel_pallas_impl_exact_and_differentiable(rng):
    """impl='pallas': each shard runs the fused kernel, shards merge in
    log-sum-exp space — forward equals plain attention, gradients flow
    through the kernel's lse cotangent path."""
    import jax

    from boosted_detr_tpu.ops.pallas_attention import attention_reference
    from boosted_detr_tpu.parallel import context_parallel

    m = mesh_lib.make_mesh({"data": 2, "model": 4})
    q = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    out = context_parallel.context_parallel_attention(
        q, k, v, m, axis="model", impl="pallas", interpret=True)
    ref = attention_reference(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_cp(q, k, v):
        return jnp.sum(context_parallel.context_parallel_attention(
            q, k, v, m, axis="model", impl="pallas", interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_cp = jax.grad(loss_cp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_cp, g_ref):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 2e-3, (name, err)


def test_fused_attention_with_lse_matches_logsumexp(rng):
    """The kernel's lse output equals logsumexp of the scaled logits, and a
    loss consuming BOTH outputs differentiates correctly."""
    import jax

    from boosted_detr_tpu.ops import pallas_attention as PA

    q = jnp.asarray(rng.normal(size=(2, 40, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 70, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 70, 32)).astype(np.float32))
    out, lse = PA.fused_attention_with_lse(q, k, v, interpret=True)
    logits = np.einsum("btd,bsd->bts", np.asarray(q),
                       np.asarray(k)) / np.sqrt(32.0)
    lse_ref = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)
                     ) + logits.max(-1)
    assert np.allclose(np.asarray(lse), lse_ref, atol=1e-4)
    assert np.allclose(np.asarray(out),
                       np.asarray(PA.attention_reference(q, k, v)), atol=1e-4)

    def loss_fused(q, k, v):
        o, l = PA.fused_attention_with_lse(q, k, v, interpret=True)
        return jnp.sum(o ** 2) + jnp.sum(jnp.sin(l))

    def loss_ref(q, k, v):
        logits = jnp.einsum("btd,bsd->bts", q, k) / jnp.sqrt(32.0)
        l = jax.nn.logsumexp(logits, axis=-1)
        return (jnp.sum(PA.attention_reference(q, k, v) ** 2)
                + jnp.sum(jnp.sin(l)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_r):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 2e-3, (name, err)
