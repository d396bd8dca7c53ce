"""On-hardware numeric check for the fused Pallas patchify stem.

The CPU suite exercises ops/pallas_patchify.py through the Pallas
*interpreter* (tests/test_pallas_patchify.py); this drive runs the REAL
Mosaic-compiled kernel on the TPU chip and checks it against the XLA
`lax.conv_general_dilated` fallback at flagship geometry:

1. forward, bf16 weights, 640px batch-8 images (the bench shape);
2. dW through the custom VJP (the sequential-grid f32 accumulator);
3. the full flagship model: loss + grad-norm with use_pallas_stem on/off
   from IDENTICAL params (the stem param tree mirrors nn.Conv, so one init
   serves both);
4. a stem-only fwd+bwd microbench (pallas vs XLA, content-chained chunks —
   see CLAUDE.md: block_until_ready does not sync on this tunnel).

Run: python scripts/verify_pallas_stem_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from boosted_detr_tpu.ops.pallas_patchify import patchify_conv


def fetch(x):
    return float(jnp.asarray(x, jnp.float32).sum())  # true tunnel barrier


def xla_conv(x, w, out_dtype, clip01):
    if clip01:
        x = jnp.clip(x, 0.0, 1.0)
    p = w.shape[0]
    return lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(p, p), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.dtype(out_dtype))


def check_close(name, a, b, rtol, atol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.max(np.abs(a - b) / (atol + rtol * np.abs(b)))
    ok = bool(err <= 1.0)
    print(f"  {name}: max rel-unit err {err:.3f} -> {'OK' if ok else 'FAIL'}"
          f" (ref |mean| {np.abs(b).mean():.4g})", flush=True)
    return ok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    assert dev.platform == "tpu", "this drive needs the real chip"
    rng = np.random.default_rng(0)
    ok = True

    # -- 1/2: kernel vs XLA conv at flagship geometry, fwd + dW ------------
    # (ONLY_MODEL=1 skips straight to the full-model check)
    for (b, h, w_, cin, p, cout, dt) in [] if int(
            os.environ.get("ONLY_MODEL", "0")) else [
        (8, 640, 640, 3, 8, 64, jnp.bfloat16),   # flagship stem
        (8, 640, 640, 3, 8, 64, jnp.float32),
        (2, 224, 224, 3, 32, 384, jnp.bfloat16),  # vit_p32 patch embed
        (1, 96, 128, 4, 16, 96, jnp.bfloat16),    # odd channel count
    ]:
        x = jnp.asarray(rng.uniform(-0.1, 1.1, (b, h, w_, cin)), jnp.float32)
        wgt = jnp.asarray(rng.normal(0, 0.05, (p, p, cin, cout)), dt)
        for clip01 in (False, True):
            tag = f"[{b}x{h}x{w_}x{cin} p{p} c{cout} {np.dtype(dt).name}" \
                  f" clip={int(clip01)}]"
            f_pal = jax.jit(lambda x, w: patchify_conv(
                x, w, out_dtype=dt, clip01=clip01, interpret=False))
            f_xla = jax.jit(lambda x, w: xla_conv(x, w, dt, clip01))
            yp, yx = f_pal(x, wgt), f_xla(x, wgt)
            tol = 2e-2 if dt == jnp.bfloat16 else 2e-5
            ok &= check_close(f"fwd {tag}", yp, yx, tol, tol)

            def loss_pal(w):
                y = patchify_conv(x, w, out_dtype=dt, clip01=clip01,
                                  interpret=False)
                return (y.astype(jnp.float32) ** 2).mean()

            def loss_xla(w):
                return (xla_conv(x, w, dt, clip01)
                        .astype(jnp.float32) ** 2).mean()

            gp = jax.jit(jax.grad(loss_pal))(wgt)
            gx = jax.jit(jax.grad(loss_xla))(wgt)
            ok &= check_close(f"dW  {tag}", gp, gx, 4e-2, 1e-5)

    # -- 3: full flagship model, loss + grad parity -------------------------
    from boosted_detr_tpu.config import ModelConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps

    def build(use_pallas, dtype):
        cfg = ModelConfig(image_size=(640, 640), backbone="resnet",
                          compute_dtype=dtype, max_objects=32,
                          matcher="pallas", stem="patchify8",
                          use_pallas_stem=use_pallas)
        return cfg, DETR(cfg)

    images = jnp.asarray(rng.uniform(0, 1, (8, 640, 640, 3)), jnp.float32)
    batch = {
        "image": images,
        "bbox": jnp.asarray(rng.uniform(0.1, 0.5, (8, 32, 4)), jnp.float32),
        "num_objects": jnp.full((8,), 5, jnp.int32),
        "category_ids": jnp.asarray(rng.integers(1, 10, (8, 32)), jnp.int32),
        "attribute_ids": jnp.zeros((8, 32, 1), jnp.int32),
    }
    weights = steps.LossWeights()

    # f32 is the STRICT parity gate (the kernel is near-bit-exact there).
    # In bf16 the fused stem rounds differently from XLA's
    # affine-then-convert-then-conv order (both are valid bf16 programs);
    # the discrete bipartite matching can flip on near-tie costs, which
    # moves loss/grads macroscopically — so bf16 gates on model OUTPUTS
    # (pre-matching, where only rounding shows) and reports loss/grads.
    for dtype, strict in (("float32", True), ("bfloat16", False)):
        cfg, model_x = build(False, dtype)
        _, model_p = build(True, dtype)
        variables = jax.jit(model_x.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), images, train=False)

        fwd_x = jax.jit(lambda v: model_x.apply(v, images, train=False))
        fwd_p = jax.jit(lambda v: model_p.apply(v, images, train=False))
        out_x, out_p = fwd_x(variables), fwd_p(variables)
        tol_out = 1e-4 if strict else 3e-2
        ok &= check_close(f"model boxes [{dtype}]", out_p["boxes"],
                          out_x["boxes"], tol_out, tol_out)
        ok &= check_close(f"model cat logits [{dtype}]",
                          out_p["category"],
                          out_x["category"], tol_out, tol_out)

        def loss_fn(model, cfg=cfg):
            def f(params, bs):
                out, upd = model.apply(
                    {"params": params, "batch_stats": bs}, images,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                loss, _ = steps.compute_losses([out], batch, cfg, weights)
                return loss
            return jax.jit(jax.value_and_grad(f))

        lx, gx = loss_fn(model_x)(variables["params"],
                                  variables["batch_stats"])
        lp, gp = loss_fn(model_p)(variables["params"],
                                  variables["batch_stats"])
        gnx = jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum()
                           for g in jax.tree.leaves(gx)))
        gnp_ = jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum()
                            for g in jax.tree.leaves(gp)))
        stem_gx = gx["backbone"]["resnet"]["stem"]["conv"]["kernel"]
        stem_gp = gp["backbone"]["resnet"]["stem"]["conv"]["kernel"]
        print(f"  [{dtype}] model loss xla={float(lx):.6f} "
              f"pallas={float(lp):.6f} gradnorm xla={float(gnx):.4f} "
              f"pallas={float(gnp_):.4f}", flush=True)
        if strict:
            ok &= check_close("model loss [f32]", lp, lx, 2e-4, 1e-5)
            ok &= check_close("model gradnorm [f32]", gnp_, gnx, 2e-3, 1e-5)
            ok &= check_close("stem kernel grad [f32]", stem_gp, stem_gx,
                              5e-3, 1e-4)
        else:
            # informational: matcher flips make these diverge by design
            check_close("model loss [bf16, info]", lp, lx, 2e-3, 1e-4)
            check_close("stem kernel grad [bf16, info]", stem_gp, stem_gx,
                        6e-2, 2e-3)

    # -- 4: stem-only fwd+bwd microbench ------------------------------------
    # SKIP_BENCH=1 runs the numeric checks only (timing is garbage while the
    # host is contended, e.g. under the CPU pytest suite — CLAUDE.md)
    if int(os.environ.get("SKIP_BENCH", "0")):
        print("PASS (bench skipped)" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    wgt = jnp.asarray(rng.normal(0, 0.05, (8, 8, 3, 64)), jnp.bfloat16)

    def bench(fn, x0):
        @jax.jit
        def chunk(x, w):
            def body(c, _):
                x, w = c
                y, vjp = jax.vjp(
                    lambda w: fn(x, w), w)
                (dw,) = vjp(y)
                # content-chain: fold output stats back into the input
                x = x + (y.astype(jnp.float32).mean() * 1e-6)
                w = w + (dw * 1e-6).astype(w.dtype)
                return (x, w), y.astype(jnp.float32).mean()
            (x, w), ys = lax.scan(body, (x, w), None, length=20)
            return x, w, ys.sum()

        x, w = x0, wgt
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            x, w, s = chunk(x, w)
            fetch(s)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best * 1e3

    x0 = jnp.asarray(rng.uniform(0, 1, (8, 640, 640, 3)), jnp.float32)
    t_pal = bench(lambda x, w: patchify_conv(
        x, w, out_dtype=jnp.bfloat16, clip01=True, interpret=False), x0)
    t_xla = bench(lambda x, w: xla_conv(x, w, jnp.bfloat16, True), x0)
    print(f"  stem fwd+dW (640px bs8, min over 5x20-step chunks): "
          f"pallas {t_pal:.3f} ms vs XLA {t_xla:.3f} ms "
          f"({t_xla / t_pal:.2f}x)", flush=True)

    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
