"""On-hardware numeric check for the fused Pallas patchify stem.

The CPU suite exercises ops/pallas_patchify.py through the Pallas
*interpreter* (tests/test_pallas_patchify.py); this drive runs the REAL
Mosaic-compiled kernel on the TPU chip and checks it against the XLA
`lax.conv_general_dilated` fallback at flagship geometry:

1. forward, bf16 weights, 640px batch-8 images (the bench shape);
2. dW through the custom VJP (the sequential-grid f32 accumulator);
3. the full flagship model: outputs, loss + grad-norm with use_pallas_stem
   on/off from IDENTICAL params (the stem param tree mirrors nn.Conv, so one
   init serves both), gated against an eps-PERTURBATION CONTROL — the model
   is a chaos amplifier (50 layers + discrete matching on the zero-init-query
   tie structure), so "pallas == xla" is judged relative to how much
   "xla == xla + 1-ulp stem noise" itself diverges;
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

    # The kernel is near-bit-exact in f32 (checked above, isolated), but the
    # FULL MODEL is a chaos amplifier: ~1e-7-relative stem rounding grows
    # through ~50 conv/BN layers + softmax to O(1e-3) in the category probs,
    # and the bipartite matcher is discrete — zero-init queries make all 96
    # predictions identical at init, so the cost matrix is all near-ties and
    # ANY perturbation flips assignments, moving loss/grads macroscopically.
    # The honest full-model gate is therefore a PERTURBATION CONTROL: scale
    # the XLA model's stem kernel by (1 + ~1e-7 noise) — the same order as
    # the pallas kernel's f32 rounding — and require the pallas-vs-XLA
    # divergence to be within a small factor of the XLA-vs-XLA(perturbed)
    # divergence on every compared quantity.
    def max_abs(a, b):
        return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                     - jnp.asarray(b, jnp.float32))))

    N_CONTROL_DRAWS = 3  # the flip statistics are heavy-tailed: one draw
    # can land few assignment flips on one quantity (measured: a control
    # draw moved gradnorm by 40 but loss by only 0.007) — gate against the
    # MAX divergence over several independent one-ulp draws instead.

    for dtype, strict in (("float32", True), ("bfloat16", False)):
        cfg, model_x = build(False, dtype)
        _, model_p = build(True, dtype)
        variables = jax.jit(model_x.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), images, train=False)

        # control variables: stem kernel scaled by (1 + eps*rademacher)
        eps = 1e-7 if strict else 1e-3  # ~one-ulp of f32 / bf16
        stem_k = variables["params"]["backbone"]["resnet"]["stem"]["conv"][
            "kernel"]

        def perturbed(draw):
            # NON-CANCELING perturbation: scale magnitudes by (1+d)*eps in
            # the direction of sign(k). A zero-mean rademacher draw at
            # eps=1e-7 cancels in sum(k) below f32 resolution, and the axon
            # tunnel DEDUPLICATES dispatches on a checksum-like digest of
            # the argument buffers — three rademacher controls came back
            # bit-identical to the unperturbed run (loss 157.3648 x3) while
            # the same code at bf16/eps=1e-3 (checksum moves) measured real
            # divergence. sign(k)-aligned noise moves sum(k) by
            # eps*sum|k| >> ulp, defeating the dedup while staying a
            # one-ulp-scale control.
            v = jax.tree_util.tree_map(lambda x: x, variables)
            noise = jnp.sign(stem_k) + (stem_k == 0).astype(stem_k.dtype)
            kp = stem_k * (1 + (eps * (1 + draw)) * noise)
            frac = float((kp != stem_k).mean())
            if frac == 0.0:
                print(f"  WARNING: perturbation draw {draw} left the kernel "
                      f"unchanged on device (eps={eps}) — rerun", flush=True)
            v["params"]["backbone"]["resnet"]["stem"]["conv"]["kernel"] = kp
            return v

        fwd_x = jax.jit(lambda v: model_x.apply(v, images, train=False))
        fwd_p = jax.jit(lambda v: model_p.apply(v, images, train=False))
        out_x, out_p = fwd_x(variables), fwd_p(variables)
        out_cs = [fwd_x(perturbed(d)) for d in range(N_CONTROL_DRAWS)]
        for key in ("boxes", "category"):
            d_pal = max_abs(out_p[key], out_x[key])
            d_ctl = max(max_abs(c[key], out_x[key]) for c in out_cs)
            # a one-ulp stem change MUST move the outputs of a 50-layer
            # model; an exactly-zero control means the measurement itself
            # failed (a tunnel dispatch-memoization glitch was observed
            # doing this under host contention) — fail loudly, rerun.
            sane = d_ctl > 0.0
            passed = sane and d_pal <= max(3.0 * d_ctl, 1e-6)
            ok &= passed
            print(f"  model {key} [{dtype}]: pallas-vs-xla max|d| "
                  f"{d_pal:.3e} vs eps-control {d_ctl:.3e} -> "
                  f"{'OK' if passed else 'FAIL'}"
                  f"{'' if sane else ' (control did not diverge: invalid '
                     'measurement, likely tunnel memoization — rerun)'}",
                  flush=True)

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
        ctls = []
        for d in range(N_CONTROL_DRAWS):
            v = perturbed(d)
            ctls.append(loss_fn(model_x)(v["params"], v["batch_stats"]))

        def gnorm(g):
            return float(jnp.sqrt(sum((t.astype(jnp.float32) ** 2).sum()
                                      for t in jax.tree.leaves(g))))

        def stem_g(g):
            return g["backbone"]["resnet"]["stem"]["conv"]["kernel"]

        print(f"  [{dtype}] model loss xla={float(lx):.6f} "
              f"pallas={float(lp):.6f} eps-controls="
              f"{[round(float(lc), 4) for lc, _ in ctls]} "
              f"gradnorm xla={gnorm(gx):.4f} pallas={gnorm(gp):.4f} "
              f"controls={[round(gnorm(gc), 2) for _, gc in ctls]}",
              flush=True)
        for tag, d_pal, d_ctl, floor in (
            ("loss", abs(float(lp) - float(lx)),
             max(abs(float(lc) - float(lx)) for lc, _ in ctls),
             1e-5 * abs(float(lx))),
            ("gradnorm", abs(gnorm(gp) - gnorm(gx)),
             max(abs(gnorm(gc) - gnorm(gx)) for _, gc in ctls),
             1e-4 * gnorm(gx)),
            ("stem-kernel-grad", max_abs(stem_g(gp), stem_g(gx)),
             max(max_abs(stem_g(gc), stem_g(gx)) for _, gc in ctls), 0.0),
        ):
            sane = d_ctl > 0.0
            passed = sane and d_pal <= max(3.0 * d_ctl, floor)
            ok &= passed
            print(f"  model {tag} [{dtype}]: pallas-vs-xla |d| "
                  f"{d_pal:.3e} vs eps-control(max/{N_CONTROL_DRAWS}) "
                  f"{d_ctl:.3e} -> {'OK' if passed else 'FAIL'}", flush=True)

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
