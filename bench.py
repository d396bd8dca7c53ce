"""Benchmark harness: flagship DETR train + inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Methodology: the axon TPU tunnel memoizes repeated identical dispatches and
has a large fixed per-dispatch overhead, and its block_until_ready does not
actually synchronize. Steps therefore run inside `lax.scan` chunks whose
inputs are content-chained (each timed call consumes the previous call's
output) and every timed region ends by FETCHING a dependent host value
(float(...)), which is the only true barrier on this runtime.

Baseline note: the reference publishes NO quantitative numbers (BASELINE.md).
Its training environment was a Colab GPU (T4-class) running TF/Keras
EfficientNetB4-DETR at 560px, batch 8, with a host-side scipy Hungarian
round trip every step; a T4 sustains roughly 8 images/sec there (estimate
derived from the reference's 48-144 GPU-hour training diary and typical T4
EffNetB4 throughput). ``vs_baseline`` = measured / 8.0; the BASELINE.json
target is vs_baseline > 10.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

TF_COLAB_GPU_IMAGES_PER_SEC = 8.0  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    # BENCH_RES=1280 benches the high-resolution config (40x40 = 1600
    # encoder tokens — the regime where the fused attention kernels win;
    # enable them with BENCH_PATTN=1)
    res = int(os.environ.get("BENCH_RES", "640"))
    cfg = ModelConfig(image_size=(res, res),
                      # BENCH_BACKBONE=vit_p32 benches the ViT speed tier
                      backbone=os.environ.get("BENCH_BACKBONE", "resnet"),
                      compute_dtype="bfloat16", max_objects=32,
                      matcher="pallas",  # fastest exact solver on TPU
                      # TPU-first stem: 8x8/s8 patchify entering at 80x80,
                      # designing out the 160px BatchNorm HBM roofline that
                      # bounded the 4x4/s4 stem at 28.4 ms/step. Quality
                      # checked on synthetic shapes: mAP50 0.901 vs 0.909,
                      # mAP 0.517 vs 0.301 (better) — benchmarks/RESULTS.md.
                      stem=os.environ.get("BENCH_STEM", "patchify8"),
                      # BENCH_NORM=skipinit benches the norm-free variant
                      norm=os.environ.get("BENCH_NORM", "batchnorm"),
                      # Fused Pallas stem kernel ON by default (round 4):
                      # clip+preprocess+s2d+matmul in one HBM pass
                      # (ops/pallas_patchify.py). Landed on evidence: all
                      # 30 on-chip parity gates PASS (f32+bf16), isolated
                      # stem fwd+dW 2.93x XLA, and the flagship_pstem
                      # val-suite row is quality-neutral (val mAP50 0.244
                      # vs 0.252 flagship, within run noise) —
                      # benchmarks/RESULTS.md. BENCH_PSTEM=0 disables.
                      use_pallas_stem=bool(int(
                          os.environ.get("BENCH_PSTEM", "1"))),
                      # BENCH_PATTN=1: fused flash attention fwd+bwd kernels
                      # in the DETR encoder/decoder (win at >=1600 tokens)
                      use_pallas_attention=bool(int(
                          os.environ.get("BENCH_PATTN", "0"))))
    # BENCH_SET="num_encoder_blocks=8,encoder_dim=384" applies arbitrary
    # ModelConfig overrides (the compute-matched-control / ablation probe;
    # values parse as int/float/bool/str)
    if os.environ.get("BENCH_SET"):
        def parse(kv):
            key, _, val = kv.partition("=")
            for cast in (int, float):
                try:
                    return key, cast(val)
                except ValueError:
                    pass
            if val in ("True", "False"):
                return key, val == "True"
            return key, val

        overrides = dict(parse(kv) for kv in
                         os.environ["BENCH_SET"].split(","))
        cfg = cfg.replace(**overrides)
    # BENCH_MODEL=boosted benches the boosted ensemble (per-block losses
    # folded into one lane-batched matcher solve, train/steps.py)
    bench_model = os.environ.get("BENCH_MODEL", "detr")
    # BENCH_FBN=1 benches the frozen-BN-stats tier (running-average
    # normalization, no batch-stat reduction passes; the post-warmup
    # training phase of the 'flagship_fbn' val-suite variant)
    fbn = bool(int(os.environ.get("BENCH_FBN", "0")))
    if bench_model == "boosted":
        from boosted_detr_tpu.models.boosted import BoostedDETR

        tcfg = TrainConfig(batch_size=batch_size,
                           use_intermediate_losses=True,
                           freeze_bn_stats=fbn)
        model = BoostedDETR(cfg)
    else:
        tcfg = TrainConfig(batch_size=batch_size, freeze_bn_stats=fbn)
        model = DETR(cfg)

    h, w = cfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (batch_size, h, w, 3)),
                             jnp.float32),
        "category_ids": jnp.asarray(
            rng.integers(2, cfg.num_categories,
                         (batch_size, cfg.max_objects)), jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, cfg.num_attributes,
                         (batch_size, cfg.max_objects, 4)), jnp.int32),
        "bbox": jnp.asarray(
            rng.uniform(0.05, 0.45, (batch_size, cfg.max_objects, 4)),
            jnp.float32),
        "num_objects": jnp.asarray(
            rng.integers(1, cfg.max_objects + 1, (batch_size,)), jnp.int32),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables.get("batch_stats", {}), tx)

    train_step = steps.make_train_step(model, cfg, tcfg)
    predict_step = steps.make_predict_step(model)
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnums=3)
    def train_chunk(state, batch, key, n):
        def body(carry, i):
            st, _ = carry
            b = dict(batch,
                     image=batch["image"] + i.astype(jnp.float32) * 1e-6)
            st, aux = train_step(st, b, key)
            return (st, aux["loss"]), aux["loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(n))
        return state, losses

    @partial(jax.jit, static_argnums=2)
    def infer_chunk(state, image, n):
        def body(carry, i):
            preds = predict_step(
                state, image + (carry * 0 + i.astype(jnp.float32)) * 1e-6)
            return preds["boxes"].sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    # NOTE: on the axon tunnel jax.block_until_ready does NOT synchronize;
    # only fetching a host value does. Every timed region ends with float().
    # 100 steps/chunk: the tunnel's dispatch+fetch round trip is ~40 ms and
    # must be amortized, or it reads as ~2 ms/step of phantom TPU time
    # (device time from the profiler is the ground truth; n=100 gets wall
    # time within ~1% of it)
    n = 100
    # train: compile once, then time content-chained calls
    state, losses = train_chunk(state, batch, key, n)
    float(losses.sum())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = train_chunk(state, batch, key, n)
        float(losses.sum())
        times.append(time.perf_counter() - t0)
    step_time = min(times) / n
    train_ips = batch_size / step_time

    # inference: content-chained input, forced fetch
    acc = infer_chunk(state, batch["image"], n)
    float(acc)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = infer_chunk(state, batch["image"] + acc * 1e-12, n)
        acc = float(acc)
        times.append(time.perf_counter() - t0)
    infer_step = min(times) / n
    infer_ips = batch_size / infer_step

    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_{res}px",
        "value": round(train_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_ips / TF_COLAB_GPU_IMAGES_PER_SEC, 2),
        f"inference_images_per_sec_per_chip_{res}px": round(infer_ips, 2),
        "train_step_ms": round(step_time * 1000, 2),
        "final_loss": float(losses[-1]),
        "batch_size": batch_size,
        "model": bench_model,
        "backbone": cfg.backbone,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
