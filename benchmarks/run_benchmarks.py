"""Benchmark suite: throughput + matcher micro-benchmarks + quality check.

Run: ``python benchmarks/run_benchmarks.py [--quick]``

Emits one JSON line per benchmark. Timing methodology (see bench.py and
memory notes): the axon tunnel memoizes identical dispatches and its
block_until_ready does not synchronize, so every measurement runs inside a
content-chained lax.scan chunk and ends with a host value fetch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np


def _chunked_train_time(model, cfg, tcfg, batch, n=10):
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.train import steps

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables.get("batch_stats", {}), tx)
    train_step = steps.make_train_step(model, cfg, tcfg)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chunk(state, batch):
        def body(carry, i):
            st, _ = carry
            b = dict(batch, image=batch["image"] + i.astype(jnp.float32)
                     * 1e-6)
            st, aux = train_step(st, b, key)
            return (st, aux["loss"]), aux["loss"]

        (state, _), losses = jax.lax.scan(body, (state, jnp.float32(0)),
                                          jnp.arange(n))
        return state, losses

    state, losses = chunk(state, batch)
    float(losses.sum())
    t0 = time.perf_counter()
    state, losses = chunk(state, batch)
    float(losses.sum())
    return (time.perf_counter() - t0) / n, float(losses[-1])


def make_batch(bs, cfg, rng):
    import jax.numpy as jnp

    h, w = cfg.image_size
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (bs, h, w, 3)), jnp.float32),
        "category_ids": jnp.asarray(
            rng.integers(2, cfg.num_categories, (bs, cfg.max_objects)),
            jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, cfg.num_attributes, (bs, cfg.max_objects, 4)),
            jnp.int32),
        "bbox": jnp.asarray(
            rng.uniform(0.05, 0.45, (bs, cfg.max_objects, 4)), jnp.float32),
        "num_objects": jnp.asarray(
            rng.integers(1, cfg.max_objects + 1, (bs,)), jnp.int32),
    }


def bench_throughput(quick: bool):
    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.boosted import BoostedDETR
    from boosted_detr_tpu.models.detr import DETR

    rng = np.random.default_rng(0)
    configs = [
        ("detr_resnet_640", ModelConfig(image_size=(640, 640),
                                        backbone="resnet",
                                        compute_dtype="bfloat16",
                                        max_objects=32), DETR, 8),
        ("detr_resnet_patchify_640",  # bench.py flagship (RESULTS.md round 2)
         ModelConfig(image_size=(640, 640), backbone="resnet",
                     compute_dtype="bfloat16", max_objects=32,
                     matcher="pallas", stem="patchify"), DETR, 8),
        ("detr_resnet_patchify8_640",  # skips the 160px stage (RESULTS.md)
         ModelConfig(image_size=(640, 640), backbone="resnet",
                     compute_dtype="bfloat16", max_objects=32,
                     matcher="pallas", stem="patchify8"), DETR, 8),
        ("detr_vit_640",  # norm-free TPU-first variant
         ModelConfig(image_size=(640, 640), backbone="vit",
                     compute_dtype="bfloat16", max_objects=32,
                     matcher="pallas"), DETR, 8),
        ("detr_resnet_560", ModelConfig(image_size=(560, 560),
                                        backbone="resnet",
                                        compute_dtype="bfloat16",
                                        max_objects=32), DETR, 8),
        ("detr_effnetlite_640", ModelConfig(image_size=(640, 640),
                                            backbone="efficientnet_lite",
                                            compute_dtype="bfloat16",
                                            max_objects=32), DETR, 8),
        ("detr_effnetb4_640",  # faithful keras-B4 parity backbone: the
         # depthwise-conv TPU penalty quantified (models/backbone.py
         # EfficientNetBackbone, param-pinned to 17,673,823)
         ModelConfig(image_size=(640, 640), backbone="efficientnet_b4",
                     compute_dtype="bfloat16", max_objects=32,
                     matcher="pallas"), DETR, 8),
        ("boosted_resnet_640", ModelConfig(image_size=(640, 640),
                                           backbone="resnet",
                                           compute_dtype="bfloat16",
                                           max_objects=32), BoostedDETR, 8),
        ("boosted_resnet_patchify8_640",  # boosted on the flagship stem
         ModelConfig(image_size=(640, 640), backbone="resnet",
                     compute_dtype="bfloat16", max_objects=32,
                     matcher="pallas", stem="patchify8"), BoostedDETR, 8),
    ]
    if quick:
        configs = configs[:1]
    for name, cfg, model_cls, bs in configs:
        tcfg = TrainConfig(
            batch_size=bs,
            use_intermediate_losses=(model_cls is BoostedDETR))
        dt, loss = _chunked_train_time(model_cls(cfg), cfg, tcfg,
                                       make_batch(bs, cfg, rng))
        print(json.dumps({
            "benchmark": f"train_{name}", "ms_per_step": round(dt * 1e3, 2),
            "images_per_sec": round(bs / dt, 1), "batch_size": bs,
            "loss": round(loss, 3)}), flush=True)


def bench_matcher():
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.ops.matching import auction_lap, hungarian_lap
    from boosted_detr_tpu.ops.pallas_lap import hungarian_lap_pallas

    rng = np.random.default_rng(1)
    b, o, p = 8, 32, 96
    cost = jnp.asarray(rng.uniform(0, 10, (b, o, p)).astype(np.float32))
    n = jnp.asarray(rng.integers(1, o + 1, (b,)).astype(np.int32))
    for name, solver in [("hungarian_xla", hungarian_lap),
                         ("hungarian_pallas", hungarian_lap_pallas),
                         ("auction_xla", auction_lap)]:
        k = 20

        @jax.jit
        def chunk(c0, solver=solver):
            def body(c, i):
                m = solver(c + i * 1e-7, n)
                return c + m * 1e-6, m.sum()

            c, sums = jax.lax.scan(body, c0, jnp.arange(k, dtype=jnp.float32))
            return sums.sum()

        float(chunk(cost))  # compile
        # min over repetitions: the first timed region in a process absorbs
        # a one-time ~20ms runtime warmup (see RESULTS.md)
        times = []
        x = cost
        for _ in range(4):
            x = x + 1e-6
            t0 = time.perf_counter()
            float(chunk(x))
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "benchmark": f"matcher_{name}",
            "ms_per_solve": round(min(times) / k * 1e3, 3),
            "shape": [b, o, p]}), flush=True)

    from boosted_detr_tpu.native import lap_binding

    cn = np.asarray(cost)
    nn = np.asarray(n)
    t0 = time.perf_counter()
    for _ in range(50):
        lap_binding.lap_solve_batch(cn, nn)
    print(json.dumps({
        "benchmark": "matcher_native_cpp_host",
        "ms_per_solve": round((time.perf_counter() - t0) / 50 * 1e3, 3),
        "shape": [b, o, p]}), flush=True)


def _chunked_step_time(step_fn, state, batch, n=10):
    """Time an arbitrary (state, batch, rng) -> (state, aux) step with the
    content-chained methodology."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    @jax.jit
    def chunk(state, batch):
        def body(carry, i):
            st, _ = carry
            b = dict(batch, image=batch["image"] + i.astype(jnp.float32)
                     * 1e-6)
            st, aux = step_fn(st, b, key)
            return (st, aux["loss"]), aux["loss"]

        (state, _), losses = jax.lax.scan(body, (state, jnp.float32(0)),
                                          jnp.arange(n))
        return state, losses

    state, losses = chunk(state, batch)
    float(losses.sum())
    t0 = time.perf_counter()
    state, losses = chunk(state, batch)
    float(losses.sum())
    return (time.perf_counter() - t0) / n, float(losses[-1])


def bench_other_models():
    """Panoptic and classifier-pretrainer throughput on the flagship config
    — every model family in the framework gets a number."""
    import jax
    import jax.numpy as jnp

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.panoptic import (DETRPanoptic,
                                                  make_panoptic_train_step)
    from boosted_detr_tpu.models.pretrainer import (DETRMultiClassifier,
                                                    make_pretrain_step)
    from boosted_detr_tpu.train import steps

    rng = np.random.default_rng(0)
    bs = 8
    cfg = ModelConfig(image_size=(640, 640), backbone="resnet",
                      compute_dtype="bfloat16", max_objects=32,
                      matcher="pallas", stem="patchify8")
    tcfg = TrainConfig(batch_size=bs)
    batch = make_batch(bs, cfg, rng)

    mask_size = 96
    pano = DETRPanoptic(cfg, mask_size=mask_size)
    pbatch = dict(batch, masks=jnp.asarray(
        rng.integers(0, 2, (bs, cfg.max_objects, mask_size, mask_size)),
        jnp.float32))
    variables = jax.jit(pano.init)(jax.random.PRNGKey(0), pbatch["image"])
    state = steps.TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    dt, loss = _chunked_step_time(make_panoptic_train_step(pano, tcfg),
                                  state, pbatch)
    print(json.dumps({
        "benchmark": "train_panoptic_resnet_patchify8_640",
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(bs / dt, 1), "batch_size": bs,
        "loss": round(loss, 3)}), flush=True)

    pre = DETRMultiClassifier(cfg, num_classifier_classes=cfg.num_categories)
    variables = jax.jit(pre.init)(jax.random.PRNGKey(0), batch["image"])
    state = steps.TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    dt, loss = _chunked_step_time(make_pretrain_step(pre), state, batch)
    print(json.dumps({
        "benchmark": "train_pretrainer_resnet_patchify8_640",
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(bs / dt, 1), "batch_size": bs,
        "loss": round(loss, 3)}), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    bench_matcher()
    bench_throughput(args.quick)
    if not args.quick:
        bench_other_models()


if __name__ == "__main__":
    main()
