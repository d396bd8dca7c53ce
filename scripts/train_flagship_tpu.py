"""Flagship-config learning drive on the real TPU: overfit the synthetic
shapes dataset at full 640px resolution with the bench.py flagship model
(ResNet + patchify8 stem, bf16, pallas matcher) and report COCO mAP.

The axon tunnel's host->device feed is slow (benchmarks/RESULTS.md), so all
batches are staged into HBM once and the train loop is a single jitted
`lax.scan` over device-resident data — the idiomatic TPU overfit harness.

Usage: python scripts/train_flagship_tpu.py [--steps 3000] [--images 64]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--images", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--stem", default="patchify8")
    parser.add_argument("--backbone", default="resnet")
    parser.add_argument("--norm", default="batchnorm",
                        help="batchnorm | groupnorm | skipinit")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--clipnorm", type=float, default=0.0)
    parser.add_argument("--schedule", default="constant",
                        help="constant | cosine_restarts | aiayn")
    parser.add_argument("--lr2", type=float, default=None,
                        help="second-phase (fine-tune) learning rate")
    parser.add_argument("--steps2", type=int, default=0)
    parser.add_argument("--chunk", type=int, default=2000,
                        help="max steps per dispatch (keep each dispatch "
                             "under ~60s or the tunnel worker crashes)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.datasets import SyntheticShapes
    from boosted_detr_tpu.data.pipeline import Pipeline
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import metrics as metrics_lib
    from boosted_detr_tpu.train import steps

    ds = SyntheticShapes(num_images=args.images, image_size=640,
                         max_objects=4, seed=0)
    df = ds.dataframes("train")
    codec = TextCodec(ds.get_vocab())
    cfg = ModelConfig(
        image_size=(640, 640), backbone=args.backbone, stem=args.stem,
        norm=args.norm,
        compute_dtype="bfloat16", matcher="pallas", max_objects=8,
        num_categories=codec.vocab_size_dict()["category"],
        num_attributes=codec.vocab_size_dict()["attributes"],
        dropout_rate=0.0)  # overfit check: no regularization
    pipe = Pipeline((640, 640), max_objects=cfg.max_objects, codec=codec,
                    dataset=ds)
    host_batches = list(pipe.batches(df, batch_size=args.batch_size,
                                     shuffle=False, drop_remainder=True))
    n_b = len(host_batches)
    keys = ("image", "category_ids", "attribute_ids", "bbox", "num_objects")
    stacked = {k: jnp.asarray(np.stack([b[k] for b in host_batches]))
               for k in keys}
    print(f"{n_b} device-resident batches; image stack "
          f"{stacked['image'].nbytes / 1e6:.0f} MB")

    model = DETR(cfg)
    tcfg = TrainConfig(optimizer="adamw", learning_rate=args.lr,
                       lr_schedule=args.schedule, clipnorm=args.clipnorm,
                       batch_size=args.batch_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    stacked["image"][0])
    state = steps.TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        steps.make_optimizer(tcfg, d_model=cfg.decoder_dim))
    train_step = steps.make_train_step(model, cfg, tcfg)

    # NOTE: the data stack is an ARGUMENT, not a closure — closed-over
    # constants are baked into the serialized HLO, and the axon tunnel's
    # remote-compile endpoint rejects the ~300 MB payload (HTTP 413).
    # ``offset`` is the global step index of the chunk's first step, so RNG
    # streams and batch cycling continue seamlessly across dispatches.
    @functools.partial(jax.jit, static_argnums=3)
    def run(state, data, offset, n):
        def body(carry, i):
            st, _ = carry
            step = offset + i
            batch = {k: jax.lax.dynamic_index_in_dim(v, step % n_b, axis=0,
                                                     keepdims=False)
                     for k, v in data.items()}
            st, aux = train_step(st, batch, jax.random.fold_in(
                jax.random.PRNGKey(0), step))
            return (st, aux["loss"]), aux["loss"]

        (state, _), losses = jax.lax.scan(body, (state, jnp.float32(0)),
                                          jnp.arange(n))
        return state, losses

    # Chunk the scan: a single >~60s dispatch can crash the tunnel's TPU
    # worker (observed at 8000 steps / ~137s), so cap each dispatch.
    chunk = args.chunk
    parts = []
    total_done = 0

    def run_phase(state, n_steps):
        nonlocal total_done
        done = 0
        while done < n_steps:
            n = min(chunk, n_steps - done)
            state, part = run(state, stacked, jnp.int32(total_done), n)
            parts.append(np.asarray(part))
            done += n
            total_done += n
        return state

    t0 = time.time()
    state = run_phase(state, args.steps)
    if args.lr2 and args.steps2:
        # fine-tune phase: fresh optimizer at the lower rate (adamw moments
        # reset — fine for an overfit drive)
        tcfg2 = tcfg.replace(learning_rate=args.lr2)
        state = steps.TrainState.create(
            state.params, state.batch_stats,
            steps.make_optimizer(tcfg2, d_model=cfg.decoder_dim))
        state = run_phase(state, args.steps2)
    losses = np.concatenate(parts)
    dt = time.time() - t0
    marks = [losses[int(f * (len(losses) - 1))]
             for f in (0, .1, .25, .5, .75, 1.0)]
    print(f"{len(losses)} steps in {dt:.0f}s (incl. compile); loss "
          + " -> ".join(f"{m:.1f}" for m in marks))

    predict = jax.jit(steps.make_predict_step(model))
    result = metrics_lib.evaluate_map_fn(
        lambda image: jax.tree.map(np.asarray, predict(state, image)),
        ({k: np.asarray(v[i]) for k, v in stacked.items()}
         for i in range(n_b)),
        cfg.image_size)
    print(f"mAP: {result['mAP']:.3f}  mAP50: {result['mAP50']:.3f}  "
          f"mAP75: {result['mAP75']:.3f}")
    return result


if __name__ == "__main__":
    main()
