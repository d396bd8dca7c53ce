"""Early-exit characterization (VERDICT r3 weak #8 / next-round #6).

The reference's README devotes 25 lines to designing confidence-threshold
early exit for the boosted ensemble and never implements it (reference
README.md:63-88). This framework implements both TPU modes
(models/early_exit.py); this sweep puts NUMBERS on the feature using a
val-suite-trained boosted checkpoint (train_val_suite.py --save-params):

  per threshold:
    - exit-block histogram on the held-out val split (adaptive_select),
    - val mAP / mAP50 of the early-exited predictions,
    - on-chip adaptive_select inference throughput (one jitted graph,
      content-chained scan chunks — CLAUDE.md timing methodology),
    - incremental mode: blocks actually run per batch (the compute saving)
      and host-driven wall latency (tunnel-dominated here; the blocks-run
      column is the hardware-independent number).

Run:  python scripts/train_val_suite.py --variant boosted \
          --save-params /tmp/params_%v.pkl
      python scripts/early_exit_sweep.py --params /tmp/params_boosted.pkl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/tmp/params_boosted.pkl")
    ap.add_argument("--criterion", choices=["confidence", "stability"],
                    default="confidence")
    ap.add_argument("--thresholds", type=float, nargs="+", default=None)
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--bench-chunks", type=int, default=3)
    ap.add_argument("--bench-n", type=int, default=50)
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="ModelConfig override(s) matching how the "
                    "checkpoint was trained (e.g. --set "
                    "boosted_queries=carry); same syntax as "
                    "train_scaling_tpu.py")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.thresholds is None:
        # confidence: a floor in [0,1]; stability: a delta ceiling (class TV
        # + box residual), where 0.0 degenerates to full depth.
        args.thresholds = ([0.5, 0.7, 0.8, 0.9, 0.95, 0.99]
                           if args.criterion == "confidence"
                           else [0.01, 0.02, 0.05, 0.1, 0.15, 0.2, 0.3])
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig
    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.datasets import SyntheticShapes
    from boosted_detr_tpu.data.pipeline import Pipeline
    from boosted_detr_tpu.models import early_exit as ee
    from boosted_detr_tpu.models.boosted import BoostedDETR
    from boosted_detr_tpu.train import metrics as metrics_lib

    size = 64 if args.cpu else 640
    # EXACTLY the val-suite boosted config (train_val_suite.py locked
    # protocol) so --save-params checkpoints load verbatim.
    ds = SyntheticShapes(num_images=args.images, image_size=size,
                         max_objects=5, min_objects=1, size_range=(0.1, 0.6),
                         num_val_images=args.val_images, seed=0)
    codec = TextCodec(ds.get_vocab())
    cfg = ModelConfig(
        image_size=(size, size),
        compute_dtype="float32" if args.cpu else "bfloat16",
        matcher="hungarian" if args.cpu else "pallas", max_objects=8,
        num_categories=codec.vocab_size_dict()["category"],
        num_attributes=codec.vocab_size_dict()["attributes"],
        dropout_rate=0.0, backbone="resnet", stem="patchify8")
    if args.cpu:
        cfg = cfg.replace(backbone="tiny", backbone_width=0.5,
                          num_encoder_blocks=2, num_decoder_blocks=2,
                          encoder_dim=64, decoder_dim=64,
                          num_encoder_heads=4, num_decoder_heads=4,
                          num_object_preds=16)
    if args.set:
        def parse_override(kv):
            key, _, val = kv.partition("=")
            for cast in (int, float):
                try:
                    return key, cast(val)
                except ValueError:
                    pass
            if val in ("True", "False"):
                return key, val == "True"
            return key, val

        overrides = dict(parse_override(kv) for kv in args.set)
        cfg = cfg.replace(**overrides)
        print(f"config overrides: {overrides}", flush=True)
    model = BoostedDETR(cfg)

    with open(args.params, "rb") as f:
        blob = pickle.load(f)
    variables = {"params": jax.tree.map(jnp.asarray, blob["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray,
                                             blob["batch_stats"])}

    val_df = ds.dataframes("val")
    pipe = Pipeline((size, size), max_objects=cfg.max_objects, codec=codec,
                    dataset=ds)
    val_batches = list(pipe.batches(val_df, batch_size=args.batch_size,
                                    shuffle=False, drop_remainder=True))

    n_blocks = cfg.num_decoder_blocks

    select = (ee.stability_select if args.criterion == "stability"
              else ee.adaptive_select)

    @functools.partial(jax.jit, static_argnums=1)
    def adaptive_predict(image, thr):
        outs = model.apply(variables, image, train=False,
                           return_intermediate=True)
        preds, exit_block = select(outs, thr)
        return preds, exit_block

    # content-chained throughput of the adaptive graph (same methodology as
    # bench.py; includes ALL blocks every step — adaptive_select's cost
    # model: full depth + selection, zero host round trips)
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def bench_chunk(image, acc0, thr, n):
        def body(carry, i):
            preds, _ = adaptive_predict(
                image + (carry * 0 + i.astype(jnp.float32)) * 1e-6, thr)
            return preds["boxes"].astype(jnp.float32).sum(), None

        total, _ = jax.lax.scan(body, acc0, jnp.arange(n))
        return total

    image0 = jnp.asarray(val_batches[0]["image"], jnp.float32)
    results = []
    for thr in args.thresholds:
        # --- quality + exit histogram over the val split ----------------
        hist = np.zeros(n_blocks, np.int64)
        preds_cache = {}

        def predict_fn(image):
            preds, exit_block = adaptive_predict(jnp.asarray(image), thr)
            hist[:] = hist + np.bincount(np.asarray(exit_block),
                                         minlength=n_blocks)
            return jax.tree.map(np.asarray, preds)

        val_m = metrics_lib.evaluate_map_fn(
            predict_fn, iter(val_batches), cfg.image_size)

        # --- adaptive_select on-chip throughput -------------------------
        acc = bench_chunk(image0, jnp.float32(0), thr, args.bench_n)
        float(acc)
        best = np.inf
        for _ in range(args.bench_chunks):
            t0 = time.perf_counter()
            acc = bench_chunk(image0 + acc * 1e-12, jnp.float32(0), thr,
                              args.bench_n)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / args.bench_n)
        adaptive_ips = args.batch_size / best

        # --- incremental mode: real compute saving ----------------------
        inc = ee.make_incremental_predict(model, thr,
                                          criterion=args.criterion)
        blocks_run = []
        t0 = time.perf_counter()
        for b in val_batches:
            _, br = inc(variables, jnp.asarray(b["image"], jnp.float32))
            blocks_run.append(br)
        inc_wall = time.perf_counter() - t0
        inc_ips = (len(val_batches) * args.batch_size) / inc_wall

        row = {
            "criterion": args.criterion,
            "threshold": thr,
            "val_mAP50": round(val_m["mAP50"], 4),
            "val_mAP": round(val_m["mAP"], 4),
            "exit_hist": [int(h) for h in hist],
            "mean_exit_block": round(float(
                (hist * np.arange(n_blocks)).sum() / max(1, hist.sum())), 3),
            "adaptive_img_per_s": round(adaptive_ips, 1),
            "incremental_mean_blocks": round(float(np.mean(blocks_run)), 3),
            "incremental_img_per_s_host_driven": round(inc_ips, 1),
        }
        results.append(row)
        print("EARLY_EXIT " + json.dumps(row), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
