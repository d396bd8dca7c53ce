"""Quality scaling curve on the real chip (VERDICT r3 next-round #4).

Trains the flagship (resnet + patchify8, 640px, bf16, pallas matcher) with
DEVICE-RENDERED SyntheticShapes data (data/device_synth.py): the train
"dataset" is a PRNG-index pool of N images rendered inside the compiled scan
body, so the train-image axis (1k/4k/16k/inf) costs zero host rendering and
zero HBM staging — the staged harness (train_val_suite.py) tops out at
~4k 640px images of HBM. The val split stays the HOST-rendered locked
protocol (64 images, seed offset 10000), so every scaling point is scored
across the renderer boundary by the same evaluator as the round-3 table.

Distribution = the locked round-3 protocol: 1-5 objects, box sides 0.1-0.6,
on-device geometric augmentation, batch 8, bf16. LR: two-phase like the
protocol (4:1 split at 1e-4 / 1e-5 by default). EMA (0.999) is maintained
on-device and BOTH raw and EMA val mAP are reported.

Usage (one point per process; the tunnel worker is most reliable that way):
  python scripts/train_scaling_tpu.py --pool 1024  --steps 30000
  python scripts/train_scaling_tpu.py --pool 16384 --steps 100000
  python scripts/train_scaling_tpu.py --pool 0     --steps 100000  # infinite
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
    ap.add_argument("--pool", type=int, default=1024,
                    help="train-pool size in images; 0 = infinite stream")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--steps2", type=int, default=0,
                    help="phase-2 steps at --lr2 (default steps/4)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr2", type=float, default=1e-5)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1000,
                    help="steps per dispatch (tunnel crashes past ~60s)")
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--backbone", default="resnet")
    ap.add_argument("--stem", default="patchify8")
    ap.add_argument("--model", default="detr",
                    choices=["detr", "boosted", "panoptic"],
                    help="boosted = the block ensemble with summed "
                    "intermediate losses (the val-suite boosted recipe); "
                    "its scaled checkpoint feeds early_exit_sweep.py. "
                    "panoptic = DETRPanoptic with device-rendered filled-box "
                    "mask targets (device_synth mask_size) + matched mask "
                    "loss, scored on detection mAP AND held-out PQ/SQ/RQ")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="ModelConfig field override(s), e.g. "
                    "--set num_encoder_blocks=8 --set encoder_dim=384 "
                    "(the compute-matched-control / ablation knob; values "
                    "parse as int/float/bool/str)")
    ap.add_argument("--tag", default="",
                    help="suffix appended to the run tag (and the "
                    "--save-params '%%p' expansion) so override runs don't "
                    "collide")
    ap.add_argument("--mask-size", type=int, default=48,
                    help="panoptic mask target resolution (val-suite value)")
    ap.add_argument("--use-pallas-stem", type=int, default=0)
    ap.add_argument("--use-pallas-attention", type=int, default=0,
                    help="fused flash attention kernels (win >=1600 tokens; "
                    "the --image-size 1280 hi-res rider config)")
    ap.add_argument("--save-every", type=int, default=10000,
                    help="pickle params every N steps (crash resume)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="also run the val-split mAP eval every N steps and "
                    "print an intermediate SCALING_EVAL line (insurance for "
                    "long runs: every reached point is a recorded point). "
                    "Intermediate evals score RAW params only (the final "
                    "result line carries the EMA numbers); eval wall time is "
                    "excluded from every reported 'seconds' field so timed "
                    "rows stay comparable across --eval-every settings")
    ap.add_argument("--save-params", default="/tmp/scaling_%p.pkl")
    ap.add_argument("--resume", default="",
                    help="params pickle to resume from (step offset inside)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.data import augment as augment_lib
    from boosted_detr_tpu.data import device_synth
    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.datasets import SyntheticShapes
    from boosted_detr_tpu.data.pipeline import Pipeline
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import metrics as metrics_lib
    from boosted_detr_tpu.train import steps

    size = 64 if args.cpu else args.image_size
    steps2 = args.steps2 or args.steps // 4
    pool = args.pool or None
    tag = f"pool{args.pool}_s{args.steps + steps2}"
    if args.model != "detr":
        tag = f"{args.model}_{tag}"
    if args.image_size != 640:
        tag = f"{tag}_r{args.image_size}"
    if args.tag:
        tag = f"{tag}_{args.tag}"
    save_path = args.save_params.replace("%p", tag)

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

    # Locked-protocol val split: HOST-rendered (num_images only affects the
    # train split, which this harness does not use).
    ds = SyntheticShapes(num_images=1, image_size=size, max_objects=5,
                         min_objects=1, size_range=(0.1, 0.6),
                         num_val_images=args.val_images, seed=0)
    codec = TextCodec(ds.get_vocab())
    cfg = ModelConfig(
        image_size=(size, size),
        compute_dtype="float32" if args.cpu else "bfloat16",
        matcher="hungarian" if args.cpu else "pallas", max_objects=8,
        num_categories=codec.vocab_size_dict()["category"],
        num_attributes=codec.vocab_size_dict()["attributes"],
        dropout_rate=0.0, backbone=args.backbone, stem=args.stem,
        use_pallas_stem=bool(args.use_pallas_stem),
        use_pallas_attention=bool(args.use_pallas_attention))
    if args.cpu:
        cfg = cfg.replace(backbone="tiny", backbone_width=0.5,
                          num_encoder_blocks=2, num_decoder_blocks=2,
                          encoder_dim=64, decoder_dim=64,
                          num_encoder_heads=4, num_decoder_heads=4,
                          num_object_preds=16)
    if overrides:
        cfg = cfg.replace(**overrides)
        print(f"config overrides: {overrides}", flush=True)

    mask_size = args.mask_size if args.model == "panoptic" else None
    batch_fn = device_synth.make_batch_fn(
        image_size=size, batch_size=args.batch_size,
        num_slots=cfg.max_objects, max_objects=5, min_objects=1,
        size_range=(0.1, 0.6), pool_size=pool, seed=0, mask_size=mask_size)

    if args.model == "boosted":
        from boosted_detr_tpu.models.boosted import BoostedDETR

        model = BoostedDETR(cfg)
    elif args.model == "panoptic":
        from boosted_detr_tpu.models.panoptic import DETRPanoptic

        model = DETRPanoptic(cfg, mask_size=mask_size)
    else:
        model = DETR(cfg)
    tcfg0 = TrainConfig(optimizer="adamw", learning_rate=args.lr,
                        lr_schedule="constant", clipnorm=0.0,
                        ema_decay=args.ema, batch_size=args.batch_size,
                        use_intermediate_losses=args.model == "boosted")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((args.batch_size, size, size, 3), jnp.float32))
    state = steps.TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        steps.make_optimizer(tcfg0, d_model=cfg.decoder_dim),
        ema=args.ema > 0)

    start_step = 0
    if args.resume and os.path.exists(args.resume):
        with open(args.resume, "rb") as f:
            blob = pickle.load(f)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, blob["params"]),
            batch_stats=jax.tree.map(jnp.asarray, blob["batch_stats"]),
            ema_params=jax.tree.map(jnp.asarray, blob["ema_params"])
            if blob.get("ema_params") is not None else state.ema_params)
        start_step = int(blob["step"])
        print(f"resumed from {args.resume} at step {start_step}", flush=True)

    def make_run(train_step):
        @functools.partial(jax.jit, static_argnums=2)
        def run(state, offset, n):
            def body(carry, i):
                st, _ = carry
                step = offset + i
                batch = batch_fn(step)
                batch = dict(batch)
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(7), step),
                    args.batch_size)
                if mask_size:
                    (batch["image"], batch["bbox"],
                     batch["masks"]) = jax.vmap(
                        augment_lib.random_downsize_shift_pad)(
                            keys, batch["image"], batch["bbox"],
                            batch["masks"])
                else:
                    batch["image"], batch["bbox"] = jax.vmap(
                        augment_lib.random_downsize_shift_pad)(
                            keys, batch["image"], batch["bbox"])
                st, aux = train_step(st, batch, jax.random.fold_in(
                    jax.random.PRNGKey(0), step))
                return (st, aux["loss"]), aux["loss"]

            (state, _), losses = jax.lax.scan(body, (state, jnp.float32(0)),
                                              jnp.arange(n))
            return state, losses

        return run

    def save(state, step):
        blob = jax.tree.map(np.asarray, {
            "params": state.params, "batch_stats": state.batch_stats,
            "ema_params": state.ema_params})
        blob["step"] = int(step)
        tmp = save_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, save_path)

    # val-eval plumbing (also used by --eval-every inside the loop).
    # Panoptic runs also stage mask targets into the val batches (the host
    # pipeline's filled-box fallback IS SyntheticShapes' exact segmentation
    # — objects are axis-aligned filled rectangles, data/datasets.py).
    val_df = ds.dataframes("val")
    pipe = Pipeline((size, size), max_objects=cfg.max_objects, codec=codec,
                    dataset=ds, mask_size=mask_size)
    predict = jax.jit(steps.make_predict_step(model))

    def eval_state(st):
        return metrics_lib.evaluate_map_fn(
            lambda image: jax.tree.map(np.asarray, predict(st, image)),
            pipe.batches(val_df, batch_size=args.batch_size, shuffle=False),
            cfg.image_size)

    def eval_pq(st):
        """Held-out PQ/SQ/RQ (panoptic family): GT canvases from the staged
        mask targets, predictions via the DETR panoptic postprocess — the
        same mask grid on both sides (train/metrics.py compute_pq)."""
        gt_images, pred_images = [], []
        for b in pipe.batches(val_df, batch_size=args.batch_size,
                              shuffle=False):
            preds = jax.tree.map(np.asarray,
                                 predict(st, jnp.asarray(b["image"])))
            pred_images.extend(
                metrics_lib.detr_panoptic_segments(preds, confidence=0.5))
            for j in range(b["masks"].shape[0]):
                k_obj = int(b["num_objects"][j])
                cats = np.asarray(b["category_ids"][j, :k_obj], np.int64)
                canvas = metrics_lib.panoptic_canvas(
                    np.asarray(b["masks"][j, :k_obj]), cats)
                gt_images.append((canvas, cats, None))
        return metrics_lib.compute_pq(gt_images, pred_images)

    total = start_step
    t0 = time.time()
    eval_s = 0.0  # eval time is subtracted from reported train seconds
    marks = []
    for lr, n_steps, phase_end in ((args.lr, args.steps, args.steps),
                                   (args.lr2, steps2, args.steps + steps2)):
        if total >= phase_end:
            continue
        tcfg = tcfg0.replace(learning_rate=lr)
        if args.model == "panoptic":
            from boosted_detr_tpu.models.panoptic import \
                make_panoptic_train_step

            train_step = make_panoptic_train_step(model, tcfg)
        else:
            train_step = steps.make_train_step(model, cfg, tcfg)
        run = make_run(train_step)
        if total > start_step or lr != args.lr:
            # fresh optimizer state at the phase boundary (val-suite recipe)
            state = steps.TrainState.create(
                state.params, state.batch_stats,
                steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
            ).replace(ema_params=state.ema_params)
        while total < phase_end:
            n = min(args.chunk, phase_end - total)
            state, losses = run(state, jnp.int32(total), n)
            loss = float(np.asarray(losses)[-1])  # host fetch = barrier
            marks.append(loss)
            total += n
            print(f"[{tag}] step {total}: loss {loss:.2f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
            if args.save_every and total % args.save_every < args.chunk:
                save(state, total)
            if (args.eval_every and total % args.eval_every < args.chunk
                    and total < args.steps + steps2):
                te = time.time()
                m = eval_state(state)
                eval_s += time.time() - te
                print("SCALING_EVAL " + json.dumps({
                    "step": total,
                    "val_mAP50": round(m["mAP50"], 4),
                    "val_mAP": round(m["mAP"], 4),
                    "val_mAP75": round(m["mAP75"], 4),
                    "seconds": round(time.time() - t0 - eval_s, 1)}),
                    flush=True)
    save(state, total)
    dt = time.time() - t0 - eval_s

    # --- evaluation: host-rendered locked-protocol val split ---------------
    val_m = eval_state(state)
    val_ema = eval_state(steps.with_ema_params(state)) if args.ema else None

    # train-pool mAP: device-rendered sample scored by the same evaluator
    # (the generalization-gap companion number)
    rb = jax.jit(batch_fn)

    def pool_batches(k):
        for i in range(k):
            yield {kk: np.asarray(vv) for kk, vv in rb(jnp.int32(i)).items()}

    train_m = metrics_lib.evaluate_map_fn(
        lambda image: jax.tree.map(np.asarray, predict(state, image)),
        pool_batches(8), cfg.image_size)

    result = {
        "pool": args.pool, "steps": total, "seconds": round(dt, 1),
        "final_loss": round(marks[-1], 3) if marks else None,
        "train_mAP50": round(train_m["mAP50"], 4),
        "val_mAP50": round(val_m["mAP50"], 4),
        "val_mAP": round(val_m["mAP"], 4),
        "val_mAP75": round(val_m["mAP75"], 4),
    }
    if val_ema is not None:
        result["val_mAP50_ema"] = round(val_ema["mAP50"], 4)
        result["val_mAP_ema"] = round(val_ema["mAP"], 4)
        result["val_mAP75_ema"] = round(val_ema["mAP75"], 4)
    # attribute-quality columns (reference headline feature; present when
    # the model emits an attribute head — train/metrics.py)
    for k in ("attr_F1", "attr_precision", "attr_recall", "attr_mAP",
              "attr_match_recall"):
        if k in val_m:
            result[f"val_{k}"] = round(val_m[k], 4)
    if args.model == "panoptic":
        pq = eval_pq(state)
        result["val_PQ"] = round(pq["PQ"], 4)
        result["val_SQ"] = round(pq["SQ"], 4)
        result["val_RQ"] = round(pq["RQ"], 4)
    if overrides:
        result["overrides"] = overrides
    print("SCALING " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
