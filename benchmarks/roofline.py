"""Per-component roofline attainability for the flagship train step.

VERDICT r2 #6 asked for the "43% MFU" claim to become a *bounded* one: for
each profile bucket (stem / 80px / 40px / 20px / transformer / matcher /
loss / optimizer), state its compute-vs-bandwidth bound and compare to the
measured device time.  This script isolates each piece of the flagship
(640px, bs8, ResNet-patchify8, bf16), compiles its train-like computation
(value_and_grad where applicable) for the target backend WITHOUT running it,
pulls XLA's post-fusion cost analysis (flops, bytes accessed), and prints

    attainable_ms = max(flops / PEAK_FLOPS, bytes / HBM_BW)

next to the measured ms from ``profile_step.py``.  Compile-only: safe to run
over the tunnel without disturbing benchmarks (nothing executes on-chip).

Usage:
    python benchmarks/roofline.py                       # TPU backend
    python benchmarks/roofline.py --cpu                 # logic sanity check
    python benchmarks/roofline.py --measured 80px=5.1 --measured stem=2.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) single chip, public spec numbers
PEAK_BF16_FLOPS = 197e12
HBM_BW = 819e9

# measured per-bucket ms/step from benchmarks/profile_step.py on the real
# chip (17.2 ms flagship step, benchmarks/RESULTS.md); override with
# --measured name=ms as new profiles land
DEFAULT_MEASURED = {
    "stem": 2.0,
    "80px": 5.1,
    "40px": 3.4,
    "20px": 1.2,
    "non-spatial": 4.5,
}


def cost_of(fn, *args):
    """Compile for the default backend (no execution) and return
    (flops, bytes_accessed) from XLA's post-fusion cost analysis."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--norm", default="batchnorm",
                    help="batchnorm | skipinit backbone pieces")
    ap.add_argument("--measured", action="append", default=[],
                    metavar="NAME=MS")
    ap.add_argument("--full", action="store_true",
                    help="also cost-analyze the WHOLE compiled train step "
                         "(post-fusion, cross-component): the tightest "
                         "single attainability bound — per-piece isolation "
                         "re-materializes boundaries the full program fuses")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as fnn
    import jax.numpy as jnp
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models import heads as heads_lib
    from boosted_detr_tpu.models import layers
    from boosted_detr_tpu.models.backbone import (BackboneNeck,
                                                  BottleneckBlock, ConvNormAct)
    from boosted_detr_tpu.ops import matching
    from boosted_detr_tpu.train import steps

    measured = dict(DEFAULT_MEASURED)
    for kv in args.measured:
        k, v = kv.split("=")
        measured[k] = float(v)

    cfg = ModelConfig(image_size=(640, 640), backbone="resnet",
                      compute_dtype="bfloat16", max_objects=32,
                      matcher="pallas", stem="patchify8", norm=args.norm)
    B = args.batch
    dt = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def train_cost(module, x_shape, x_dtype=None):
        """flops/bytes of fwd+bwd (w.r.t. params AND input — matching a real
        middle-of-network layer) including a BatchNorm stats update."""
        x = jnp.asarray(rng.standard_normal(x_shape), x_dtype or dt)
        variables = jax.jit(module.init, static_argnames="train")(
            key, x, train=True)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def f(params, x):
            out, upd = module.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            # sum-of-squares head: forces a full backward pass
            loss = jnp.sum(jnp.square(out.astype(jnp.float32)))
            return loss, upd

        def step(params, x):
            (loss, upd), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                    has_aux=True)(params, x)
            return loss, grads, upd

        return cost_of(step, params, x)

    rows = []  # (bucket, flops, bytes, attainable_ms)

    # --- backbone pieces (patchify8 layout: stem -> 80px -> 40px -> 20px)
    class Stage(fnn.Module):
        blocks: tuple
        norm: str

        @fnn.compact
        def __call__(self, x, *, train=False):
            for i, (feats, strides) in enumerate(self.blocks):
                x = BottleneckBlock(feats, strides, self.norm, dt,
                                    name=f"b{i}")(x, train=train)
            return x

    stem = ConvNormAct(128, (8, 8), (8, 8), norm=args.norm, dtype=dt,
                       name="stem")
    rows.append(("stem",) + train_cost(stem, (B, 640, 640, 3), jnp.float32))
    s1 = Stage(tuple((512, (1, 1)) for _ in range(4)), args.norm)
    rows.append(("80px",) + train_cost(s1, (B, 80, 80, 128)))
    s2 = Stage(((1024, (2, 2)),) + tuple((1024, (1, 1)) for _ in range(5)),
               args.norm)
    rows.append(("40px",) + train_cost(s2, (B, 80, 80, 512)))
    s3 = Stage(((2048, (2, 2)),) + tuple((2048, (1, 1)) for _ in range(2)),
               args.norm)
    rows.append(("20px",) + train_cost(s3, (B, 40, 40, 1024)))

    # --- neck + transformer + heads (the "non-spatial" bucket minus
    # matcher/loss/optimizer)
    class Det(fnn.Module):
        @fnn.compact
        def __call__(self, feats, *, train=False):
            feats = BackboneNeck(cfg.encoder_dim, cfg.norm, dt,
                                 name="neck")(feats, train=train)
            tokens, pos = layers.ImageEncoder(
                cfg.num_encoder_blocks, cfg.num_encoder_heads,
                0.0, cfg.layernorm_epsilon, dt, cfg.post_softmax_mask,
                False, name="encoder")(feats, deterministic=True)
            enc_value, dec, enc_key, _ = layers.DecoderPrep(
                cfg.num_object_preds, cfg.decoder_dim, dt,
                name="decoder_prep")(tokens, pos)
            for i in range(cfg.num_decoder_blocks):
                dec = layers.DecoderBlock(
                    cfg.num_decoder_heads, self_attention=(i > 0),
                    dropout_rate=0.0,
                    layernorm_epsilon=cfg.layernorm_epsilon, dtype=dt,
                    post_softmax_mask=cfg.post_softmax_mask,
                    name=f"decoder_block_{i}")(enc_value, dec, enc_key,
                                               deterministic=True)
            cat = heads_lib.SingleClassPredictionHead(
                cfg.num_categories, cfg.resolved_head_hidden_dim,
                cfg.num_object_preds, cfg.norm, dt, name="category_head")(
                    dec, train=train)
            att = heads_lib.MultiClassPredictionHead(
                cfg.num_attributes, cfg.resolved_head_hidden_dim,
                cfg.num_object_preds, cfg.norm, dt, name="attribute_head")(
                    dec, train=train)
            box = heads_lib.BoxPredictionHead(
                cfg.decoder_dim, cfg.num_object_preds, cfg.norm, dt,
                name="box_head")(dec, train=train)
            return (cat.astype(jnp.float32).sum()
                    + att.astype(jnp.float32).sum()
                    + box.astype(jnp.float32).sum())

    det = Det()
    x20 = jnp.asarray(rng.standard_normal((B, 20, 20, 2048)), dt)
    det_vars = jax.jit(det.init, static_argnames="train")(key, x20,
                                                          train=True)

    def det_step(params, x):
        def f(params, x):
            out, upd = det.apply(
                {"params": params,
                 "batch_stats": det_vars.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"])
            return out, upd
        (loss, upd), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                has_aux=True)(params, x)
        return loss, grads, upd

    rows.append(("transformer",)
                + cost_of(det_step, det_vars["params"], x20))

    # --- matcher + loss (one piece: matching_loss runs the solver inside)
    P, O = cfg.num_object_preds, cfg.max_objects
    cat_1h = jax.nn.one_hot(
        jnp.asarray(rng.integers(2, cfg.num_categories, (B, O))),
        cfg.num_categories)
    att_mh = jnp.asarray(rng.integers(0, 2, (B, O, cfg.num_attributes)),
                         jnp.float32)
    tgt_box = jnp.asarray(rng.uniform(0.05, 0.45, (B, O, 4)), jnp.float32)
    n_obj = jnp.asarray(rng.integers(1, O + 1, (B,)), jnp.int32)
    cat_p = jnp.asarray(rng.uniform(0.01, 1, (B, P, cfg.num_categories)),
                        jnp.float32)
    att_p = jnp.asarray(rng.uniform(0.01, 0.99, (B, P, cfg.num_attributes)),
                        jnp.float32)
    box_p = jnp.asarray(rng.uniform(0.05, 0.45, (B, P, 4)), jnp.float32)

    def loss_fn(cat_p, att_p, box_p):
        # grad w.r.t. predictions: the backward half of the loss as it runs
        # inside the train step (targets carry no grad)
        def f(cat_p, att_p, box_p):
            losses, _ = matching.matching_loss(
                cat_1h, att_mh, tgt_box, n_obj, cat_p, att_p, box_p,
                matcher=cfg.matcher)
            return jnp.sum(losses["total"])
        return jax.value_and_grad(f, argnums=(0, 1, 2))(cat_p, att_p, box_p)

    try:
        rows.append(("matcher+loss",) + cost_of(loss_fn, cat_p, att_p,
                                                box_p))
    except Exception as e:  # pallas kernels may defeat cost analysis
        print(f"(matcher+loss cost analysis unavailable: {e})")

    # --- optimizer update at flagship parameter sizes
    from boosted_detr_tpu.models.detr import DETR

    model = DETR(cfg)
    img = jnp.asarray(rng.uniform(0, 1, (B, 640, 640, 3)), jnp.float32)
    variables = jax.jit(model.init)(key, img)
    tx = steps.make_optimizer(TrainConfig(batch_size=B),
                              d_model=cfg.decoder_dim)
    opt_state = jax.jit(tx.init)(variables["params"])

    import optax

    def opt_step(params, opt_state):
        grads = jax.tree.map(lambda p: p * 1e-3, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    rows.append(("optimizer",) + cost_of(opt_step, variables["params"],
                                         opt_state))

    # --- report
    print(f"\nbackend={jax.default_backend()}  norm={args.norm}  "
          f"peak={PEAK_BF16_FLOPS / 1e12:.0f} TF/s bf16  "
          f"bw={HBM_BW / 1e9:.0f} GB/s")
    print(f"{'bucket':14s} {'GFLOP':>8s} {'MB':>8s} {'bound':>6s} "
          f"{'attain ms':>9s} {'meas ms':>8s} {'attain%':>8s}")
    total_attain = 0.0
    out_rows = []
    for name, flops, byts in rows:
        t_c = flops / PEAK_BF16_FLOPS
        t_m = byts / HBM_BW
        attain = max(t_c, t_m) * 1e3
        bound = "flops" if t_c >= t_m else "mem"
        total_attain += attain
        meas = measured.get(name)
        pct = f"{100 * attain / meas:7.0f}%" if meas else "       -"
        meas_s = f"{meas:8.2f}" if meas else "       -"
        print(f"{name:14s} {flops / 1e9:8.1f} {byts / 1e6:8.1f} {bound:>6s} "
              f"{attain:9.3f} {meas_s} {pct}")
        out_rows.append({"bucket": name, "gflop": round(flops / 1e9, 2),
                         "mb": round(byts / 1e6, 2), "bound": bound,
                         "attainable_ms": round(attain, 3),
                         "measured_ms": meas})
    print(f"{'TOTAL':14s} {'':8s} {'':8s} {'':6s} {total_attain:9.3f}")

    full = None
    if args.full:
        # Whole train step, exactly as bench.py runs it (single jit; XLA
        # fuses ACROSS the component boundaries the per-piece rows
        # re-materialize) — its post-fusion flops/bytes give the tightest
        # honest roofline for the measured step time.
        tcfg = TrainConfig(batch_size=B)
        train_step = steps.make_train_step(model, cfg, tcfg)
        state = steps.TrainState.create(
            variables["params"], variables.get("batch_stats", {}), tx)
        batch = {
            "image": img,
            "category_ids": jnp.asarray(
                rng.integers(2, cfg.num_categories, (B, O)), jnp.int32),
            "attribute_ids": jnp.asarray(
                rng.integers(0, cfg.num_attributes, (B, O, 4)), jnp.int32),
            "bbox": tgt_box,
            "num_objects": n_obj,
        }
        flops, byts = cost_of(train_step, state, batch, key)
        t_c = flops / PEAK_BF16_FLOPS * 1e3
        t_m = byts / HBM_BW * 1e3
        attain = max(t_c, t_m)
        full = {"gflop": round(flops / 1e9, 2), "gb": round(byts / 1e9, 3),
                "flop_ms": round(t_c, 3), "byte_ms": round(t_m, 3),
                "attainable_ms": round(attain, 3),
                "bound": "flops" if t_c >= t_m else "mem"}
        print(f"\nFULL STEP (one jit, post-fusion): {flops / 1e9:.0f} GFLOP "
              f"/ {byts / 1e9:.2f} GB -> flop bound {t_c:.2f} ms, byte "
              f"bound {t_m:.2f} ms => attainable {attain:.2f} ms "
              f"({full['bound']}-bound)")

    print("\nROOFLINE " + json.dumps(
        {"norm": args.norm, "total_attainable_ms": round(total_attain, 3),
         "full_step": full, "rows": out_rows}))


if __name__ == "__main__":
    main()
