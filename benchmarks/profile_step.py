"""Profile the flagship train step on TPU and attribute device time by op.

Runs a few steps under jax.profiler, parses the xplane protobuf with
tensorflow's profiler protos, and prints per-op-category self time. Usage:

    python benchmarks/profile_step.py [--batch 8] [--steps 3] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_OPCODE_RE = re.compile(r"[\]\)\}] ([a-z][a-z0-9-]*)\(")


def categorize(name: str) -> str:
    """Opcode of the defining HLO instruction (e.g. '%x = bf16[...] copy(...)'
    -> 'copy'); fused computations report as 'fusion'."""
    m = _OPCODE_RE.search(name)
    return m.group(1) if m else name.split(" = ")[0].lstrip("%").split(".")[0]


def run_profiled_steps(batch_size: int, n_steps: int, logdir: str,
                       infer: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosted_detr_tpu.config import ModelConfig, TrainConfig
    from boosted_detr_tpu.models.detr import DETR
    from boosted_detr_tpu.train import steps

    cfg = ModelConfig(image_size=(640, 640), backbone="resnet",
                      compute_dtype="bfloat16", max_objects=32,
                      matcher="pallas",
                      stem=os.environ.get("PROFILE_STEM", "patchify8"),
                      norm=os.environ.get("PROFILE_NORM", "batchnorm"),
                      use_pallas_stem=bool(int(
                          os.environ.get("PROFILE_PSTEM", "0"))))
    tcfg = TrainConfig(batch_size=batch_size)
    model = DETR(cfg)
    h, w = cfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (batch_size, h, w, 3)),
                             jnp.float32),
        "category_ids": jnp.asarray(
            rng.integers(2, cfg.num_categories, (batch_size, 32)), jnp.int32),
        "attribute_ids": jnp.asarray(
            rng.integers(0, cfg.num_attributes, (batch_size, 32, 4)),
            jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.05, 0.45, (batch_size, 32, 4)),
                            jnp.float32),
        "num_objects": jnp.asarray(
            rng.integers(1, 33, (batch_size,)), jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tx = steps.make_optimizer(tcfg, d_model=cfg.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables.get("batch_stats", {}), tx)
    key = jax.random.PRNGKey(0)

    if infer:
        predict = jax.jit(steps.make_predict_step(model))
        preds = predict(state, batch["image"])  # warmup/compile
        print("warmup boxes sum", float(preds["boxes"].sum()))
        jax.profiler.start_trace(logdir)
        acc = jnp.float32(0)
        for i in range(n_steps):
            preds = predict(state, batch["image"] + acc * 1e-12 + i * 1e-6)
            acc = preds["boxes"].sum()
        print("profiled", n_steps, "inference steps, acc", float(acc))
        jax.profiler.stop_trace()
        return n_steps

    step = jax.jit(steps.make_train_step(model, cfg, tcfg))

    # warmup/compile
    state, aux = step(state, batch, key)
    print("warmup loss", float(aux["loss"]))

    jax.profiler.start_trace(logdir)
    for i in range(n_steps):
        b = dict(batch, image=batch["image"] + i * 1e-6)
        state, aux = step(state, b, key)
    loss = float(aux["loss"])  # host fetch = real barrier
    jax.profiler.stop_trace()
    print("profiled", n_steps, "steps, final loss", loss)
    return n_steps


def parse_xplane(logdir: str, n_steps: int, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    op_time = collections.Counter()
    path_time = collections.Counter()  # jax name-stack (tf_op stat) -> ms
    total = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = dict(plane.event_metadata.items())
        ev_names = {i: m.name for i, m in ev_meta.items()}
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}

        def stat_str(st):
            if st.str_value:
                return st.str_value
            if st.ref_value:  # string-table reference
                return stat_names.get(st.ref_value, "?")
            return "?"

        def tf_op_of(ev):
            # the jax name-stack travels as the 'tf_op' stat, either on the
            # event or on its event_metadata
            for st in ev.stats:
                if stat_names.get(st.metadata_id) == "tf_op":
                    return stat_str(st)
            meta = ev_meta.get(ev.metadata_id)
            if meta is not None:
                for st in meta.stats:
                    if stat_names.get(st.metadata_id) == "tf_op":
                        return stat_str(st)
            return "?"

        for line in plane.lines:
            # 'XLA Ops' is the serialized execution timeline; 'Async XLA
            # Ops' are overlapping DMA spans (param prefetch) — they are
            # hidden under compute and counting them misattributes time.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                op_time[name] += dur
                total += dur
                path_time[(tf_op_of(ev), name)] += dur
    per_step = {k: v / n_steps for k, v in op_time.items()}
    cats = collections.Counter()
    for name, ms in per_step.items():
        cats[categorize(name)] += ms
    print(f"\n== device time by category (ms/step, total "
          f"{total / n_steps:.2f}) ==")
    for cat, ms in cats.most_common():
        print(f"  {cat:16s} {ms:8.3f}")
    buckets = collections.Counter()
    for name, ms in per_step.items():
        for tag in ("640,640", "320,320", "160,160", "80,80", "40,40",
                    "20,20"):
            if tag in name:
                buckets[tag] += ms
                break
        else:
            buckets["non-spatial"] += ms
    print("\n== device time by activation resolution (ms/step) ==")
    for tag, ms in buckets.most_common():
        print(f"  {tag:12s} {ms:8.3f}")

    # component attribution from the jax name stack (the named_scope /
    # flax-module paths in the 'tf_op' stat) — splits the 'non-spatial'
    # bucket into transformer / matcher / loss / optimizer (VERDICT r2 #6)
    COMPONENT_RULES = (
        ("matcher", ("matcher", "hungarian", "lap_kernel")),
        ("match_costs+loss", ("match_costs", "matching_loss", "exist_loss",
                              "loss_reduce")),
        ("optimizer", ("optimizer",)),
        ("backbone", ("resnet", "/vit/", "effnet", "/tiny/", "EncoderBackbone")),
        ("neck", ("neck",)),
        ("det_transformer", ("encoder_", "decoder_", "DecoderPrep",
                             "decoder_prep")),
        ("heads", ("_head",)),
    )

    def component_of(path):
        for comp, needles in COMPONENT_RULES:
            if any(n in path for n in needles):
                return comp
        return "other"

    comp_time = collections.Counter()
    for (path, _name), ms in path_time.items():
        comp_time[component_of(path)] += ms / n_steps
    if path_time and (len(comp_time) > 1
                      or "?" not in next(iter(path_time))[0]):
        print("\n== device time by component (jax name stack, ms/step) ==")
        for comp, ms in comp_time.most_common():
            print(f"  {comp:18s} {ms:8.3f}")
        other = collections.Counter()
        for (path, _name), ms in path_time.items():
            if component_of(path) == "other":
                other[path] += ms / n_steps
        print("  -- top 'other' paths --")
        for path, ms in other.most_common(12):
            print(f"    {ms:8.3f}  {path[:200]}")

    print(f"\n== top {top} ops (ms/step) ==")
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.3f}  {name[:240]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--infer", action="store_true",
                    help="profile the inference (predict) step instead of train")
    args = ap.parse_args()
    logdir = args.logdir or tempfile.mkdtemp(prefix="prof_")
    n = run_profiled_steps(args.batch, args.steps, logdir,
                           infer=args.infer)
    parse_xplane(logdir, n, args.top)


if __name__ == "__main__":
    main()
