"""Profiling utilities + multi-host feed sharding tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.data.pipeline import Pipeline
from boosted_detr_tpu.train import profiling


def test_step_meter():
    import time

    m = profiling.StepMeter(batch_size=4, warmup=1)
    for _ in range(4):
        m.tick()
        time.sleep(0.01)
    s = m.summary()
    assert s["steps_measured"] == 3
    assert 5 < s["step_time_ms"] < 100
    assert s["images_per_sec"] > 0


def test_compiled_cost():
    def f(x):
        return x @ x

    cost = profiling.compiled_cost(f, jnp.zeros((128, 128), jnp.float32))
    # 2 * 128^3 flops
    assert cost["flops"] >= 2 * 128 ** 3


def test_debug_nans_scope():
    with profiling.debug_nans(True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_multihost_feed_sharding_partitions_rows():
    ds = SyntheticShapes(num_images=12, image_size=32, max_objects=2, seed=0)
    df = ds.dataframes("train")
    codec = TextCodec(ds.get_vocab())
    pipe = Pipeline((32, 32), max_objects=2, codec=codec, dataset=ds)

    seen = []
    for rank in range(3):
        for b in pipe.batches(df, batch_size=2, shuffle=False,
                              process_index=rank, process_count=3):
            seen.extend(b["image_id"].tolist())
    # all rows covered exactly once across hosts
    assert sorted(seen) == sorted(df["id_num"].tolist())


@pytest.mark.slow
def test_two_process_distributed_train_smoke():
    """SURVEY §5.8 end-to-end: two OS processes, jax.distributed.initialize,
    a global 4-device CPU mesh, per-process feed striding, and a real CLI
    training run — losses must agree across processes (same global batch)."""
    import os
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    wrapper = (
        "import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
        "from boosted_detr_tpu.cli import main; sys.exit(main(sys.argv[1:]))")

    def worker(pid):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        return subprocess.Popen(
            [sys.executable, "-c", wrapper, "train", "--synthetic",
             "--synthetic-images", "8", "--model", "synthetic-tiny",
             "--epochs", "2", "--set", "train.batch_size=2",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            cwd="/root/repo", env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    procs = [worker(0), worker(1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
    losses = [re.search(r"final loss: ([\d.]+)", out) for out in outs]
    assert all(losses), outs[0][-1500:]
    # both controllers executed the same global computation
    assert losses[0].group(1) == losses[1].group(1)


_MULTIHOST_FULL_WORKER = """
import sys
sys.path.insert(0, '__REPO_ROOT__')  # script runs from tmp_path; cwd is not on sys.path
import jax
jax.config.update('jax_platforms', 'cpu')
pid, port, ckpt = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from boosted_detr_tpu.parallel import multiprocess
multiprocess.initialize(f'localhost:{port}', 2, pid)
import numpy as np
from boosted_detr_tpu import api
from boosted_detr_tpu.config import TrainConfig
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.train import metrics as metrics_lib

KW = dict(num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
          num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=2,
          num_decoder_heads=2, decoder_dim=16, backbone='tiny',
          backbone_width=0.25, compute_dtype='float32', max_objects=3,
          dropout_rate=0.0)
ds = SyntheticShapes(num_images=8, image_size=32, max_objects=2, seed=0)
df = ds.dataframes('train')
feed = multiprocess.feed_info()
model = api.DETR(vocab_dict=ds.get_vocab(), **KW)
pipe = model.make_pipeline(dataset=ds)
sample = next(pipe.batches(df, batch_size=2, seed=0, **feed))
tcfg = TrainConfig(optimizer='adamw', lr_schedule='constant', clipnorm=0.0,
                   batch_size=2, checkpoint_dir=ckpt)
model.compile(sample_batch=sample, train_config=tcfg)
# scan_steps=2: the stacked-superbatch global assembly (batch_axis=1)
hist = model.fit(lambda: pipe.batches(df, batch_size=2, seed=0, **feed),
                 epochs=2, scan_steps=2, checkpoint_every_epochs=10)
print(f'FIT_LOSS {hist["loss"][-1]:.6f}')
ev = model.trainer.evaluate(
    pipe.batches(df, batch_size=2, shuffle=False, **feed))
print(f'EVAL_LOSS {ev["loss"]:.6f}')
r = metrics_lib.evaluate_map(
    model.trainer, pipe.batches(df, batch_size=2, shuffle=False))
print(f'MAP50 {r["mAP50"]:.6f}')
model.trainer.save(wait=True)
step_before = int(model.trainer.state.step)
# a FRESH trainer on both ranks restores the shared checkpoint in compile()
model2 = api.DETR(vocab_dict=ds.get_vocab(), **KW)
model2.compile(sample_batch=sample, train_config=tcfg)
print(f'RESTORED {int(model2.trainer.state.step)} OF {step_before}')
p1 = model.trainer.predict(sample['image'], decode_text=False)
p2 = model2.trainer.predict(sample['image'], decode_text=False)
assert np.allclose(np.asarray(p1['boxes']), np.asarray(p2['boxes']),
                   atol=1e-6)
print('CKPT_ROUNDTRIP_OK')
"""


@pytest.mark.slow
def test_two_process_scan_eval_map_checkpoint(tmp_path):
    """VERDICT r2 #3: the multi-host paths beyond plain fit — scan_steps=2
    (global_batch with batch_axis=1), evaluate, evaluate_map, and a
    checkpoint save/restore across both ranks — run under two OS processes
    and agree across ranks."""
    import os
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(_MULTIHOST_FULL_WORKER.replace("__REPO_ROOT__", repo_root))
    ckpt = str(tmp_path / "ckpt")

    def worker(pid):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        return subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), ckpt],
            cwd="/root/repo", env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    procs = [worker(0), worker(1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
        assert "CKPT_ROUNDTRIP_OK" in out, f"proc {pid}:\n{out[-3000:]}"
    for key in ("FIT_LOSS", "EVAL_LOSS", "MAP50", "RESTORED"):
        vals = [re.search(rf"{key} (.+)", out).group(1) for out in outs]
        assert vals[0] == vals[1], (key, vals)
    step = re.search(r"RESTORED (\d+) OF (\d+)", outs[0])
    assert step.group(1) == step.group(2) != "0"
