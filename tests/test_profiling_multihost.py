"""Profiling utilities + multi-host feed sharding tests."""

import numpy as np
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
