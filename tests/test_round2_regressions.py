"""Regression tests for the round-1 VERDICT/ADVICE findings (round 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import PartitionSpec as P

from boosted_detr_tpu import api
from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.models.boosted import BoostedDETR
from boosted_detr_tpu.ops import matching
from boosted_detr_tpu.parallel import mesh as mesh_lib
from boosted_detr_tpu.train import steps
from boosted_detr_tpu.train.trainer import Trainer


TINY = ModelConfig(
    num_object_preds=8, image_size=(32, 32), num_encoder_blocks=1,
    num_encoder_heads=2, encoder_dim=16, num_decoder_blocks=3,
    num_decoder_heads=2, decoder_dim=16, num_categories=6, num_attributes=4,
    backbone="tiny", backbone_width=0.25, compute_dtype="float32",
    max_objects=3, dropout_rate=0.0)


def _batch(rng, b=4, cfg=TINY):
    h, w = cfg.image_size
    o = cfg.max_objects
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "category_ids": jnp.asarray(
            rng.integers(2, cfg.num_categories, (b, o)), jnp.int32),
        "attribute_ids": jnp.asarray(rng.integers(0, cfg.num_attributes,
                                                  (b, o, 2)), jnp.int32),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.4, (b, o, 4)), jnp.float32),
        "num_objects": jnp.full((b,), o, jnp.int32),
    }


def test_solve_matching_defaults_to_exact_hungarian(rng):
    """VERDICT weak #5: the signature default must match the documented
    contract (exact hungarian), not the approximate auction solver."""
    cost = jnp.asarray(rng.normal(size=(3, 4, 8)).astype(np.float32))
    n = jnp.asarray([4, 2, 0], jnp.int32)
    got = matching.solve_matching(cost, n)
    exact = matching.solve_matching(cost, n, "hungarian")
    assert np.array_equal(np.asarray(got), np.asarray(exact))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_place_shards_stacked_superbatch_on_batch_axis(rng):
    """ADVICE medium #1: the [scan_steps, B, ...] superbatch must shard axis
    1 (batch) over 'data', not axis 0 (scan step)."""
    model = api.DETR  # noqa: F841 (api import exercised elsewhere)
    tr = Trainer(None, TINY, TrainConfig(mesh_shape={"data": 8, "model": 1}))
    stacked = {"image": np.zeros((3, 8, 8, 8, 3), np.float32),
               "num_objects": np.zeros((3, 8), np.int32)}
    placed = tr._place(stacked, batch_axis=1)
    assert placed["image"].sharding.spec == P(None, "data")
    # plain batches still shard axis 0
    single = tr._place({"image": np.zeros((8, 8, 8, 3), np.float32)})
    assert single["image"].sharding.spec == P("data")
    # indivisible batch falls back to replication
    odd = tr._place({"image": np.zeros((3, 8, 8, 3), np.float32)})
    assert odd["image"].sharding.spec == P()


def test_focused_staged_step_stops_forward_and_matches_loss(rng):
    """VERDICT weak #6 / next #7: with train_block=k the step must use the
    module's focused early-break (same loss, later blocks untouched)."""
    model = BoostedDETR(TINY)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    tcfg = TrainConfig(optimizer="sgd", momentum=0.0, nesterov=False,
                       learning_rate=1e-2, lr_schedule="constant",
                       clipnorm=0.0, use_intermediate_losses=True,
                       train_block=0)
    tx = steps.make_optimizer(tcfg, d_model=TINY.decoder_dim)
    state = steps.TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
    step = jax.jit(steps.make_train_step(model, TINY, tcfg))
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))

    # loss == block-0 cumulative loss from the FULL (unfocused) forward
    full = model.apply(variables, batch["image"], train=False,
                       return_intermediate=True)
    expect, _ = steps.compute_losses([full[0]], batch, TINY,
                                     tcfg.loss_weights)
    # (train=False vs train=True differ only by dropout=0 here; BN in train
    # mode uses batch stats, so compare through the eval-mode module)
    focused = model.clone(focused_training_layer=0)
    got = focused.apply(variables, batch["image"], train=False,
                        return_intermediate=True)
    assert len(got) == 1  # forward stopped at block 0
    got_loss, _ = steps.compute_losses([got[0]], batch, TINY,
                                       tcfg.loss_weights)
    assert np.allclose(float(got_loss), float(expect), rtol=1e-5)

    # later blocks receive structurally zero gradients: params unchanged
    # even without an optimizer mask on them
    p_old = variables["params"]["decoder_block_2"]
    p_new = new_state.params["decoder_block_2"]
    for old, new in zip(jax.tree_util.tree_leaves(p_old),
                        jax.tree_util.tree_leaves(p_new)):
        assert np.array_equal(np.asarray(old), np.asarray(new))


def test_user_supplied_optimizer_respects_train_block(rng):
    """ADVICE low: compile(optimizer=...) + train_block must still freeze."""
    ds = SyntheticShapes(num_images=4, image_size=32, max_objects=2, seed=3)
    df = ds.dataframes("train")
    model = api.BoostedDETR(
        vocab_dict=ds.get_vocab(), num_object_preds=8, image_size=(32, 32),
        num_encoder_blocks=1, num_encoder_heads=2, encoder_dim=16,
        num_decoder_blocks=2, num_decoder_heads=2, decoder_dim=16,
        backbone="tiny", backbone_width=0.25, compute_dtype="float32",
        max_objects=3, dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(optimizer=optax.adamw(1e-2),
                  sample_batch=sample,
                  train_config=TrainConfig(use_intermediate_losses=True,
                                           train_block=1))
    tr = model.trainer
    frozen_before = jax.tree_util.tree_map(
        np.asarray, tr.state.params["backbone"])
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=1)
    for old, new in zip(
            jax.tree_util.tree_leaves(frozen_before),
            jax.tree_util.tree_leaves(tr.state.params["backbone"])):
        assert np.array_equal(old, np.asarray(new))


def test_pipeline_reshuffles_each_epoch():
    """ADVICE low: per-epoch calls must draw fresh shuffle orders; an
    explicit epoch index reproduces a specific epoch."""
    ds = SyntheticShapes(num_images=16, image_size=16, max_objects=2, seed=0)
    df = ds.dataframes("train")
    model = api.DETR(vocab_dict=ds.get_vocab(), num_object_preds=8,
                     image_size=(16, 16), num_encoder_blocks=1,
                     num_encoder_heads=2, encoder_dim=16,
                     num_decoder_blocks=2, num_decoder_heads=2,
                     decoder_dim=16, backbone="tiny", backbone_width=0.25,
                     compute_dtype="float32", max_objects=3,
                     dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)

    def ids(**kw):
        return [b["image_id"].tolist()
                for b in pipe.batches(df, batch_size=4, seed=0, **kw)]

    first, second = ids(), ids()
    assert first != second  # fresh shuffle per call
    assert sorted(sum(first, [])) == sorted(sum(second, []))  # same rows
    assert ids(epoch=0) == ids(epoch=0)  # explicit epoch is reproducible
    # unshuffled streams are unaffected
    a = ids(shuffle=False)
    assert a == ids(shuffle=False)


def test_fit_partial_tail_group_no_scan_retrace(rng):
    """VERDICT weak #7: a partial tail group must not retrace _train_scan;
    it dispatches per-step and still trains every batch."""
    ds = SyntheticShapes(num_images=12, image_size=32, max_objects=2, seed=4)
    df = ds.dataframes("train")
    model = api.DETR(vocab_dict=ds.get_vocab(), num_object_preds=8,
                     image_size=(32, 32), num_encoder_blocks=1,
                     num_encoder_heads=2, encoder_dim=16,
                     num_decoder_blocks=2, num_decoder_heads=2,
                     decoder_dim=16, backbone="tiny", backbone_width=0.25,
                     compute_dtype="float32", max_objects=3,
                     dropout_rate=0.0)
    pipe = model.make_pipeline(dataset=ds)
    sample = next(pipe.batches(df, batch_size=4, seed=0))
    model.compile(sample_batch=sample, train_config=TrainConfig(
        optimizer="adamw", lr_schedule="constant", clipnorm=0.0))
    # 3 batches/epoch with scan_steps=2 -> one full group + 1-batch tail
    scan_lengths = []
    orig_scan = model.trainer._train_scan

    def spy(state, stacked, rng):
        scan_lengths.append(int(stacked["image"].shape[0]))
        return orig_scan(state, stacked, rng)

    model.trainer._train_scan = spy
    model.fit(lambda: pipe.batches(df, batch_size=4, seed=0), epochs=2,
              scan_steps=2)
    assert int(model.trainer.state.step) == 6  # every batch trained
    # the scan only ever sees FULL groups (tails go through _train_step), so
    # a ragged tail can never retrace it with a new length
    assert scan_lengths == [2, 2]


# ---- second self-review round regressions ---------------------------------


def test_multihost_feed_yields_equal_batch_counts():
    """Per-host striding must give every process the SAME number of batches
    (a host with one extra batch would hang in the collective global-array
    assembly). 15 rows / bs 4 / 2 processes used to give 2 vs 1."""
    import pandas as pd

    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.pipeline import Pipeline

    ds = SyntheticShapes(num_images=15, image_size=16, max_objects=2, seed=0)
    df = ds.dataframes("train")
    assert isinstance(df, pd.DataFrame) and len(df) == 15
    codec = TextCodec(ds.get_vocab())
    pipe = Pipeline((16, 16), max_objects=2, codec=codec, dataset=ds)
    counts = []
    for pi in range(2):
        n = sum(1 for _ in pipe.batches(df, batch_size=4, shuffle=False,
                                        process_index=pi, process_count=2))
        counts.append(n)
    assert counts[0] == counts[1] > 0, counts


def test_pipeline_emits_iscrowd_and_eval_consumes_it(tmp_path):
    """Crowd flags flow dataframe -> batch -> ground-truth records, so the
    evaluator's crowd-ignore protocol is reachable end to end."""
    import json

    from PIL import Image

    from boosted_detr_tpu.data.codec import TextCodec
    from boosted_detr_tpu.data.datasets import coco_json_to_dataframe
    from boosted_detr_tpu.data.pipeline import Pipeline
    from boosted_detr_tpu.train import metrics as metrics_lib

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        img_dir / "a.jpg")
    coco = {"images": [{"id": 1, "file_name": "a.jpg", "width": 32,
                        "height": 32}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [2, 2, 8, 8], "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 1,
                 "bbox": [12, 12, 10, 10], "iscrowd": 1}],
            "categories": [{"id": 1, "name": "thing"}]}
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(coco))
    df = coco_json_to_dataframe(str(p), str(img_dir))
    codec = TextCodec({"category": ["thing"], "attribute": []})
    pipe = Pipeline((32, 32), max_objects=3, codec=codec)
    batch = next(pipe.batches(df, batch_size=1, shuffle=False,
                              drop_remainder=False))
    assert "iscrowd" in batch
    assert batch["iscrowd"].tolist() == [[0, 1, 0]]
    gts = metrics_lib.batch_to_ground_truth(batch)
    assert gts[0]["iscrowd"].tolist() == [0, 1]


def test_coco_cache_regenerates_on_stale_schema(tmp_path):
    """A cache written before the optional columns existed must be
    regenerated, not silently returned without segmentation/area."""
    import json

    import pandas as pd

    from boosted_detr_tpu.data.datasets import coco_json_to_dataframe

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    from PIL import Image

    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "a.jpg")
    coco = {"images": [{"id": 1, "file_name": "a.jpg", "width": 16,
                        "height": 16}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                             "bbox": [1, 1, 4, 4], "iscrowd": 0,
                             "segmentation": [[1, 1, 5, 1, 5, 5]]}],
            "categories": [{"id": 1, "name": "x"}]}
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(coco))
    cache = tmp_path / "cache" / "df.json"
    # stale cache: old schema without segmentation/area columns
    cache.parent.mkdir()
    pd.DataFrame([{"id_num": 1, "file_name": "a.jpg",
                   "image_path": "x", "width": 16, "height": 16,
                   "num_boxes": 1, "bbox": [[0, 0, 1, 1]],
                   "category": [["x"]], "attribute": [["<PAD>"]]
                   }]).to_json(cache)
    df = coco_json_to_dataframe(str(p), str(img_dir), str(cache))
    assert {"segmentation", "iscrowd", "area"} <= set(df.columns)


def test_api_panoptic_pipeline_mask_size_zero_disables_masks():
    """mask_size=0 means 'detection-only pipeline' — it must not be
    silently replaced by the module's default mask resolution."""
    vocab = {"category": ["a"], "attribute": []}
    pano = api.DETRPanoptic(vocab_dict=vocab, num_object_preds=4,
                            image_size=(32, 32), num_encoder_blocks=1,
                            num_encoder_heads=2, encoder_dim=16,
                            num_decoder_blocks=1, num_decoder_heads=2,
                            decoder_dim=16, backbone="tiny",
                            backbone_width=0.25, max_objects=2)
    assert pano.make_pipeline(mask_size=0).mask_size == 0
    assert pano.make_pipeline().mask_size == pano.module.mask_size


def test_decode_rle_rejects_malformed_counts():
    from boosted_detr_tpu.data import masks as masks_lib

    with pytest.raises(ValueError):
        masks_lib.decode_rle({"size": [4, 4], "counts": [3, 2]})
