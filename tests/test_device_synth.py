"""On-device SyntheticShapes renderer (data/device_synth.py) vs the host
renderer's conventions: bit-level rasterization parity against a numpy
mirror of datasets.py:363-384, label/codec agreement, and the pool
semantics that power the quality scaling curve."""

import jax
import jax.numpy as jnp
import numpy as np

from boosted_detr_tpu.data import device_synth
from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.data.datasets import SyntheticShapes


def _host_compose(bg, scene, s):
    """The host renderer's exact composition loop (datasets.py:364-378)
    applied to device-sampled geometry."""
    img = np.asarray(bg, np.float32).copy()
    names = sorted(SyntheticShapes.COLORS)
    n = int(scene["n"])
    for j in range(n):
        x, y = np.float32(scene["x"][j]), np.float32(scene["y"][j])
        w, h = np.float32(scene["w"][j]), np.float32(scene["h"][j])
        rgb = SyntheticShapes.COLORS[names[int(scene["color"][j])]]
        x0, y0 = int(np.floor(x * s)), int(np.floor(y * s))
        x1 = max(x0 + 1, int(np.floor((x + w) * s)))
        y1 = max(y0 + 1, int(np.floor((y + h) * s)))
        img[y0:y1, x0:x1] = rgb
    return img


def test_rasterize_matches_host_composition_bitwise():
    s = 64
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        k_scene, k_bg = jax.random.split(key)
        scene = device_synth.sample_scene(k_scene, max_objects=5,
                                          min_objects=1,
                                          size_range=(0.1, 0.6), num_slots=8)
        img_dev = np.asarray(device_synth.rasterize(k_bg, scene, s))
        bg = np.asarray(jax.random.uniform(k_bg, (s, s, 3), minval=0.0,
                                           maxval=0.15))
        scene_np = {k: np.asarray(v) for k, v in scene.items()}
        img_host = _host_compose(bg, scene_np, s)
        np.testing.assert_array_equal(img_dev, img_host)


def test_labels_match_host_rules_and_codec():
    ds = SyntheticShapes()
    codec = TextCodec(ds.get_vocab())
    key = jax.random.PRNGKey(7)
    scene = device_synth.sample_scene(key, max_objects=5, min_objects=1,
                                      size_range=(0.04, 0.6), num_slots=8)
    cat, att, bbox, n = device_synth.scene_labels(scene)
    cat, att, bbox = np.asarray(cat), np.asarray(att), np.asarray(bbox)
    names = sorted(SyntheticShapes.COLORS)
    sc = {k: np.asarray(v) for k, v in scene.items()}
    for j in range(8):
        if j >= int(n):
            assert cat[j] == 0 and (att[j] == 0).all()
            assert (bbox[j] == -10.0).all()
            continue
        # category id agrees with the host codec on the color word
        word = names[int(sc["color"][j])]
        assert cat[j] == codec.encode_categories([[word]], 1)[0, 0]
        # size/aspect rules (datasets.py:381-384), f32 like the device
        w, h = np.float32(sc["w"][j]), np.float32(sc["h"][j])
        size = "large" if w * h > np.float32(0.06) else "small"
        aspect = ("square" if 0.75 < w / h < 1.33 else
                  "wide" if w > h else "tall")
        expect = codec.encode_attributes([[[size, aspect]]], 1, 8)[0, 0]
        np.testing.assert_array_equal(att[j], expect)
        np.testing.assert_allclose(
            bbox[j], [sc["x"][j], sc["y"][j], w, h], rtol=1e-6)


def test_batch_fn_shapes_and_pool_semantics():
    fn = device_synth.make_batch_fn(image_size=32, batch_size=4, num_slots=6,
                                    pool_size=None, seed=0)
    b0 = jax.jit(fn)(jnp.int32(0))
    assert b0["image"].shape == (4, 32, 32, 3)
    assert b0["category_ids"].shape == (4, 6)
    assert b0["attribute_ids"].shape == (4, 6, 8)
    assert b0["bbox"].shape == (4, 6, 4)
    assert b0["num_objects"].shape == (4,)
    assert b0["image"].dtype == jnp.float32
    # streaming mode never repeats: step 1 differs from step 0
    b1 = jax.jit(fn)(jnp.int32(1))
    assert not np.allclose(np.asarray(b0["image"]), np.asarray(b1["image"]))

    # pool_size=1: every drawn image is THE single pool image
    fn1 = device_synth.make_batch_fn(image_size=32, batch_size=4,
                                     num_slots=6, pool_size=1, seed=0)
    p0 = np.asarray(jax.jit(fn1)(jnp.int32(0))["image"])
    p1 = np.asarray(jax.jit(fn1)(jnp.int32(9))["image"])
    assert np.array_equal(p0[0], p0[1]) and np.array_equal(p0[0], p1[3])

    # image identity is the PRNG index: the same index renders the same
    # image regardless of which step drew it (a REAL fixed dataset)
    fnN = device_synth.make_batch_fn(image_size=32, batch_size=16,
                                     num_slots=6, pool_size=3, seed=0)
    big = jax.jit(fnN)(jnp.int32(5))
    imgs = np.asarray(big["image"]).reshape(16, -1)
    assert len({tuple(np.round(r, 6)) for r in imgs}) <= 3


def test_object_stats_match_host_distribution():
    """Distribution-level check vs the host renderer: object-count range and
    box-side range agree (same sampling rules)."""
    fn = device_synth.make_batch_fn(image_size=32, batch_size=64,
                                    num_slots=8, max_objects=5,
                                    min_objects=1, size_range=(0.1, 0.6),
                                    pool_size=None, seed=3)
    b = jax.jit(fn)(jnp.int32(0))
    n = np.asarray(b["num_objects"])
    assert n.min() >= 1 and n.max() <= 5
    bbox = np.asarray(b["bbox"])
    active = bbox[..., 0] > -5
    sides = bbox[..., 2:][active]
    assert sides.min() >= 0.1 - 1e-6 and sides.max() <= 0.6 + 1e-6
    xy = bbox[..., :2][active]
    wh = bbox[..., 2:][active]
    assert (xy >= -1e-6).all() and (xy + wh <= 1 + 1e-5).all()


def test_scene_masks_match_host_box_to_mask():
    """Device filled-box mask targets == data/masks.py::box_to_mask (the
    host pipeline's no-segmentation fallback — SyntheticShapes' actual
    panoptic target) for every active slot; inactive slots all-zero."""
    from boosted_detr_tpu.data import masks as masks_lib

    for seed in range(3):
        scene = device_synth.sample_scene(
            jax.random.PRNGKey(seed), max_objects=5, min_objects=1,
            size_range=(0.1, 0.6), num_slots=8)
        dev = np.asarray(device_synth.scene_masks(scene, mask_size=48))
        sc = {k: np.asarray(v) for k, v in scene.items()}
        n = int(sc["n"])
        for j in range(8):
            if j < n:
                host = masks_lib.box_to_mask(
                    [sc["x"][j], sc["y"][j], sc["w"][j], sc["h"][j]], 48)
                np.testing.assert_array_equal(dev[j], host)
            else:
                assert not dev[j].any()


def test_batch_fn_mask_size_key():
    fn = device_synth.make_batch_fn(image_size=32, batch_size=2, num_slots=4,
                                    pool_size=16, mask_size=24)
    batch = jax.jit(fn)(jnp.int32(0))
    assert batch["masks"].shape == (2, 4, 24, 24)
    assert batch["masks"].dtype == jnp.float32
    # masks agree with the bbox geometry: mask area ~= w*h for active slots
    bbox = np.asarray(batch["bbox"])
    m = np.asarray(batch["masks"])
    for b in range(2):
        for j in range(4):
            if bbox[b, j, 0] > -5:  # not BOX_PAD_VALUE
                area = m[b, j].mean()
                w, h = bbox[b, j, 2], bbox[b, j, 3]
                assert abs(area - w * h) < 0.1
