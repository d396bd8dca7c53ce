"""On-device (jit-compiled) SyntheticShapes renderer.

TPU-first data generation: the procedural dataset in
``data/datasets.py::SyntheticShapes`` (colored axis-aligned rectangles on a
noisy background, z-order occlusion) is simple enough to rasterize on the
accelerator — a handful of VPU elementwise ops per image — so training data
can be generated INSIDE the compiled step from a PRNG key. That removes the
two host-side bottlenecks of the staged approach used by
``scripts/train_val_suite.py``:

  * host rendering time (~20 min/1024 images at 640px on one CPU), and
  * HBM residency of the staged stack (a 16k-image 640px uint8 stack is
    ~20 GB — larger than a v5e chip's HBM).

A "dataset of N images" is emulated WITHOUT storing any of them: image i is
a pure function of ``fold_in(root_key, i)``, so a pool of N distinct images
is just an index distribution — and N = None gives a never-repeating stream
(infinite data). This powers the quality scaling curve (VERDICT r3 missing
#1 / next-round #4): train-image count sweeps cost zero extra host time and
zero extra HBM.

Geometry, label and color conventions MATCH the host renderer exactly
(same size/position distributions, same int-truncation rasterization, same
z-order overwrite, same size/aspect attribute rules — see
tests/test_device_synth.py for the bit-level parity check against a numpy
mirror). The val split stays HOST-rendered by the locked protocol, so a
model trained on device-rendered data is evaluated across the renderer
boundary — any renderer mismatch shows up as a val-mAP hit, not a silent
bias.

Reference: the upstream framework has no analogue (its data is COCO/
Fashionpedia downloads, reference ModelComponents/dataset_etl.py); this
module is TPU-native infrastructure for the offline quality protocol.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from boosted_detr_tpu.data.datasets import SyntheticShapes
from boosted_detr_tpu.data.pipeline import BOX_PAD_VALUE

# Host-renderer parity constants (datasets.py::SyntheticShapes).
_COLOR_NAMES = sorted(SyntheticShapes.COLORS)  # category id = 2 + index
_COLOR_RGB = jnp.asarray([SyntheticShapes.COLORS[c] for c in _COLOR_NAMES],
                         jnp.float32)
_ATT_NAMES = sorted(SyntheticShapes.SIZES + SyntheticShapes.ASPECTS)
_ATT_ID = {w: 2 + i for i, w in enumerate(_ATT_NAMES)}  # PAD=0, OOV=1


def sample_scene(key, max_objects: int, min_objects: int,
                 size_range: Tuple[float, float], num_slots: int):
    """Sample one image's geometry: the same distributions as the host
    renderer (datasets.py:363-384). Returns per-slot [num_slots] arrays;
    slots >= n are inactive (padded)."""
    lo, hi = size_range
    k_n, k_w, k_h, k_x, k_y, k_c = jax.random.split(key, 6)
    n = jax.random.randint(k_n, (), min_objects, max_objects + 1)
    w = jax.random.uniform(k_w, (num_slots,), minval=lo, maxval=hi)
    h = jax.random.uniform(k_h, (num_slots,), minval=lo, maxval=hi)
    x = jax.random.uniform(k_x, (num_slots,)) * (1.0 - w)
    y = jax.random.uniform(k_y, (num_slots,)) * (1.0 - h)
    color = jax.random.randint(k_c, (num_slots,), 0, len(_COLOR_NAMES))
    active = jnp.arange(num_slots) < n
    return {"n": n, "x": x, "y": y, "w": w, "h": h, "color": color,
            "active": active}


def rasterize(key, scene, image_size: int):
    """Noisy background + z-order rectangle composition, matching the host
    renderer's int-truncation pixel grid (datasets.py:364-378)."""
    s = image_size
    img = jax.random.uniform(key, (s, s, 3), minval=0.0, maxval=0.15)
    rows = jnp.arange(s)[:, None]  # [s,1]
    cols = jnp.arange(s)[None, :]  # [1,s]
    x0 = jnp.floor(scene["x"] * s).astype(jnp.int32)
    y0 = jnp.floor(scene["y"] * s).astype(jnp.int32)
    x1 = jnp.maximum(x0 + 1, jnp.floor((scene["x"] + scene["w"]) * s)
                     .astype(jnp.int32))
    y1 = jnp.maximum(y0 + 1, jnp.floor((scene["y"] + scene["h"]) * s)
                     .astype(jnp.int32))
    # later slots overwrite earlier ones (z-order occlusion); the slot count
    # is small and static, so an unrolled loop of masked selects is one
    # fused elementwise program after XLA
    for j in range(scene["x"].shape[0]):
        mask = ((rows >= y0[j]) & (rows < y1[j])
                & (cols >= x0[j]) & (cols < x1[j])
                & scene["active"][j])[..., None]
        img = jnp.where(mask, _COLOR_RGB[scene["color"][j]], img)
    return img


def scene_labels(scene, max_attribute_words: int = 8):
    """Scene -> (category_ids [O], attribute_ids [O,W], bbox [O,4],
    num_objects) with the host pipeline's conventions: category id =
    2 + sorted-color index, attribute words {size, aspect} (datasets.py:
    381-384), bbox pad -10.0 (pipeline.py BOX_PAD_VALUE)."""
    active = scene["active"]
    cat = jnp.where(active, scene["color"] + 2, 0).astype(jnp.int32)
    w, h = scene["w"], scene["h"]
    size_id = jnp.where(w * h > 0.06, _ATT_ID["large"], _ATT_ID["small"])
    ratio = w / h
    aspect_id = jnp.where((ratio > 0.75) & (ratio < 1.33), _ATT_ID["square"],
                          jnp.where(w > h, _ATT_ID["wide"], _ATT_ID["tall"]))
    num_slots = w.shape[0]
    att = jnp.zeros((num_slots, max_attribute_words), jnp.int32)
    att = att.at[:, 0].set(jnp.where(active, size_id, 0))
    att = att.at[:, 1].set(jnp.where(active, aspect_id, 0))
    bbox = jnp.stack([scene["x"], scene["y"], w, h], axis=-1)
    bbox = jnp.where(active[:, None], bbox, BOX_PAD_VALUE)
    return cat, att, bbox.astype(jnp.float32), scene["n"].astype(jnp.int32)


def scene_masks(scene, mask_size: int):
    """Per-slot filled-box mask targets [num_slots, S, S] float32, matching
    the host pipeline's no-segmentation fallback bit-for-bit
    (data/masks.py::box_to_mask: pixel-center test (c+0.5)/S in [lo, lo+ext));
    inactive slots are all-zero. SyntheticShapes has no segmentation column,
    so box fill IS the host panoptic target for this dataset."""
    s = mask_size
    centers = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    x, y, w, h = scene["x"], scene["y"], scene["w"], scene["h"]
    in_y = ((centers[None, :] >= y[:, None])
            & (centers[None, :] < (y + h)[:, None]))  # [O, S]
    in_x = ((centers[None, :] >= x[:, None])
            & (centers[None, :] < (x + w)[:, None]))  # [O, S]
    m = in_y[:, :, None] & in_x[:, None, :] & scene["active"][:, None, None]
    return m.astype(jnp.float32)


def render_image(key, image_size: int, max_objects: int, min_objects: int,
                 size_range: Tuple[float, float], num_slots: int,
                 max_attribute_words: int = 8,
                 mask_size: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """One image + labels from one key (the pure function behind a
    'dataset': image i = render_image(fold_in(root, i), ...)).
    ``mask_size`` set -> the output carries 'masks' [num_slots, S, S]
    panoptic targets (the panoptic scaling-curve path)."""
    k_scene, k_bg = jax.random.split(key)
    scene = sample_scene(k_scene, max_objects, min_objects, size_range,
                         num_slots)
    image = rasterize(k_bg, scene, image_size)
    cat, att, bbox, n = scene_labels(scene, max_attribute_words)
    out = {"image": image, "category_ids": cat, "attribute_ids": att,
           "bbox": bbox, "num_objects": n}
    if mask_size:
        out["masks"] = scene_masks(scene, mask_size)
    return out


def make_batch_fn(image_size: int, batch_size: int, num_slots: int,
                  max_objects: int = 5, min_objects: int = 1,
                  size_range: Tuple[float, float] = (0.1, 0.6),
                  pool_size: Optional[int] = None, seed: int = 0,
                  max_attribute_words: int = 8,
                  mask_size: Optional[int] = None):
    """Build ``batch_fn(step) -> batch`` for use INSIDE a compiled scan body.

    ``pool_size=N`` emulates a fixed dataset of N distinct images (image
    identity = PRNG index; epochs sample uniformly with replacement);
    ``pool_size=None`` streams never-repeating images. The locked val-suite
    protocol's defaults (1-5 objects, sides 0.1-0.6) are the argument
    defaults."""
    root = jax.random.PRNGKey(seed)
    data_root = jax.random.fold_in(root, 1)
    pick_root = jax.random.fold_in(root, 2)

    def batch_fn(step) -> Dict[str, jnp.ndarray]:
        base = step * batch_size + jnp.arange(batch_size)
        if pool_size is None:
            idx = base
        else:
            idx = jax.random.randint(jax.random.fold_in(pick_root, step),
                                     (batch_size,), 0, pool_size)
        keys = jax.vmap(lambda i: jax.random.fold_in(data_root, i))(idx)
        return jax.vmap(lambda k: render_image(
            k, image_size, max_objects, min_objects, size_range, num_slots,
            max_attribute_words, mask_size))(keys)

    return batch_fn
