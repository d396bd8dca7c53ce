"""On-device (jit-compiled) batched image augmentations.

Replaces reference: ModelComponents/pipeline.py:260-384 (tf.data host-side
``Augmentations``). TPU-first: the whole augmentation stage is a pure jittable
function over the BATCH, running on the accelerator mesh (BASELINE.json
config #4) instead of the host CPU — the random shrink-shift-pad is expressed
as a single ``jax.image.scale_and_translate`` affine warp so output shapes
stay static under jit (a dynamic resize-then-pad cannot compile).

Reference-fidelity notes:
- shrink factors: ``max(1, truncated_normal(mean=.5, std=.7))`` per axis
  (reference pipeline.py:281-282), pad region is black (tf
  pad_to_bounding_box pads zeros, reference pipeline.py:301).
- KNOWN REFERENCE BUG, fixed here: the reference divides bbox x-coordinates
  by the HEIGHT shrink factor and y by the WIDTH factor (pipeline.py:306,
  :314 build [r_h, r_w, r_h, r_w] against COCO [x, y, w, h] boxes). We apply
  the factors to the correct axes.
- jpeg-quality augmentation (reference pipeline.py:330-335) is inherently a
  host-side codec operation; ``host_jpeg_quality`` provides it for the host
  pipeline, and the device path substitutes nothing.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _truncated_shrink(key, shape):
    """max(1, TruncatedNormal(mean=.5, std=.7) on [-2sigma, 2sigma])."""
    t = jax.random.truncated_normal(key, -2.0, 2.0, shape) * 0.7 + 0.5
    return jnp.maximum(1.0, t)


def random_downsize_shift_pad(key, image, bbox, masks=None):
    """Per-image random shrink (per axis), shift, zero-pad — with bbox math
    (reference pipeline.py:274-317). image [H,W,3] f32, bbox [O,4] COCO,
    optional full-image masks [O,S,S] warped by the SAME affine (mask targets
    live in image coordinates, so leaving them fixed would train the mask
    head against un-shifted targets)."""
    h, w = image.shape[0], image.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    f = _truncated_shrink(k1, (2,))  # [f_h, f_w]
    scale = 1.0 / f  # <= 1
    # new extent (normalized): scale; random offset in [0, 1 - scale]
    off_h = jax.random.uniform(k2, ()) * (1.0 - scale[0])
    off_w = jax.random.uniform(k3, ()) * (1.0 - scale[1])
    out = jax.image.scale_and_translate(
        image, image.shape, (0, 1),
        scale=jnp.asarray([scale[0], scale[1]], jnp.float32),
        translation=jnp.asarray([off_h * h, off_w * w], jnp.float32),
        method="linear")
    # COCO [x, y, w, h]: x/w use the WIDTH factor, y/h the HEIGHT factor.
    new_bbox = jnp.stack([
        bbox[:, 0] * scale[1] + off_w,
        bbox[:, 1] * scale[0] + off_h,
        bbox[:, 2] * scale[1],
        bbox[:, 3] * scale[0],
    ], axis=-1)
    if masks is None:
        return out, new_bbox
    s = masks.shape[-1]
    new_masks = jax.image.scale_and_translate(
        masks, masks.shape, (1, 2),
        scale=jnp.asarray([scale[0], scale[1]], jnp.float32),
        translation=jnp.asarray([off_h * s, off_w * s], jnp.float32),
        method="linear")
    return out, new_bbox, jnp.clip(new_masks, 0.0, 1.0)


def random_contrast(key, image, lower=0.8, upper=1.2):
    """tf.image.random_contrast semantics: (x - mean_hw) * f + mean_hw
    (reference pipeline.py:320-322)."""
    f = jax.random.uniform(key, (), minval=lower, maxval=upper)
    mean = jnp.mean(image, axis=(0, 1), keepdims=True)
    return (image - mean) * f + mean


def random_brightness(key, image, max_delta=0.1):
    """x + U(-d, d) (reference pipeline.py:325-327)."""
    return image + jax.random.uniform(key, (), minval=-max_delta,
                                      maxval=max_delta)


def random_saturation(key, image, lower=0.8, upper=1.2):
    """Blend with grayscale (reference pipeline.py:338-340)."""
    f = jax.random.uniform(key, (), minval=lower, maxval=upper)
    gray = (0.2989 * image[..., 0] + 0.587 * image[..., 1]
            + 0.114 * image[..., 2])[..., None]
    return gray + f * (image - gray)


def augment_one(key, image, bbox, masks=None):
    ks = jax.random.split(key, 4)
    if masks is None:
        image, bbox = random_downsize_shift_pad(ks[0], image, bbox)
    else:
        image, bbox, masks = random_downsize_shift_pad(ks[0], image, bbox,
                                                       masks)
    image = random_contrast(ks[1], image)
    image = random_brightness(ks[2], image)
    image = random_saturation(ks[3], image)
    image = jnp.clip(image, 0.0, 1.0)
    return (image, bbox) if masks is None else (image, bbox, masks)


def augment_batch(key, batch: Dict[str, jnp.ndarray]) -> Dict:
    """Jittable batched augmentation: vmapped per-image randomness. Pad boxes
    (value -10) pass through the affine math but stay far outside [0,1] and
    are masked by num_objects downstream, so no special-casing is needed.
    Panoptic mask targets ('masks' [B,O,S,S]) are warped with the same
    per-image affine, keeping mask/box alignment under augmentation."""
    b = batch["image"].shape[0]
    keys = jax.random.split(key, b)
    out = dict(batch)
    if "masks" in batch:
        image, bbox, masks = jax.vmap(augment_one)(
            keys, batch["image"], batch["bbox"], batch["masks"])
        out["masks"] = masks
    else:
        image, bbox = jax.vmap(augment_one)(keys, batch["image"],
                                            batch["bbox"])
    out["image"] = image
    out["bbox"] = bbox
    return out


# -- host-side extras ---------------------------------------------------------


def host_jpeg_quality(image: np.ndarray, rng, min_quality=70,
                      max_quality=100) -> np.ndarray:
    """Random JPEG re-encode (reference pipeline.py:330-335); host-only."""
    import cv2

    q = int(rng.integers(min_quality, max_quality + 1))
    u8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8[..., ::-1],
                           [int(cv2.IMWRITE_JPEG_QUALITY), q])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    return dec.astype(np.float32) / 255.0


def host_augment(batch: Dict[str, np.ndarray], rng) -> Dict[str, np.ndarray]:
    """Host-pipeline augmentation hook (adds the jpeg-quality step the device
    path cannot express); geometric/color augs run on device."""
    images = batch["image"]
    batch = dict(batch)
    batch["image"] = np.stack(
        [host_jpeg_quality(im, rng) for im in images]).astype(np.float32)
    return batch
