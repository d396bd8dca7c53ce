"""Host-side input pipeline: dataframe -> padded numpy batches -> device.

Replaces reference: ModelComponents/pipeline.py (tf.data). Key reference
semantics preserved:
- labels are PADDED to static shapes, never ragged (ragged cost the reference
  3x training speed, reference README.md:144; static shapes are also what jit
  requires);
- bbox pad value -10.0, string pad '<PAD>' (reference pipeline.py:93);
- images decoded to float32 [0,1], resized to a uniform size (reference
  pipeline.py:58-64);
- an unlabeled directory-streaming path with placeholder labels (reference
  pipeline.py:210-251);
- box format converters live in ``ops.boxes``.

Strings are converted to integer ids HERE (host) by ``codec.TextCodec``;
the device never sees text. A background prefetch thread keeps the chip fed.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from boosted_detr_tpu.config import PAD_TOKEN
from boosted_detr_tpu.data.codec import TextCodec

BOX_PAD_VALUE = -10.0  # reference pipeline.py:93


def _scalar_or(value, default):
    """A scalar cell that may be missing or a pandas NaN -> value/default."""
    try:
        if value is None or not np.isfinite(value):
            return default
    except TypeError:
        return default
    return value


def load_image(path: str, image_size, dataset=None) -> np.ndarray:
    """Decode + resize + scale to [0,1] f32 (reference pipeline.py:53-64).
    ``synthetic://`` paths render from a SyntheticShapes instance."""
    if path.startswith("synthetic://"):
        assert dataset is not None, "synthetic paths need the dataset"
        subset, idx = path[len("synthetic://"):].split("/")
        img = dataset.render(int(idx) + (0 if subset == "train" else 10_000))
    elif path.startswith(("http://", "https://")):
        # URL-based datasets (e.g. UnsplashLite image_path columns)
        import io

        import requests
        from PIL import Image

        r = requests.get(path, timeout=30)
        r.raise_for_status()
        with Image.open(io.BytesIO(r.content)) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
    else:
        from PIL import Image

        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
    h, w = image_size
    if img.shape[:2] != (h, w):
        import cv2

        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.clip(img.astype(np.float32), 0.0, 1.0)


class Pipeline:
    """COCO-format dataframe -> batches of
    {image, category_ids, attribute_ids, bbox, num_objects, image_id}.

    (reference Pipeline.data_generator, pipeline.py:92-256)
    """

    def __init__(self, image_size, max_objects: int, codec: TextCodec,
                 max_attribute_words: int = 8, dataset=None,
                 mask_size: Optional[int] = None):
        self.image_size = tuple(image_size)
        self.max_objects = max_objects
        self.max_attribute_words = max_attribute_words
        self.codec = codec
        self.dataset = dataset  # for synthetic:// rendering
        self.mask_size = mask_size  # set -> batches carry 'masks' [B,O,S,S]
        self._epoch = 0  # advances per batches() call -> fresh shuffles

    def _encode_labels(self, rows,
                       include_crowd: bool = False) -> Dict[str, np.ndarray]:
        cats = [r.get("category") or [[PAD_TOKEN]] for r in rows]
        atts = [r.get("attribute") or [[PAD_TOKEN]] for r in rows]
        b = len(rows)
        o = self.max_objects
        bbox = np.full((b, o, 4), BOX_PAD_VALUE, np.float32)
        for i, r in enumerate(rows):
            boxes = r.get("bbox") or []
            for j, box in enumerate(boxes[:o]):
                bbox[i, j] = box
        out = {
            "category_ids": self.codec.encode_categories(cats, o),
            "attribute_ids": self.codec.encode_attributes(
                atts, o, self.max_attribute_words),
            "bbox": bbox,
            "num_objects": np.asarray(
                [min(int(r.get("num_boxes") or 0), o) for r in rows],
                np.int32),
        }
        # Original image size [h, w] + per-object pixel AREA: the COCO eval
        # protocol's area-range thresholds (32^2/96^2) are defined on the
        # ORIGINAL image in pixels, using the annotation's own `area` field
        # (segmentation area) when present — box w*h on the resized square
        # would systematically mis-bucket non-square originals.
        orig = np.zeros((b, 2), np.int32)
        area = np.zeros((b, o), np.float32)
        for i, r in enumerate(rows):
            ih = int(_scalar_or(r.get("height"), 0)) or self.image_size[0]
            iw = int(_scalar_or(r.get("width"), 0)) or self.image_size[1]
            orig[i] = (ih, iw)
            boxes = r.get("bbox") or []
            areas = r.get("area")
            areas = areas if isinstance(areas, (list, tuple)) else []
            for j in range(min(len(boxes), o)):
                a = areas[j] if j < len(areas) else None
                if a is not None and np.isfinite(a) and a > 0:
                    area[i, j] = float(a)
                else:
                    area[i, j] = max(boxes[j][2], 0.0) * max(
                        boxes[j][3], 0.0) * iw * ih
        out["orig_size"] = orig
        out["area"] = area
        if include_crowd:
            # crowd flags feed the COCO eval protocol (detections matched to
            # crowds are ignored, train/metrics.py). The key decision is made
            # ONCE per feed (not per batch) so every batch from one iterator
            # has an identical pytree structure — a per-batch key would make
            # fit(scan_steps>1) stacking KeyError on mixed groups.
            crowd = np.zeros((b, o), np.int32)
            for i, r in enumerate(rows):
                flags = r.get("iscrowd")  # pandas NaN when the row lacks it
                if not isinstance(flags, (list, tuple)):
                    continue
                for j, flag in enumerate(flags[:o]):
                    crowd[i, j] = int(flag or 0)
            out["iscrowd"] = crowd
        if self.mask_size:
            out["masks"] = self._encode_masks(rows, bbox)
        return out

    def _encode_masks(self, rows, bbox: np.ndarray) -> np.ndarray:
        """Panoptic mask targets [B, O, S, S] from the dataframe's COCO
        ``segmentation`` column (polygon/RLE decode in ``data.masks``);
        objects without segmentation fall back to filled-box masks."""
        from boosted_detr_tpu.data import masks as masks_lib

        b, o = len(rows), self.max_objects
        s = self.mask_size
        out = np.zeros((b, o, s, s), np.float32)
        for i, r in enumerate(rows):
            segs = r.get("segmentation") or []
            n = min(int(r.get("num_boxes") or 0), o)
            for j in range(n):
                seg = segs[j] if j < len(segs) else None
                out[i, j] = masks_lib.segmentation_to_mask(
                    seg, s, bbox=bbox[i, j])
        return out

    def _load_images(self, chunk) -> np.ndarray:
        """Batch image loading; JPEG files take the native C++ path
        (native/imgload: libjpeg decode + bilinear resize + thread pool),
        everything else falls back to per-image PIL/cv2."""
        paths = [r["image_path"] for r in chunk]
        if all(p.lower().endswith((".jpg", ".jpeg"))
               and not p.startswith(("http://", "https://", "synthetic://"))
               for p in paths):
            try:
                from boosted_detr_tpu.native import imgload_binding

                images, ok = imgload_binding.load_jpeg_batch(
                    paths, self.image_size)
                if not ok.all():
                    for i in np.nonzero(~ok)[0]:
                        images[i] = load_image(paths[i], self.image_size,
                                               self.dataset)
                return images
            except Exception:
                pass  # toolchain unavailable -> python path
        return np.stack([
            load_image(p, self.image_size, self.dataset) for p in paths])

    def batches(self, df, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_remainder: bool = True,
                augment=None, repeat: bool = False,
                process_index: int = 0, process_count: int = 1,
                epoch: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield padded numpy batches. ``augment`` is an optional host-side
        callable(batch_dict, rng) -> batch_dict.

        When ``shuffle``, each call draws a FRESH order/augmentation stream
        (seed folded with an advancing per-pipeline epoch counter, matching
        tf.data's reshuffle_each_iteration); pass ``epoch`` explicitly for a
        reproducible specific epoch.

        Multi-host: pass ``process_index``/``process_count`` (e.g.
        jax.process_index()/jax.process_count()) and each host reads its own
        row stride — the per-process feed sharding the reference's
        tf.distribute setup never exercised (SURVEY §5.8)."""
        if epoch is None:
            epoch, self._epoch = self._epoch, self._epoch + 1
        rng = np.random.default_rng((seed, epoch) if shuffle else seed)
        rows = df.to_dict("records")
        include_crowd = any(r.get("iscrowd") for r in rows)  # ONCE per feed
        if process_count > 1 and len(rows) < batch_size * process_count:
            raise ValueError(
                f"dataset has {len(rows)} rows but one global batch needs "
                f"batch_size*process_count = {batch_size * process_count}; "
                "shrink batch_size or grow the dataset")
        while True:
            # Every process MUST yield the SAME number of batches: the
            # trainer's global-array assembly is a collective, so a host
            # with one extra batch would block forever waiting for peers.
            # The (seed, epoch) rng is identical on all hosts, so the global
            # permutation agrees everywhere; truncating AFTER shuffling means
            # the excluded N % (batch_size*process_count) remainder rotates
            # across epochs instead of being permanently dropped.
            order = rng.permutation(len(rows)) if shuffle else np.arange(
                len(rows))
            if process_count > 1:
                per = len(rows) // (batch_size * process_count)
                order = order[:per * batch_size * process_count]
                order = order[process_index::process_count]
            for start in range(0, len(order), batch_size):
                idx = order[start:start + batch_size]
                if len(idx) < batch_size and drop_remainder:
                    continue
                chunk = [rows[i] for i in idx]
                batch = self._encode_labels(chunk,
                                            include_crowd=include_crowd)
                batch["image"] = self._load_images(chunk)
                batch["image_id"] = np.asarray(
                    [int(r.get("id_num", -1)) for r in chunk], np.int64)
                if augment is not None:
                    batch = augment(batch, rng)
                yield batch
            if not repeat:
                break

    def directory_batches(self, directory: str, batch_size: int
                          ) -> Iterator[Dict[str, np.ndarray]]:
        """Unlabeled inference feed from an image directory with placeholder
        labels (reference pipeline.py:210-251)."""
        paths = sorted(
            os.path.join(directory, f) for f in os.listdir(directory)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".gif", ".bmp")))
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            rows = [{"bbox": None, "category": None, "attribute": None,
                     "num_boxes": 0, "id_num": start + i}
                    for i in range(len(chunk))]
            batch = self._encode_labels(rows)
            batch["image"] = np.stack(
                [load_image(p, self.image_size) for p in chunk])
            batch["image_path"] = np.asarray(chunk)
            yield batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread prefetch; optionally places batches with a
    NamedSharding (per-host feed for the 'data' mesh axis)."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def worker():
        try:
            for item in iterator:
                if sharding is not None:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), item)
                q.put(item)
            q.put(_END)
        except BaseException as exc:  # propagate to the consumer
            q.put((_ERR, exc))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
