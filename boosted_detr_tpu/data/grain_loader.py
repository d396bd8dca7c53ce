"""Grain-based input pipeline (alternative to the built-in feeder).

SURVEY §2.2 names Grain as the TPU-native host-pipeline replacement for the
reference's tf.data runtime. This module adapts the framework's dataframe /
codec contract onto ``grain.python``: a random-access source performs decode
+ label encoding per record, an IndexSampler handles shuffling, epochs and
per-host sharding, and Grain's worker pool parallelizes the host work.

Yields the same batch dict contract as ``data.pipeline.Pipeline.batches``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from boosted_detr_tpu.data.pipeline import Pipeline, load_image


class DataFrameSource:
    """grain RandomAccessDataSource over a COCO-format dataframe: decodes the
    image and encodes labels for ONE record (grain batches downstream)."""

    def __init__(self, df, pipeline: Pipeline):
        self._rows = df.to_dict("records")
        self._pipe = pipeline
        # key-set decision made ONCE for the whole source (batch pytrees must
        # be structurally identical), matching Pipeline.batches
        self._include_crowd = any(r.get("iscrowd") for r in self._rows)

    def __len__(self) -> int:
        return len(self._rows)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self._rows[idx]
        batch = self._pipe._encode_labels(
            [row], include_crowd=self._include_crowd)
        image = load_image(row["image_path"], self._pipe.image_size,
                           self._pipe.dataset)
        # full parity with Pipeline.batches: masks / iscrowd / area /
        # orig_size flow through when the pipeline produces them
        out = {k: v[0] for k, v in batch.items()}
        out["image"] = image.astype(np.float32)
        out["image_id"] = np.int64(row.get("id_num", -1))
        return out


def make_grain_loader(df, pipeline: Pipeline, batch_size: int,
                      shuffle: bool = True, seed: int = 0,
                      num_epochs: Optional[int] = 1,
                      worker_count: int = 0,
                      process_index: int = 0, process_count: int = 1
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """A grain DataLoader over the dataframe, yielding framework batches.

    ``worker_count > 0`` enables grain's multiprocessing prefetch;
    ``process_index/process_count`` shard records per host (grain
    ShardOptions), the multi-host feed split of SURVEY §5.8.
    """
    import grain.python as grain

    source = DataFrameSource(df, pipeline)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardOptions(shard_index=process_index,
                                         shard_count=process_count,
                                         drop_remainder=True),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed)
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count)
    return iter(loader)
