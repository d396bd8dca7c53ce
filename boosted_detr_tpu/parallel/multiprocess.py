"""Multi-process (multi-host) distribution wiring (SURVEY §5.8).

The reference's tf.distribute strategy selector never exercised a
multi-worker path; here the JAX-native one is wired end-to-end:

- ``initialize``: ``jax.distributed.initialize`` with explicit coordinator /
  process arguments (or none on TPU pods, where they come from the
  environment). After it, ``jax.devices()`` is the GLOBAL device list and a
  Mesh built over it spans all hosts; XLA emits cross-host collectives
  (Gloo on CPU smoke tests, ICI/DCN on TPU pods).
- ``feed_info``: the (process_index, process_count) pair the data pipeline
  strides its rows by (``Pipeline.batches(process_index=, process_count=)``).
- ``global_batch``: assemble each host's local batch shard into a global
  jax.Array on the mesh (``jax.make_array_from_process_local_data``) — the
  per-host feed the Trainer places when ``jax.process_count() > 1``.

Launch pattern (one command per host):

    python -m boosted_detr_tpu.cli train --synthetic \\
        --coordinator host0:1234 --num-processes 2 --process-id $RANK
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper. With no arguments
    on a TPU pod slice, everything is inferred from the environment; CPU/GPU
    runs pass coordinator/num_processes/process_id explicitly."""
    import jax

    if getattr(initialize, "_done", False):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    initialize._done = True


def feed_info() -> Dict[str, int]:
    """The stride this process reads from the dataset."""
    import jax

    return {"process_index": jax.process_index(),
            "process_count": jax.process_count()}


def global_batch(local_batch: Dict[str, np.ndarray], sharding
                 ) -> Dict[str, "object"]:
    """Per-host local batch dict -> globally-sharded jax.Arrays. The local
    leading dimension is this host's shard; the global batch is
    local * process_count."""
    import jax

    return {k: jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(v))
            for k, v in local_batch.items()}
