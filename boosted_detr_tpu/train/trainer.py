"""Keras-like Trainer: compile()/fit()/evaluate()/predict().

The reference's UX is ``model.compile(optimizer); model.fit(ds)`` with
checkpoint/NaN-guard/TensorBoard callbacks (reference DETR_COCO.ipynb cells
26, 35). This Trainer provides the same surface over the functional core:

- ``compile``: builds the optax optimizer (clipnorm + schedule parity) and
  the jitted train/eval steps, with optional staged freezing
  (``train_block`` / ``freeze_backbone``) via optimizer masks — no retrace
  per stage (SURVEY §7 hard-part 5);
- ``fit``: epoch loop over host batches, device placement on the mesh,
  NaN guard (parity with the reference's TerminateOnNaN callback,
  DETR_COCO.ipynb cell 35), periodic orbax checkpointing with
  keep-latest-k (SURVEY §5.3/5.4), CSV + stdout metric logging;
- ``evaluate``: the training loss path without updates (test_step ==
  train_step in the reference, model.py:235-236);
- ``predict``: raw probabilities decoded to text by the host codec.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from boosted_detr_tpu.config import ModelConfig, TrainConfig
from boosted_detr_tpu.data.codec import TextCodec
from boosted_detr_tpu.parallel import mesh as mesh_lib
from boosted_detr_tpu.train import steps as steps_lib


class NaNLossError(RuntimeError):
    pass


class Trainer:
    def __init__(self, model, model_cfg: ModelConfig,
                 train_cfg: TrainConfig,
                 codec: Optional[TextCodec] = None,
                 mesh=None):
        self.model = model
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.codec = codec
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            train_cfg.mesh_shape)
        self.state: Optional[steps_lib.TrainState] = None
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        self._predict_adaptive = None
        self._ckpt_mgr = None
        self._rng = jax.random.PRNGKey(train_cfg.seed)

    # -- building --------------------------------------------------------

    def _trainable_mask(self, params):
        """Freezing policy: ``train_block=k`` trains only weak-learner block
        k's layers (encoder_k/decoder_block_k/*_head_k) with everything else
        (incl. backbone) frozen — the reference's staged boosting recipe
        (Boosted_DETR_COCO.ipynb cell 30)."""
        k = self.train_cfg.train_block
        if k is None:
            return None
        return steps_lib.boosted_block_mask(params, k)

    def _is_panoptic(self) -> bool:
        from boosted_detr_tpu.models import panoptic as panoptic_lib

        return isinstance(self.model, panoptic_lib.DETRPanoptic)

    def compile(self, optimizer=None, sample_batch=None):
        """Build optimizer + jitted steps + initial state. ``optimizer`` may
        be a ready optax GradientTransformation (parity with passing a Keras
        optimizer to compile, reference README.md:43); ``train_block``
        freezing applies to it too via an optimizer mask. DETRPanoptic
        modules get the panoptic (detection + matched mask loss) step."""
        assert sample_batch is not None, "compile needs a sample batch"
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(self.train_cfg.seed), sample_batch["image"])
        mask = self._trainable_mask(variables["params"])
        if optimizer is not None:
            tx = (steps_lib.apply_trainable_mask(optimizer, mask)
                  if mask is not None else optimizer)
        else:
            tx = steps_lib.make_optimizer(
                self.train_cfg, d_model=self.model_cfg.decoder_dim,
                trainable_mask=mask)
        self.state = steps_lib.TrainState.create(
            variables["params"], variables.get("batch_stats", {}), tx,
            ema=self.train_cfg.ema_decay > 0.0)
        # donate the state: its buffers are reused in place instead of
        # copied every step (29M params in the flagship config)
        if self._is_panoptic():
            from boosted_detr_tpu.models import panoptic as panoptic_lib

            train_step = panoptic_lib.make_panoptic_train_step(
                self.model, self.train_cfg)
        else:
            train_step = steps_lib.make_train_step(
                self.model, self.model_cfg, self.train_cfg)
        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def train_scan(state, stacked, rng):
            def body(st, batch):
                st, aux = train_step(st, batch, rng)
                return st, aux

            return jax.lax.scan(body, state, stacked)

        # grouped-step variant: one dispatch executes scan_steps steps over a
        # stacked superbatch (amortizes per-dispatch overhead)
        self._train_scan = jax.jit(train_scan, donate_argnums=(0,))
        if self._is_panoptic():
            from boosted_detr_tpu.models import panoptic as panoptic_lib

            self._eval_step = jax.jit(panoptic_lib.make_panoptic_eval_step(
                self.model, self.train_cfg))
        else:
            self._eval_step = jax.jit(steps_lib.make_eval_step(
                self.model, self.model_cfg, self.train_cfg))
        self._predict_step = jax.jit(steps_lib.make_predict_step(self.model))
        if self.train_cfg.checkpoint_dir:
            self._ckpt_mgr = _make_checkpoint_manager(
                self.train_cfg.checkpoint_dir,
                keep=self.train_cfg.keep_checkpoints)
            self.restore()  # resume if a checkpoint exists
        return self

    # -- checkpointing (reference: ModelCheckpoint + latest_checkpoint
    #    resume, DETR_COCO.ipynb cells 18, 26) ---------------------------

    def save(self, step: Optional[int] = None, wait: bool = True):
        """Checkpoint the full train state. ``wait=False`` leaves the orbax
        save running asynchronously (preemptible-TPU friendly, SURVEY §5.3);
        a later save/restore joins it."""
        if self._ckpt_mgr is None:
            return
        step = int(self.state.step) if step is None else step
        self._ckpt_mgr.save(step, args=_ckpt_args(self.state))
        if wait:
            self._ckpt_mgr.wait_until_finished()

    def save_weights(self, path: str):
        """Keras-style explicit weight save (params + batch_stats, plus the
        EMA shadow when the state carries one) to an orbax single-checkpoint
        directory (reference save_weights parity, DETR_COCO.ipynb cell 32)."""
        import orbax.checkpoint as ocp

        payload = {"params": self.state.params,
                   "batch_stats": self.state.batch_stats}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        ckptr.wait_until_finished()

    def load_weights(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        template = {"params": self.state.params,
                    "batch_stats": self.state.batch_stats}
        # the EMA shadow round-trips when BOTH sides have it; a checkpoint
        # saved without EMA loads into an EMA-enabled state (shadow re-seeds
        # from the restored params) and vice versa (shadow dropped), so old
        # checkpoints and config changes both keep working. Orbax restore
        # templates must match the on-disk tree exactly, so the template is
        # built from the checkpoint's own key metadata.
        has_ema = self.state.ema_params is not None
        on_disk = set(ckptr.metadata(os.path.abspath(path)).item_metadata)
        if has_ema and "ema_params" in on_disk:
            template["ema_params"] = self.state.ema_params
        elif "ema_params" in on_disk:  # EMA ckpt -> EMA-less state: discard
            template["ema_params"] = self.state.params
        restored = ckptr.restore(os.path.abspath(path), template)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            ema_params=(restored.get(
                "ema_params",
                jax.tree_util.tree_map(jnp.copy, restored["params"]))
                if has_ema else None))

    def load_pretrained_backbone(self, source: str,
                                 subtree: str = "backbone"):
        """Import offline pretrained ResNet weights (npz documented layout
        or torchvision-style state dict; models/pretrained.py) into the live
        state — the reference's ``weights='imagenet'`` path (reference
        backbone.py:37-39) without network egress. For DETRPanoptic the
        backbone lives under the nested detr module."""
        from boosted_detr_tpu.models import pretrained

        if self._is_panoptic():
            merged = pretrained.load_pretrained_backbone(
                {"params": self.state.params["detr"],
                 "batch_stats": self.state.batch_stats["detr"]}, source,
                subtree=subtree)
            params = dict(self.state.params, detr=merged["params"])
            stats = dict(self.state.batch_stats,
                         detr=merged["batch_stats"])
        else:
            merged = pretrained.load_pretrained_backbone(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats}, source,
                subtree=subtree)
            params, stats = merged["params"], merged["batch_stats"]
        self.state = self.state.replace(params=params, batch_stats=stats)
        return self

    def restore(self) -> bool:
        if self._ckpt_mgr is None or self._ckpt_mgr.latest_step() is None:
            return False
        step = self._ckpt_mgr.latest_step()
        # same EMA cross-compatibility as load_weights: the restore template
        # must match the on-disk tree, so key presence comes from metadata
        on_disk = set(self._ckpt_mgr.item_metadata(step))
        restored = self._ckpt_mgr.restore(
            step, args=_ckpt_restore_args(self.state, on_disk))
        self.state = self.state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.state.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"])),
            ema_params=((restored.get(
                "ema_params",
                jax.tree_util.tree_map(jnp.copy, restored["params"])))
                if self.state.ema_params is not None else None))
        return True

    # -- loops ------------------------------------------------------------

    BATCH_KEYS = ("image", "category_ids", "attribute_ids", "bbox",
                  "num_objects", "masks")

    def _place(self, batch, batch_axis: int = 0):
        """Shard the batch axis over 'data' (``batch_axis=1`` for stacked
        [scan_steps, B, ...] superbatches); falls back to replication when
        the batch doesn't divide the mesh axis. Under multi-process JAX the
        incoming batch is this host's LOCAL shard (fed by
        ``Pipeline.batches(process_index=...)``) and is assembled into a
        global array (SURVEY §5.8)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = {k: v for k, v in batch.items() if k in self.BATCH_KEYS}
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        b = int(np.shape(batch["image"])[batch_axis])
        if jax.process_count() > 1:
            global_b = b * jax.process_count()
            assert n_data % jax.process_count() == 0 and \
                global_b % n_data == 0, (
                    f"local batch {b} x {jax.process_count()} processes "
                    f"must divide the 'data' axis ({n_data})")
            spec = P(*([None] * batch_axis + [mesh_lib.DATA_AXIS]))
            sh = NamedSharding(self.mesh, spec)
            from boosted_detr_tpu.parallel.multiprocess import global_batch
            return global_batch(batch, sh)
        if n_data > 1 and b % n_data == 0:
            spec = P(*([None] * batch_axis + [mesh_lib.DATA_AXIS]))
            sh = NamedSharding(self.mesh, spec)
        else:
            sh = mesh_lib.replicated(self.mesh)
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def fit(self, batches: Iterable[Dict[str, np.ndarray]],
            epochs: int = 1, steps_per_epoch: Optional[int] = None,
            validation_batches: Optional[Iterable] = None,
            log_path: Optional[str] = None,
            tensorboard_dir: Optional[str] = None,
            log_every: int = 10,
            checkpoint_every_epochs: int = 1,
            batch_fn: Optional[Callable] = None,
            scan_steps: int = 1) -> Dict[str, list]:
        """``batches``: an iterable (or callable returning one per epoch) of
        numpy batch dicts. Raises NaNLossError on non-finite loss (reference
        TerminateOnNaN parity).

        ``scan_steps > 1`` groups that many consecutive batches into ONE
        compiled dispatch (a lax.scan over a stacked superbatch) — N times
        fewer host->device round trips per epoch."""
        assert self.state is not None, "call compile() first"
        history = {"loss": [], "val_loss": []}
        writer = _CsvLogger(log_path) if log_path else None
        tb = _TensorBoardLogger(tensorboard_dir) if tensorboard_dir else None

        for epoch in range(epochs):
            it = batches() if callable(batches) else batches
            t0 = time.time()
            n_steps = 0
            running = 0.0
            pending = []
            stop_epoch = False

            def run_pending():
                nonlocal running, n_steps
                if not pending:
                    return
                if len(pending) == scan_steps and scan_steps > 1:
                    stacked = {k: np.stack([b[k] for b in pending])
                               for k in pending[0]}
                    # the batch axis of the stacked superbatch is axis 1
                    stacked = self._place(stacked, batch_axis=1)
                    self.state, aux = self._train_scan(
                        self.state, stacked, self._rng)
                    losses = [float(x) for x in np.asarray(aux["loss"])]
                    aux = {k: v[-1] for k, v in aux.items()}
                else:
                    # single batches and partial tail groups dispatch
                    # per-step: reusing _train_step avoids retracing
                    # _train_scan for every distinct remainder length
                    losses = []
                    for b in pending:
                        self.state, aux = self._train_step(
                            self.state, self._place(b), self._rng)
                        losses.append(float(aux["loss"]))
                for loss in losses:
                    if not np.isfinite(loss):
                        raise NaNLossError(
                            f"non-finite loss at step {int(self.state.step)}")
                    running += loss
                    n_steps += 1
                scalars = {k: float(np.asarray(v).reshape(-1)[-1])
                           for k, v in aux.items()}
                if writer and n_steps % log_every < len(losses):
                    writer.write(int(self.state.step), scalars)
                if tb and n_steps % log_every < len(losses):
                    tb.write(int(self.state.step), scalars)
                pending.clear()

            for batch in it:
                if batch_fn is not None:
                    batch = batch_fn(batch)
                pending.append({k: np.asarray(v) for k, v in batch.items()
                                if k in self.BATCH_KEYS})
                if len(pending) >= max(scan_steps, 1):
                    run_pending()
                if steps_per_epoch and n_steps >= steps_per_epoch:
                    stop_epoch = True
                    break
            if not stop_epoch:
                run_pending()
            else:
                pending.clear()
            if n_steps == 0:
                raise ValueError(
                    "the batch iterable was empty this epoch — pass a "
                    "CALLABLE returning a fresh iterator per epoch (a plain "
                    "generator is exhausted after the first epoch)")
            epoch_loss = running / n_steps
            history["loss"].append(epoch_loss)
            msg = (f"epoch {epoch + 1}/{epochs}: loss={epoch_loss:.4f} "
                   f"steps={n_steps} ({time.time() - t0:.1f}s)")

            if validation_batches is not None:
                vit = (validation_batches() if callable(validation_batches)
                       else validation_batches)
                v_losses = []
                for batch in vit:
                    batch = self._place(batch)
                    v_losses.append(float(self._eval_step(
                        self.state, batch)["loss"]))
                val = float(np.mean(v_losses)) if v_losses else float("nan")
                history["val_loss"].append(val)
                msg += f" val_loss={val:.4f}"
            print(msg, flush=True)

            if self._ckpt_mgr and (epoch + 1) % checkpoint_every_epochs == 0:
                self.save(wait=False)  # async; joined on exit/restore
        if writer:
            writer.close()
        if tb:
            tb.close()
        if self._ckpt_mgr is not None:
            self._ckpt_mgr.wait_until_finished()  # join async epoch saves
        return history

    def _read_state(self, use_ema: bool = False) -> "steps_lib.TrainState":
        """State used for read-only passes (eval/predict): the live params,
        or the EMA shadow when ``use_ema`` (TrainConfig.ema_decay > 0)."""
        return (steps_lib.with_ema_params(self.state) if use_ema
                else self.state)

    def evaluate(self, batches: Iterable,
                 use_ema: bool = False) -> Dict[str, float]:
        state = self._read_state(use_ema)
        sums: Dict[str, float] = {}
        n = 0
        for batch in batches:
            batch = self._place(batch)
            aux = self._eval_step(state, batch)
            for k, v in aux.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def export_serving(self, path: str) -> str:
        """Write a standalone StableHLO serving artifact (weights baked in,
        symbolic batch, cpu+tpu lowering) — see boosted_detr_tpu.serving."""
        from boosted_detr_tpu import serving

        return serving.export_serving(self, path)

    def export_inference_fn(self):
        """A self-contained compiled inference callable for serving: images
        -> (category_strings, attribute_strings, boxes) via the host codec,
        with the current weights baked in as captured constants."""
        state = self.state
        predict = self._predict_step
        codec = self.codec

        def serve(images: np.ndarray):
            preds = predict(state, jnp.asarray(images))
            preds = {k: np.asarray(v) for k, v in preds.items()}
            if codec is not None:
                return codec.decode_predictions(preds)
            return preds

        return serve

    def predict(self, images: np.ndarray, decode_text: bool = True,
                early_exit_threshold: Optional[float] = None,
                use_ema: bool = False):
        """Images -> (category_strings, attribute_strings, boxes) via the
        host codec (reference inference signature, model.py:226-233), or the
        raw probability dict when ``decode_text=False``.

        ``early_exit_threshold`` enables adaptive-depth inference (the
        reference README.md:63-88 design): each image takes the earliest
        decoder block that meets ``ModelConfig.early_exit_criterion`` —
        "confidence" (threshold = confidence floor) or "stability"
        (threshold = max inter-block prediction delta; see
        models/early_exit.py for why cumulative boosted outputs need it).
        ``use_ema`` serves the EMA shadow weights (TrainConfig.ema_decay)."""
        read_state = self._read_state(use_ema)
        threshold = (early_exit_threshold
                     if early_exit_threshold is not None
                     else self.model_cfg.early_exit_threshold)
        if threshold is not None:
            if self._predict_adaptive is None:
                from boosted_detr_tpu.models import early_exit

                select = (early_exit.stability_select
                          if self.model_cfg.early_exit_criterion
                          == "stability" else early_exit.adaptive_select)

                def adaptive(state, image, thr):
                    outs = self.model.apply(
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        image, train=False, return_intermediate=True)
                    preds, exit_block = select(outs, thr)
                    return preds, exit_block

                self._predict_adaptive = jax.jit(adaptive)
            preds, exit_block = self._predict_adaptive(
                read_state, jnp.asarray(images), jnp.float32(threshold))
            preds = {k: np.asarray(v) for k, v in preds.items()}
            preds["exit_block"] = np.asarray(exit_block)
        else:
            preds = self._predict_step(read_state, jnp.asarray(images))
            preds = {k: np.asarray(v) for k, v in preds.items()}
        if decode_text and self.codec is not None:
            return self.codec.decode_predictions(preds)
        return preds


class _TensorBoardLogger:
    """TensorBoard scalar logging (reference notebooks use a TensorBoard
    callback, DETR_COCO.ipynb cell 35); uses tf.summary host-side only."""

    def __init__(self, logdir: str):
        import tensorflow as tf

        self._writer = tf.summary.create_file_writer(logdir)

    def write(self, step: int, metrics: Dict[str, float]):
        import tensorflow as tf

        with self._writer.as_default():
            for k, v in metrics.items():
                tf.summary.scalar(k, v, step=step)

    def close(self):
        self._writer.close()


class _CsvLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", newline="")
        self._writer = None

    def write(self, step: int, metrics: Dict[str, float]):
        row = {"step": step, **metrics}
        if self._writer is None:
            self._writer = csv.DictWriter(self._f, fieldnames=list(row))
            if self._f.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._f.flush()

    def close(self):
        self._f.close()


def _make_checkpoint_manager(directory: str, keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True),
        # a declared handler lets a FRESH manager read item_metadata() from
        # an existing directory (otherwise it returns None before the first
        # restore) — restore() needs the on-disk key set for the EMA
        # cross-compatibility template
        item_handlers=ocp.StandardCheckpointHandler())


def _ckpt_args(state: steps_lib.TrainState):
    import orbax.checkpoint as ocp

    payload = {
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": jax.tree_util.tree_leaves(state.opt_state),
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    return ocp.args.StandardSave(payload)


def _ckpt_restore_args(state: steps_lib.TrainState, on_disk_keys=None):
    """Restore template matching ``state`` AND the checkpoint's on-disk key
    set (orbax templates must mirror the saved tree exactly): an EMA-enabled
    state restoring a pre-EMA checkpoint omits the shadow (the caller
    re-seeds it from params); an EMA checkpoint restoring into an EMA-less
    state reads the shadow into a throwaway slot."""
    import orbax.checkpoint as ocp

    template = {
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": jax.tree_util.tree_leaves(state.opt_state),
    }
    ckpt_has_ema = (state.ema_params is not None if on_disk_keys is None
                    else "ema_params" in on_disk_keys)
    if ckpt_has_ema:
        template["ema_params"] = (state.ema_params
                                  if state.ema_params is not None
                                  else state.params)
    return ocp.args.StandardRestore(template)
