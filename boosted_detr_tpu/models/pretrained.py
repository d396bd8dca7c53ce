"""Offline pretrained-weight import for the ResNet backbone.

The reference's ResNet50 option loads ImageNet weights and applies ResNet
preprocessing (reference backbone.py:37-39, Keras ``weights='imagenet'``).
This image has zero network egress, so the equivalent here is an OFFLINE
import path: the user supplies a checkpoint file and
``Trainer.load_pretrained_backbone`` / ``api`` wire it into the live state.
Two formats are accepted:

1. **npz (canonical, documented layout)**: a ``numpy.savez`` archive whose
   keys are slash-joined flax paths of the ``ResNetBackbone`` subtree,
   prefixed by collection::

       params/stem/conv/kernel                     [7,7,3,64]   (HWIO)
       params/stem/norm/scale|bias                 [64]
       params/stage{S}_block{I}/conv{1,2,3}/conv/kernel
       params/stage{S}_block{I}/conv{1,2,3}/norm/scale|bias
       params/stage{S}_block{I}/proj/conv/kernel   (blocks that project)
       params/stage{S}_block{I}/proj/norm/scale|bias
       batch_stats/<same paths>/norm/mean|var

   ``save_backbone_npz`` writes exactly this layout (round-trip tool and
   the format generator for offline converters).

2. **torch state dict** (torchvision ResNet-50 naming): a ``.pt``/``.pth``
   file ``torch.load``-able into a dict with keys ``conv1.weight``,
   ``bn1.{weight,bias,running_mean,running_var}``,
   ``layer{1-4}.{i}.conv{1-3}.weight``, ``layer{1-4}.{i}.bn{1-3}.*``,
   ``layer{1-4}.{i}.downsample.{0,1}.*``. Conv kernels are transposed
   OIHW -> HWIO. torchvision's ResNet-50 is v1.5 (stride on the 3x3),
   matching ``BottleneckBlock``.

Pretrained weights require the classic ``stem='conv7'`` (the patchify stem
has a different parameter shape) and ``backbone_width=1.0`` for torch
imports; shape mismatches raise with the offending path.

Preprocessing parity: set ``ModelConfig.preprocessing`` to match what the
weights were trained with — ``"scale"`` ([-1,1], the from-scratch default),
``"imagenet"`` (torch RGB mean/std), or ``"caffe"`` (Keras
``resnet.preprocess_input`` parity: RGB->BGR, ImageNet channel means).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Slash-joined path flattening via flax.traverse_util (flax is already
    a hard dependency; no need to hand-roll tree walking)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(dict(tree), sep="/")
    if prefix:
        flat = {f"{prefix}/{k}": v for k, v in flat.items()}
    return {k: np.asarray(v) for k, v in flat.items()}


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    from flax import traverse_util

    return traverse_util.unflatten_dict(dict(flat), sep="/")


def save_backbone_npz(variables: Dict[str, Any], path: str,
                      subtree: str = "backbone") -> None:
    """Write the ResNet backbone subtree of a model's variables to the
    documented npz layout (see module docstring)."""
    params = variables["params"][subtree]["resnet"]
    stats = variables.get("batch_stats", {}).get(subtree, {}).get("resnet",
                                                                  {})
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat.update({f"batch_stats/{k}": v for k, v in _flatten(stats).items()})
    np.savez(path, **flat)


def resnet_from_npz(path: str) -> Tuple[Dict, Dict]:
    """Load (params, batch_stats) subtrees for ``ResNetBackbone`` from the
    documented npz layout."""
    archive = np.load(path)
    params, stats = {}, {}
    for key in archive.files:
        coll, rest = key.split("/", 1)
        (params if coll == "params" else stats)[rest] = archive[key]
    return _unflatten(params), _unflatten(stats)


# torchvision layer index -> our stage name; block -> stageS_blockI
_TORCH_BN = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}


def resnet_from_torch(source) -> Tuple[Dict, Dict]:
    """Convert a torchvision-style ResNet-50 state dict (or a path to a
    torch-loadable file holding one) into (params, batch_stats) subtrees for
    ``ResNetBackbone``. Classifier ('fc.*') entries are ignored."""
    if isinstance(source, str):
        import torch

        source = torch.load(source, map_location="cpu", weights_only=True)
    flat: Dict[str, Dict[str, np.ndarray]] = {"params": {},
                                              "batch_stats": {}}

    def put(coll, path, value):
        flat[coll][path] = np.asarray(value)

    def conv_kernel(value):  # OIHW -> HWIO
        return np.transpose(np.asarray(value), (2, 3, 1, 0))

    for key, value in source.items():
        if key.endswith("num_batches_tracked"):
            continue  # torch BN bookkeeping; no flax equivalent
        value = value.detach().cpu().numpy() if hasattr(value, "detach") \
            else np.asarray(value)
        parts = key.split(".")
        if parts[0] == "conv1":
            put("params", "stem/conv/kernel", conv_kernel(value))
        elif parts[0] == "bn1":
            coll, leaf = _TORCH_BN[parts[1]]
            put(coll, f"stem/norm/{leaf}", value)
        elif parts[0].startswith("layer"):
            stage = int(parts[0][len("layer"):]) - 1
            block = f"stage{stage}_block{int(parts[1])}"
            if parts[2].startswith("conv"):
                put("params", f"{block}/{parts[2]}/conv/kernel",
                    conv_kernel(value))
            elif parts[2].startswith("bn"):
                coll, leaf = _TORCH_BN[parts[3]]
                put(coll, f"{block}/conv{parts[2][2:]}/norm/{leaf}", value)
            elif parts[2] == "downsample":
                if parts[3] == "0":  # conv
                    put("params", f"{block}/proj/conv/kernel",
                        conv_kernel(value))
                else:  # 1 = bn
                    coll, leaf = _TORCH_BN[parts[4]]
                    put(coll, f"{block}/proj/norm/{leaf}", value)
        elif parts[0] == "fc":
            continue  # classifier head: not part of the backbone
        else:
            raise ValueError(f"unrecognized torch ResNet key '{key}'")
    return _unflatten(flat["params"]), _unflatten(flat["batch_stats"])


def load_pretrained_backbone(variables: Dict[str, Any], source: str,
                             subtree: str = "backbone") -> Dict[str, Any]:
    """Return a copy of ``variables`` with the ResNet backbone subtree
    replaced by pretrained weights from ``source`` (.npz in the documented
    layout, or a torch state-dict file). Validates every shape and reports
    missing/mismatched paths."""
    if source.endswith(".npz"):
        new_params, new_stats = resnet_from_npz(source)
    else:
        new_params, new_stats = resnet_from_torch(source)

    def merge(current: Dict, incoming: Dict, where: str,
              coll: str) -> Dict:
        cur_flat = _flatten(current)
        inc_flat = _flatten(incoming)
        missing = sorted(set(cur_flat) - set(inc_flat))
        extra = sorted(set(inc_flat) - set(cur_flat))
        if missing or extra:
            raise ValueError(
                f"pretrained {coll} mismatch under '{where}': "
                f"missing={missing[:5]}{'...' if len(missing) > 5 else ''} "
                f"extra={extra[:5]}{'...' if len(extra) > 5 else ''} "
                "(pretrained ResNet import needs stem='conv7', matching "
                "depths and backbone_width)")
        for k, v in inc_flat.items():
            if tuple(v.shape) != tuple(cur_flat[k].shape):
                raise ValueError(
                    f"shape mismatch at {where}/{k}: checkpoint "
                    f"{v.shape} vs model {cur_flat[k].shape} "
                    "(stem='conv7' and backbone_width must match the "
                    "checkpoint)")
            inc_flat[k] = v.astype(cur_flat[k].dtype)
        return _unflatten(inc_flat)

    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    params = dict(variables["params"])
    bb = dict(params[subtree])
    bb["resnet"] = merge(bb["resnet"], new_params,
                         f"params/{subtree}/resnet", "params")
    params[subtree] = bb
    variables = dict(variables, params=params)
    if new_stats and "batch_stats" in variables:
        stats = dict(variables["batch_stats"])
        sb = dict(stats.get(subtree, {}))
        sb["resnet"] = merge(sb.get("resnet", {}), new_stats,
                             f"batch_stats/{subtree}/resnet", "batch_stats")
        stats[subtree] = sb
        variables = dict(variables, batch_stats=stats)
    return variables
