"""Torch -> flax weight bridge for the YOLO models.

Lets a user of the reference framework carry torch checkpoints straight into
this one (and powers the end-to-end parity tests: same weights, same image,
same boxes).  Layout mapping:

* torch ``Conv2d.weight`` [out, in, kh, kw] -> flax ``kernel`` [kh, kw, in, out]
* torch ``BatchNorm2d`` (weight, bias, running_mean, running_var) ->
  flax ``BatchNorm`` (scale, bias) + ``batch_stats`` (mean, var)

The module walks the torch ``Sequential``s in order (reference
``models/backbones/darknet19.py:22-221``, ``models/yolov2.py:74-89``), so it
is robust to the pool/activation interleaving.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _conv_bn_pairs(seq) -> List[Tuple[object, object]]:
    """(Conv2d, BatchNorm2d) pairs from a torch Sequential, in order."""
    import torch.nn as tnn

    convs = [m for m in seq if isinstance(m, tnn.Conv2d)]
    bns = [m for m in seq if isinstance(m, tnn.BatchNorm2d)]
    if len(convs) != len(bns):
        raise ValueError(
            f"unpaired conv/bn in sequential: {len(convs)} vs {len(bns)}"
        )
    return list(zip(convs, bns))


def _np(t) -> np.ndarray:
    # .numpy() aliases the torch storage — copy, so in-place torch updates
    # (e.g. a later opt.step()) can't silently mutate the converted tree.
    return t.detach().cpu().numpy().copy()


def _fill_block(params: Dict, stats: Dict, conv, bn) -> None:
    """Write one torch (Conv2d, BatchNorm2d) into a ConvBnLeaky subtree."""
    params["Conv_0"]["kernel"] = _np(conv.weight).transpose(2, 3, 1, 0)
    if conv.bias is not None:
        params["Conv_0"]["bias"] = _np(conv.bias)
    params["BatchNorm_0"]["scale"] = _np(bn.weight)
    params["BatchNorm_0"]["bias"] = _np(bn.bias)
    stats["BatchNorm_0"]["mean"] = _np(bn.running_mean)
    stats["BatchNorm_0"]["var"] = _np(bn.running_var)


def load_torch_darknet19(torch_backbone, variables) -> Dict:
    """Copy a reference ``Darknet19Backbone`` (torch) into flax variables of
    :class:`odc_tpu.models.backbones.darknet19.Darknet19Backbone`.

    ``variables`` may be the backbone's own tree or a parent model's with a
    ``Darknet19Backbone_0`` scope; returns a new variables dict."""
    import jax

    variables = jax.tree.map(np.asarray, variables)
    params = variables["params"]
    stats = variables["batch_stats"]
    if "Darknet19Backbone_0" in params:
        params = params["Darknet19Backbone_0"]
        stats = stats["Darknet19Backbone_0"]

    for k in range(1, 8):
        seq = getattr(torch_backbone, f"net{k}")
        for i, (conv, bn) in enumerate(_conv_bn_pairs(seq)):
            block = f"ConvBnLeaky_{i}"
            _fill_block(
                params[f"stage{k}"][block],
                stats[f"stage{k}"][block],
                conv,
                bn,
            )
    return variables


def load_torch_googlenet_backbone(torch_googlenet, variables) -> Dict:
    """Copy a torchvision-layout GoogLeNet (torch module with conv1..
    inception5b, the subset the reference walks in ``googlenet.py:30-47``)
    into flax variables of our ``GoogLeNetBackbone`` — possibly nested in a
    parent model under ``GoogLeNetBackbone_0``."""
    import jax

    from odc_tpu.models.backbones.convert_googlenet import convert_state_dict

    variables = jax.tree.map(np.asarray, variables)
    nested = "GoogLeNetBackbone_0" in variables["params"]
    sub = (
        {
            "params": variables["params"]["GoogLeNetBackbone_0"],
            "batch_stats": variables["batch_stats"]["GoogLeNetBackbone_0"],
        }
        if nested
        else variables
    )
    sub = convert_state_dict(
        {k: v for k, v in torch_googlenet.state_dict().items()}, sub
    )
    if not nested:
        return sub
    variables["params"]["GoogLeNetBackbone_0"] = sub["params"]
    variables["batch_stats"]["GoogLeNetBackbone_0"] = sub["batch_stats"]
    return variables


def load_torch_yolov1(torch_model, variables) -> Dict:
    """Copy a full reference ``YOLOv1`` (torch) — GoogLeNet backbone + the
    Flatten/Dense head (``models/yolov1.py:80-86``) — into flax variables of
    :class:`odc_tpu.models.yolov1.YOLOv1`.  The flatten order matches (both
    flatten NHWC [N, 7, 7, 1024] row-major)."""
    import torch.nn as tnn

    variables = load_torch_googlenet_backbone(
        torch_model.backbone_model.backbone_model, variables
    )
    params = variables["params"]
    linears = [
        m for m in torch_model.head_model if isinstance(m, tnn.Linear)
    ]
    for i, lin in enumerate(linears):
        dense = params[f"Dense_{i}"]
        dense["kernel"] = _np(lin.weight).T  # [out, in] -> [in, out]
        dense["bias"] = _np(lin.bias)
    return variables


def load_torch_yolov2(torch_model, variables) -> Dict:
    """Copy a full reference ``YOLOv2`` (torch) — backbone + neck-conv +
    head — into flax variables of :class:`odc_tpu.models.yolov2.YOLOv2`."""
    import torch.nn as tnn

    variables = load_torch_darknet19(torch_model.backbone_model, variables)
    params = variables["params"]
    stats = variables["batch_stats"]

    head = torch_model.head_model
    convs = [m for m in head if isinstance(m, tnn.Conv2d)]
    bn3 = next(m for m in head if isinstance(m, tnn.BatchNorm2d))
    _fill_block(params["ConvBnLeaky_0"], stats["ConvBnLeaky_0"], convs[0], bn3)

    final = convs[-1]
    params["Conv_0"]["kernel"] = _np(final.weight).transpose(2, 3, 1, 0)
    if final.bias is not None:
        params["Conv_0"]["bias"] = _np(final.bias)
    return variables
