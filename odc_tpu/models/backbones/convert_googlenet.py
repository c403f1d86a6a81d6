"""torchvision GoogLeNet state_dict -> flax params converter.

The reference gets pretrained weights via a network download
(``models/backbones/googlenet.py:12-14``); this environment has no egress,
so instead we convert a *locally provided* torchvision checkpoint
(``googlenet-1378be20.pth`` or an in-memory ``state_dict``) into our
``GoogLeNetBackbone`` parameter pytree:

    variables = load_torch_googlenet("/path/googlenet.pth")
    # or with an already-initialized tree, to validate structure:
    variables = convert_state_dict(torch_state_dict, variables_template)

Mapping: torch ``OIHW`` conv kernels -> flax ``HWIO``; BatchNorm
γ/β/mean/var -> scale/bias/batch_stats.  Module order in our backbone
matches the torchvision layer order exactly (conv1, conv2, conv3, then
inceptions 3a..5b with branch order 1x1 / 3x3red+3x3 / 5x5red+5x5 /
pool_proj), so conversion is positional over BasicConv2d units.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# torchvision module names for every BasicConv2d, in our apply order.
_TORCH_UNITS: List[str] = ["conv1", "conv2", "conv3"]
for _blk in ("3a", "3b", "4a", "4b", "4c", "4d", "4e", "5a", "5b"):
    _TORCH_UNITS += [
        f"inception{_blk}.branch1",
        f"inception{_blk}.branch2.0",
        f"inception{_blk}.branch2.1",
        f"inception{_blk}.branch3.0",
        f"inception{_blk}.branch3.1",
        f"inception{_blk}.branch4.1",
    ]


def _flax_unit_names(variables) -> List[Tuple[str, dict, dict]]:
    """Our BasicConv2d units in apply order: flax auto-names them
    BasicConv2d_0..N at the backbone level and Inception_i/BasicConv2d_j
    inside inception blocks, in construction order (which equals
    torchvision order)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    units = []

    def visit(p, s):
        names = sorted(
            (k for k in p if k.startswith("BasicConv2d")),
            key=lambda k: int(k.rsplit("_", 1)[1]),
        )
        for k in names:
            units.append((k, p[k], s[k]))

    # top-level stem convs
    visit(params, stats)
    inc_names = sorted(
        (k for k in params if k.startswith("Inception")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    for k in inc_names:
        visit(params[k], stats[k])
    return units


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], variables):
    """Fill a GoogLeNetBackbone variables tree from a torchvision
    ``state_dict`` (tensors or numpy arrays).  Returns a new tree."""
    import jax

    def npy(t):
        # copy: .numpy() aliases torch storage, and in-place torch updates
        # (opt.step()) must not mutate the converted tree.
        return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    new = jax.tree.map(lambda x: x, variables)  # fresh containers

    units = _flax_unit_names(new)
    if len(units) != len(_TORCH_UNITS):
        raise ValueError(
            f"unit count mismatch: flax {len(units)} vs torch "
            f"{len(_TORCH_UNITS)}"
        )

    for (name, p_unit, s_unit), tname in zip(units, _TORCH_UNITS):
        w = npy(state_dict[f"{tname}.conv.weight"])  # [O, I, kh, kw]
        kernel = w.transpose(2, 3, 1, 0)  # -> HWIO
        conv = p_unit["Conv_0"]
        if conv["kernel"].shape != kernel.shape:
            raise ValueError(
                f"{name}: kernel shape {conv['kernel'].shape} vs torch "
                f"{kernel.shape} ({tname})"
            )
        conv["kernel"] = kernel.astype(np.float32)

        bn_p = p_unit["BatchNorm_0"]
        bn_s = s_unit["BatchNorm_0"]
        bn_p["scale"] = npy(state_dict[f"{tname}.bn.weight"]).astype(np.float32)
        bn_p["bias"] = npy(state_dict[f"{tname}.bn.bias"]).astype(np.float32)
        bn_s["mean"] = npy(
            state_dict[f"{tname}.bn.running_mean"]
        ).astype(np.float32)
        bn_s["var"] = npy(
            state_dict[f"{tname}.bn.running_var"]
        ).astype(np.float32)

    return new


def load_torch_googlenet(pth_path: str, dtype=None):
    """Build a GoogLeNetBackbone variables tree from a local torchvision
    checkpoint file."""
    import torch
    import jax
    import jax.numpy as jnp

    from odc_tpu.models.backbones.googlenet import GoogLeNetBackbone

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    model = GoogLeNetBackbone(**({"dtype": dtype} if dtype else {}))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.uint8)
    )
    variables = jax.tree.map(np.asarray, variables)
    return convert_state_dict(sd, variables)
