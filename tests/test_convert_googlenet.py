"""Validate the torchvision->flax GoogLeNet weight mapping by roundtrip:
fabricate a state_dict in torch layout from our own random params, convert,
and check the tree is reproduced exactly (order, shapes, transposes)."""

import numpy as np

import jax
import jax.numpy as jnp

from odc_tpu.models.backbones.googlenet import GoogLeNetBackbone
from odc_tpu.models.backbones.convert_googlenet import (
    convert_state_dict,
    _flax_unit_names,
    _TORCH_UNITS,
)


def test_roundtrip_conversion():
    model = GoogLeNetBackbone()
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.uint8)
    )
    variables = jax.tree.map(np.asarray, variables)

    rng = np.random.default_rng(0)
    units = _flax_unit_names(variables)
    assert len(units) == len(_TORCH_UNITS) == 3 + 9 * 6

    state_dict = {}
    expect = {}
    for (name, p_unit, s_unit), tname in zip(units, _TORCH_UNITS):
        k = rng.normal(size=p_unit["Conv_0"]["kernel"].shape).astype(np.float32)
        state_dict[f"{tname}.conv.weight"] = k.transpose(3, 2, 0, 1)  # OIHW
        c = p_unit["Conv_0"]["kernel"].shape[-1]
        for field, key in (
            ("weight", "scale"), ("bias", "bias"),
            ("running_mean", "mean"), ("running_var", "var"),
        ):
            v = rng.normal(size=(c,)).astype(np.float32)
            state_dict[f"{tname}.bn.{field}"] = v
            expect[(tname, key)] = v
        expect[(tname, "kernel")] = k

    out = convert_state_dict(state_dict, variables)
    for (name, p_unit, s_unit), tname in zip(_flax_unit_names(out), _TORCH_UNITS):
        np.testing.assert_array_equal(
            p_unit["Conv_0"]["kernel"], expect[(tname, "kernel")], err_msg=tname
        )
        np.testing.assert_array_equal(
            p_unit["BatchNorm_0"]["scale"], expect[(tname, "scale")]
        )
        np.testing.assert_array_equal(
            s_unit["BatchNorm_0"]["mean"], expect[(tname, "mean")]
        )
        np.testing.assert_array_equal(
            s_unit["BatchNorm_0"]["var"], expect[(tname, "var")]
        )

    # Input tree untouched (pure conversion).
    u0 = _flax_unit_names(variables)[0]
    assert not np.array_equal(
        u0[1]["Conv_0"]["kernel"], expect[(_TORCH_UNITS[0], "kernel")]
    )
