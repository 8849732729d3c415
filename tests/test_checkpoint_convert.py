"""TF1 name-map converter tests (synthetic variable dicts; a real TF1
checkpoint from the reference release converts through the same map)."""

import jax
import numpy as np
import pytest

from sph3d_gcn_tpu.configs import SPH3DConfig, modelnet_config
from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg
from sph3d_gcn_tpu.utils.checkpoint_convert import (
    _tf_name_for_path,
    convert_tf_variables,
)


def _expected_tf_names(variables):
    names = {}
    def visit(path, leaf):
        key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        m = _tf_name_for_path(key)
        if m is not None:
            names[m[0]] = tuple(leaf.shape)
        return leaf
    jax.tree_util.tree_map_with_path(visit, variables)
    return names


def test_modelnet_name_map_matches_reference_scopes():
    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    variables = model.init(jax.random.key(0), np.zeros((1, 512, 3), np.float32))
    names = _expected_tf_names(variables)
    # Scope names per ref utils/sph3gcn_util.py:125-161 + SPH3D_modelnet.py
    assert "mlp1/weights" in names
    assert "conv1_1/depthwise_weights" in names
    assert "conv1_1/weights" in names
    assert "conv1_1/bn/gamma" in names
    assert "conv1_1/bn/moving_mean" in names
    assert "global_conv/depthwise_weights" in names
    assert "fc1/weights" in names and "fc2/weights" in names
    assert "logits/weights" in names
    # depthwise shape (binSize, C, multiplier) per ref tf_conv3d.py:15
    assert names["conv1_1/depthwise_weights"][0] == cfg.bin_size


def test_seg_name_map_strips_backbone():
    cfg = SPH3DConfig(
        num_input=64, num_cls=5, mlp=8, num_sample=(32, 16),
        radius=(0.4, 0.8), nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)), multiplier=((2, 2), (2, 2)),
        weight_decay=None,
    )
    model = SPH3DSceneSeg(cfg)
    variables = model.init(jax.random.key(0), np.zeros((1, 64, 9), np.float32))
    names = _expected_tf_names(variables)
    assert "conv1_1/depthwise_weights" in names
    assert "deconv1_1/depthwise_weights" in names
    assert "logits/weights" in names
    assert not any(n.startswith("backbone") for n in names)


def test_convert_roundtrip_and_errors():
    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    variables = model.init(jax.random.key(0), np.zeros((1, 512, 3), np.float32))
    names = _expected_tf_names(variables)
    rng = np.random.default_rng(0)
    tf_vars = {n: rng.standard_normal(s).astype(np.float32) for n, s in names.items()}
    out = convert_tf_variables(variables, tf_vars)
    got = np.asarray(out["params"]["mlp1"]["weights"])
    np.testing.assert_array_equal(got, tf_vars["mlp1/weights"])
    # BN stats land in batch_stats
    bn_stats = out["batch_stats"]["mlp1"]["bn"]["BatchNorm_0"]["mean"]
    np.testing.assert_array_equal(
        np.asarray(bn_stats), tf_vars["mlp1/bn/moving_mean"]
    )

    with pytest.raises(KeyError):
        convert_tf_variables(variables, dict(list(tf_vars.items())[:-2]))

    bad = dict(tf_vars)
    bad["mlp1/weights"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError):
        convert_tf_variables(variables, bad)
