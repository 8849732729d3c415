"""Model forward-pass smoke + shape/structure tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph3d_gcn_tpu.configs import SPH3DConfig, modelnet_config
from sph3d_gcn_tpu.models import (
    SPH3DModelNet,
    SPH3DRueMonge,
    SPH3DSceneSeg,
    SPH3DShapeNet,
    SPH3DShapeNetOnehot,
    classification_loss,
    inner_masked_segmentation_loss,
    segmentation_loss,
)


def _tiny_cls_config():
    return modelnet_config(num_input=512)  # 1 level: num_sample=(128,)


def _tiny_seg_config(num_cls=5):
    return SPH3DConfig(
        num_input=64,
        num_cls=num_cls,
        mlp=8,
        num_sample=(32, 16),
        radius=(0.4, 0.8),
        nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)),
        multiplier=((2, 2), (2, 2)),
        weight_decay=None,
    )


def test_modelnet_forward_shape_and_loss():
    cfg = _tiny_cls_config()
    model = SPH3DModelNet(cfg)
    pts = np.random.default_rng(0).standard_normal((2, 512, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (2, 40)
    labels = jnp.array([3, 7], jnp.int32)
    loss = classification_loss(logits, labels)
    assert np.isfinite(float(loss))


def test_modelnet_train_mode_updates_batch_stats():
    cfg = _tiny_cls_config()
    model = SPH3DModelNet(cfg)
    pts = np.random.default_rng(1).standard_normal((2, 512, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    _, mutated = model.apply(
        variables,
        pts,
        train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated


def test_scene_seg_forward_shape():
    cfg = _tiny_seg_config(num_cls=5)
    model = SPH3DSceneSeg(cfg)
    # 9-channel input: xyz, rel_xyz, rgb (cols 6: are features).
    pts = np.random.default_rng(2).standard_normal((2, 64, 9)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (2, 64, 5)


def test_scene_seg_inner_masked_loss():
    logits = jnp.zeros((2, 8, 4))
    labels = jnp.zeros((2, 8), jnp.int32)
    inner = jnp.ones((2, 8), jnp.int32)
    loss = inner_masked_segmentation_loss(logits, labels, inner)
    # uniform logits -> nll = log(4) per point; per-item mean summed over 2.
    np.testing.assert_allclose(float(loss), 2 * np.log(4), rtol=1e-5)
    # empty inner mask on one item contributes 0
    inner0 = inner.at[1].set(0)
    loss0 = inner_masked_segmentation_loss(logits, labels, inner0)
    np.testing.assert_allclose(float(loss0), np.log(4), rtol=1e-5)


def test_shapenet_forward_shape():
    cfg = _tiny_seg_config()
    model = SPH3DShapeNet(cfg, num_cls=6)
    pts = np.random.default_rng(3).standard_normal((2, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (2, 64, 6)
    loss = segmentation_loss(logits, jnp.zeros((2, 64), jnp.int32))
    assert np.isfinite(float(loss))


def test_shapenet_onehot_forward_shape():
    cfg = _tiny_seg_config()
    model = SPH3DShapeNetOnehot(cfg, num_cls=10)
    pts = np.random.default_rng(4).standard_normal((2, 64, 3)).astype(np.float32)
    cls_label = jnp.array([0, 15], jnp.int32)
    variables = model.init(jax.random.key(0), pts, cls_label, train=False)
    logits = model.apply(variables, pts, cls_label, train=False)
    assert logits.shape == (2, 64, 10)


def test_ruemonge_forward_shape():
    cfg = _tiny_seg_config(num_cls=7)
    model = SPH3DRueMonge(cfg)
    pts = np.random.default_rng(5).standard_normal((2, 64, 9)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    logits = model.apply(variables, pts, train=False)
    assert logits.shape == (2, 64, 7)


def test_config_immutable_and_reusable():
    # The reference mutates config lists in place between encoder and
    # decoder (SPH3D_s3dis.py:79-84) breaking re-runs; ours must not.
    cfg = _tiny_seg_config()
    model = SPH3DSceneSeg(cfg)
    pts = np.random.default_rng(6).standard_normal((1, 64, 9)).astype(np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    a = model.apply(variables, pts, train=False)
    b = model.apply(variables, pts, train=False)  # second run identical
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cfg.radius == (0.4, 0.8)


def test_param_structure_matches_reference_scopes():
    cfg = _tiny_cls_config()
    model = SPH3DModelNet(cfg)
    pts = np.zeros((1, 512, 3), np.float32)
    variables = model.init(jax.random.key(0), pts, train=False)
    params = variables["params"]
    assert "mlp1" in params and "weights" in params["mlp1"]
    assert "conv1" in params and "_1" in params["conv1"]
    assert "depthwise_weights" in params["conv1"]["_1"]
    assert "global_conv" in params
    assert set(params["logits"].keys()) == {"weights"}  # no bias by config


def test_bfloat16_compute_mode():
    import dataclasses

    cfg32 = _tiny_seg_config(num_cls=5)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    pts = np.random.default_rng(9).standard_normal((2, 64, 9)).astype(np.float32)
    m32, m16 = SPH3DSceneSeg(cfg32), SPH3DSceneSeg(cfg16)
    v = m32.init(jax.random.key(0), pts, train=False)
    out32 = np.asarray(m32.apply(v, pts, train=False))
    out16 = np.asarray(m16.apply(v, pts, train=False))
    assert out16.dtype == np.float32  # logits head stays f32
    # bf16 compute tracks f32 loosely
    denom = np.maximum(np.abs(out32), 0.3)
    assert np.median(np.abs(out16 - out32) / denom) < 0.15


def test_ids_and_random_sampling_modes():
    import dataclasses

    base = _tiny_seg_config(num_cls=4)
    pts = np.random.default_rng(10).standard_normal((2, 64, 9)).astype(np.float32)
    for method in ("IDS", "random"):
        cfg = dataclasses.replace(base, sample=method)
        model = SPH3DSceneSeg(cfg)
        v = model.init(
            jax.random.key(0), pts, train=False,
        )
        out = model.apply(
            v, pts, train=False, rngs={"sample": jax.random.key(1)}
        )
        assert out.shape == (2, 64, 4)
        assert np.isfinite(np.asarray(out)).all()


def test_config_validation_rejects_misuse():
    # Misuse at the package boundary raises at CONFIG time, not at trace
    # time: per-level list length mismatch, non-positive kernel sizes,
    # unknown sampling method.
    import dataclasses

    import pytest

    from sph3d_gcn_tpu.configs import modelnet_config

    cfg = modelnet_config()
    with pytest.raises(ValueError, match="radius must have"):
        dataclasses.replace(cfg, radius=(0.1,))
    with pytest.raises(ValueError, match="kernel must be"):
        dataclasses.replace(cfg, kernel=(0, 2, 2))
    with pytest.raises(ValueError, match="Unknown sampling method"):
        dataclasses.replace(cfg, sample="nope")
