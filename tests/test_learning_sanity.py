"""End-to-end learning sanity: the model must actually learn separable
synthetic geometry (the reference's only equivalent check was watching
training-loop accuracy, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from sph3d_gcn_tpu.configs import SPH3DConfig
from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg
from sph3d_gcn_tpu.train import (
    classification_step_factory,
    make_optimizer,
    segmentation_step_factory,
)


def _cls_config():
    return SPH3DConfig(
        num_input=128, num_cls=2, mlp=16, num_sample=(32,),
        radius=(0.35,), nn_uplimit=(16,), channels=((16, 16),),
        multiplier=((2, 1),), weight_decay=None,
        global_channels=32, global_multiplier=1, use_raw=True,
        # BN running stats need ~1/(1-momentum) steps to converge; this
        # short sanity run checks learning mechanics without them.
        with_bn=False, with_bias=True,
    )


def _make_cls_batch(rng, b=16, n=128):
    """Class 0: points on a sphere shell; class 1: points in a flat disk."""
    pts = np.zeros((b, n, 3), np.float32)
    labels = rng.integers(0, 2, b).astype(np.int32)
    for i in range(b):
        v = rng.standard_normal((n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        if labels[i] == 0:
            pts[i] = v  # shell
        else:
            disk = v.copy()
            disk[:, 2] *= 0.05  # squashed disk
            pts[i] = disk
    return {"points": pts, "label": labels}


@pytest.mark.slow
def test_classifier_learns_shell_vs_disk():
    cfg = _cls_config()
    model = SPH3DModelNet(cfg)
    fac = classification_step_factory(model, make_optimizer("adam", 0.003))
    rng = np.random.default_rng(0)
    batch0 = _make_cls_batch(rng)
    state = fac.init_state(jax.random.key(0), batch0)
    step = fac.train_step()
    key = jax.random.key(1)
    for i in range(60):
        state, metrics = step(state, _make_cls_batch(rng), key)
    ev = fac.eval_step()
    test_batch = _make_cls_batch(np.random.default_rng(123))
    logits = np.asarray(ev(state, test_batch)["logits"])
    acc = (logits.argmax(-1) == test_batch["label"]).mean()
    assert acc >= 0.85, f"classifier failed to learn: acc={acc}"


@pytest.mark.slow
def test_segmenter_learns_height_split():
    cfg = SPH3DConfig(
        num_input=96, num_cls=2, mlp=8, num_sample=(32, 16),
        radius=(0.4, 0.8), nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)), multiplier=((1, 1), (1, 1)),
        weight_decay=None, with_bn=False, with_bias=True,
    )
    model = SPH3DSceneSeg(cfg)
    fac = segmentation_step_factory(
        model, make_optimizer("adam", 0.005), inner_masked=True
    )
    rng = np.random.default_rng(1)

    def make_batch(r):
        pts = r.uniform(-1, 1, (8, 96, 3)).astype(np.float32)
        # label = upper vs lower half of the cloud: geometric, learnable
        label = (pts[:, :, 2] > 0).astype(np.int32)
        feats = np.concatenate([pts, np.zeros_like(pts)], axis=2)
        return {
            "points": feats,
            "label": label,
            "inner_label": np.ones((8, 96), np.int32),
        }

    state = fac.init_state(jax.random.key(0), make_batch(rng))
    step = fac.train_step()
    key = jax.random.key(2)
    for _ in range(50):
        state, metrics = step(state, make_batch(rng), key)
    ev = fac.eval_step()
    tb = make_batch(np.random.default_rng(77))
    logits = np.asarray(ev(state, tb)["logits"])
    acc = (logits.argmax(-1) == tb["label"]).mean()
    assert acc >= 0.85, f"segmenter failed to learn: acc={acc}"
