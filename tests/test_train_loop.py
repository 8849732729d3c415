"""End-to-end mini training runs: loop, checkpoint/resume, eval protocols,
dataset pipelines."""

import numpy as np
import pytest

import jax

from sph3d_gcn_tpu.configs import SPH3DConfig
from sph3d_gcn_tpu.data.datasets import (
    load_modelnet_records,
    load_scene_blocks,
    modelnet_batches,
    pad_batch,
    resample_indices,
    scene_batches,
)
from sph3d_gcn_tpu.data.tfrecord import TFRecordWriter
from sph3d_gcn_tpu.models import SPH3DSceneSeg
from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory
from sph3d_gcn_tpu.train.checkpoint import (
    Checkpointer,
    load_config_snapshot,
    snapshot_config,
)
from sph3d_gcn_tpu.train.eval import coverage_eval_block, vote_classify
from sph3d_gcn_tpu.train.loop import fit


def _tiny_cfg():
    return SPH3DConfig(
        num_input=64, num_cls=4, mlp=8, num_sample=(32, 16),
        radius=(0.5, 0.9), nn_uplimit=(8, 8),
        channels=((8, 8), (8, 8)), multiplier=((1, 1), (1, 1)),
        weight_decay=None,
    )


def _write_block_file(path, num_blocks=6, seed=0):
    rng = np.random.default_rng(seed)
    with TFRecordWriter(path) as w:
        for _ in range(num_blocks):
            n = rng.integers(40, 120)
            xyz = rng.standard_normal((n, 3)).astype(np.float32)
            rgb = rng.random((n, 3)).astype(np.float32)
            label = rng.integers(0, 4, n).astype(np.int32)
            inner = rng.integers(0, 2, n).astype(np.int32)
            index = np.arange(n, dtype=np.int32)
            w.write_example({
                "xyz_raw": xyz.tobytes(),
                "rgb_raw": rgb.tobytes(),
                "seg_label": label.tobytes(),
                "inner_label": inner.tobytes(),
                "index_label": index.tobytes(),
                "scene_label": np.int64(0),
                "scene_idx": np.int64(1),
            })


def test_scene_pipeline_and_fit_with_resume(tmp_path):
    path = str(tmp_path / "blocks.tfrecord")
    _write_block_file(path)
    blocks = load_scene_blocks([path])
    assert len(blocks) == 6
    assert blocks[0].points.shape[1] == 6

    cfg = _tiny_cfg()
    model = SPH3DSceneSeg(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = segmentation_step_factory(model, tx, inner_masked=True)
    log_dir = str(tmp_path / "log")

    def train_it(epoch):
        return scene_batches(
            blocks, batch_size=2, num_point=cfg.num_input,
            rng=np.random.default_rng(epoch),
        )

    state = fit(fac, train_it, None, batch_size=2, num_epochs=2,
                log_dir=log_dir)
    assert int(state.step) == 6  # 2 epochs x 3 batches

    # Resume: one more epoch continues from epoch 2.
    state2 = fit(fac, train_it, None, batch_size=2, num_epochs=3,
                 log_dir=log_dir)
    assert int(state2.step) == 9
    log = open(f"{log_dir}/log_train.txt").read()
    assert "resumed from epoch" in log


def test_checkpointer_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    model = SPH3DSceneSeg(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = segmentation_step_factory(model, tx, inner_masked=True)
    rng = np.random.default_rng(0)
    batch = {
        "points": rng.standard_normal((2, 64, 6)).astype(np.float32),
        "label": rng.integers(0, 4, (2, 64)).astype(np.int32),
        "inner_label": np.ones((2, 64), np.int32),
    }
    state = fac.init_state(jax.random.key(0), batch)
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(5, state)
    assert ck.latest_epoch() == 5
    restored = ck.restore(state, 5)
    np.testing.assert_array_equal(
        np.asarray(restored.params["logits"]["weights"]),
        np.asarray(state.params["logits"]["weights"]),
    )
    ck.close()


def test_config_snapshot_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    snapshot_config(str(tmp_path), cfg)
    loaded = load_config_snapshot(str(tmp_path))
    assert loaded == cfg


def test_modelnet_records_roundtrip(tmp_path):
    path = str(tmp_path / "mn.tfrecord")
    rng = np.random.default_rng(1)
    with TFRecordWriter(path) as w:
        for i in range(5):
            xyz = rng.standard_normal((32, 3)).astype(np.float32)
            w.write_example({"xyz_raw": xyz.tobytes(), "label": np.int64(i)})
    recs = load_modelnet_records([path])
    assert len(recs) == 5 and recs[3].label == 3
    batches = list(modelnet_batches(recs, 2, shuffle=False))
    assert len(batches) == 3
    assert batches[0]["points"].shape == (2, 32, 3)
    # axis swap applied
    np.testing.assert_array_equal(
        batches[0]["points"][0], recs[0].xyz[:, [0, 2, 1]]
    )


def test_pad_batch_repeats_last_item():
    batch = {"points": np.ones((3, 8, 3)), "label": np.arange(3, dtype=np.int32)}
    padded, bsize = pad_batch(batch, 5)
    assert bsize == 3
    assert padded["points"].shape[0] == 5
    # pads repeat the last REAL item (zeros would make degenerate clouds
    # that NaN the unit-sphere normalization through batch norm)
    np.testing.assert_array_equal(padded["points"][3], batch["points"][2])
    assert padded["label"].tolist() == [0, 1, 2, 2, 2]


def test_normalize_unit_sphere_degenerate_cloud():
    import jax.numpy as jnp

    from sph3d_gcn_tpu.models.common import normalize_unit_sphere

    pts = jnp.zeros((2, 16, 3))  # all-identical cloud
    out = np.asarray(normalize_unit_sphere(pts))
    assert np.isfinite(out).all()


def test_resample_indices_rule():
    rng = np.random.default_rng(0)
    short = resample_indices(10, 20, rng)
    assert len(short) == 20  # with replacement
    full = resample_indices(30, 20, rng)
    assert len(set(full.tolist())) == 20  # without replacement


def test_vote_classify_accumulates():
    calls = []

    def forward(x):
        calls.append(x.copy())
        return np.ones((x.shape[0], 4))

    batch = np.random.default_rng(2).standard_normal((2, 16, 3)).astype(np.float32)
    total = vote_classify(forward, batch, num_votes=3)
    np.testing.assert_allclose(total, 3.0)
    # vote 0 is un-augmented
    np.testing.assert_array_equal(calls[0], batch)
    assert not np.allclose(calls[1], batch)


def test_coverage_eval_block_covers_all_inner():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((50, 6)).astype(np.float32)
    inner = (rng.random(50) < 0.5).astype(np.int32)
    seen = np.zeros(50, np.int64)

    def forward(x):
        return np.ones((1, x.shape[1], 4))

    logits = coverage_eval_block(forward, pts, inner, num_model_points=20,
                                 rng=rng)
    assert logits.shape == (50, 4)
    covered = logits.sum(axis=1) > 0
    assert covered[inner == 1].all()


def test_coverage_eval_block_warns_on_exhausted_max_rounds():
    # 40 points resampled 10 at a time can't cover everything in 1 round;
    # a finite max_rounds must warn instead of silently truncating
    # (ref evaluate_s3dis_with_overlap.py:270 loops unboundedly).
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((40, 6)).astype(np.float32)
    inner = np.ones(40, np.int32)

    def forward(x):
        return np.ones((1, x.shape[1], 4))

    with pytest.warns(UserWarning, match="max_rounds=1 exhausted"):
        coverage_eval_block(forward, pts, inner, num_model_points=10,
                            rng=rng, max_rounds=1)


def test_coverage_eval_blocks_warns_on_exhausted_max_rounds():
    from sph3d_gcn_tpu.train.eval import coverage_eval_blocks

    rng = np.random.default_rng(0)
    blocks = [(rng.standard_normal((40, 6)).astype(np.float32),
               np.ones(40, np.int32))]

    def forward(x, ids):
        return np.ones((x.shape[0], x.shape[1], 4))

    with pytest.warns(UserWarning, match="block 0 exhausted max_rounds=1"):
        coverage_eval_blocks(forward, blocks, 10, batch_size=2, rng=rng,
                             max_rounds=1)


def test_coverage_eval_min_count_and_augment():
    from sph3d_gcn_tpu.train.eval import shapenet_eval_augment

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    inner = np.ones(30, np.int32)
    calls = []

    def forward(x):
        calls.append(x.copy())
        return np.ones((1, x.shape[1], 3))

    logits = coverage_eval_block(
        forward, pts, inner, num_model_points=10, rng=rng,
        min_count=3, augment_fn=shapenet_eval_augment,
    )
    # paired raw+augmented passes: even call count, consecutive pairs differ
    assert len(calls) % 2 == 0
    assert not np.allclose(calls[0], calls[1])
    # every point sampled at least min_count times => logit sums >= 3*2 per hit
    counts = logits[:, 0]  # each hit adds 1 (raw) + 1 (augmented)
    assert counts.min() >= 2 * 3


def test_eval_loss_excludes_padded_rows(tmp_path):
    # 3 eval items at batch_size=2: the final batch is padded by repeating
    # its last item; the logged eval_loss must average per-item losses over
    # the 3 REAL items only.
    import json

    cfg = _tiny_cfg()
    model = SPH3DSceneSeg(cfg)
    tx = make_optimizer("adam", 0.001)
    fac = segmentation_step_factory(model, tx, inner_masked=True)
    rng = np.random.default_rng(7)

    def make_batches(sizes):
        out = []
        for b in sizes:
            out.append({
                "points": rng.standard_normal((b, 64, 9)).astype(np.float32),
                "label": rng.integers(0, 4, (b, 64)).astype(np.int32),
                "inner_label": np.ones((b, 64), np.int32),
            })
        return out

    train = make_batches([2])
    evals = make_batches([2, 1])  # short final batch
    log_dir = str(tmp_path / "log")
    state = fit(fac, lambda e: iter(train), lambda: iter(evals),
                batch_size=2, num_epochs=1, log_dir=log_dir)

    # Recompute the unbiased value directly from the eval step.
    ev = fac.eval_step()
    items = []
    for b in evals:
        padded, bsize = pad_batch(b, 2)
        out = ev(state, padded)
        items.extend(np.asarray(out["item_loss"])[:bsize].tolist())
    expected = float(np.mean(items))

    logged = [
        json.loads(line)
        for line in open(f"{log_dir}/metrics.jsonl")
        if "eval_loss" in line
    ]
    np.testing.assert_allclose(logged[-1]["eval_loss"], expected, rtol=1e-5)


def _dense_violation_cfg():
    """Dense config whose windows provably under-cover: the level radii
    span the whole 256-point cloud, so every in-range slab is wider than
    the 128-row windows and every dense graph reports ok=False."""
    import dataclasses

    return dataclasses.replace(
        SPH3DConfig(
            num_input=256, num_cls=4, mlp=8, num_sample=(64, 16),
            radius=(1.5, 3.0), nn_uplimit=(8, 8),
            channels=((8, 8), (8, 8)), multiplier=((1, 1), (1, 1)),
            weight_decay=None, spatial_sort=True,
        ),
        windows=(128, 128), dense_graph=True,
    )


def _loop_batches(batches):
    return lambda *_: iter(batches)


@pytest.mark.slow
def test_fit_dense_fallback_matches_classic(tmp_path):
    """An adversarial cloud trips dense_ok=False; fit() must transparently
    re-run those batches through the classic engine, ending in EXACTLY the
    state a classic-engine run produces (VERDICT r2 directive #3)."""
    import dataclasses

    dense_cfg = _dense_violation_cfg()
    classic_cfg = dataclasses.replace(dense_cfg, dense_graph=False)
    rng = np.random.default_rng(41)
    batches = [
        {
            "points": rng.standard_normal((2, 256, 9)).astype(np.float32),
            "label": rng.integers(0, 4, (2, 256)).astype(np.int32),
            "inner_label": rng.integers(0, 2, (2, 256)).astype(np.int32),
        }
        for _ in range(2)
    ]

    def run(cfg, sub):
        factory = segmentation_step_factory(
            SPH3DSceneSeg(cfg), make_optimizer("adam", 1e-3),
            inner_masked=True,
        )
        return fit(
            factory, _loop_batches(batches), _loop_batches(batches[:1]),
            batch_size=2, num_epochs=1, log_dir=str(tmp_path / sub), seed=0,
        )

    state_dense = run(dense_cfg, "dense")
    state_classic = run(classic_cfg, "classic")

    log = open(tmp_path / "dense" / "log_train.txt").read()
    assert "coverage violated" in log  # the fallback actually fired
    flat_d = jax.tree_util.tree_leaves(state_dense.params)
    flat_c = jax.tree_util.tree_leaves(state_classic.params)
    for a, b in zip(flat_d, flat_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        )


def test_fit_dense_violation_raise(tmp_path):
    """on_dense_violation='raise' aborts on the first bad step."""
    factory = segmentation_step_factory(
        SPH3DSceneSeg(_dense_violation_cfg()), make_optimizer("adam", 1e-3),
        inner_masked=True,
    )
    rng = np.random.default_rng(3)
    batches = [{
        "points": rng.standard_normal((2, 256, 9)).astype(np.float32),
        "label": rng.integers(0, 4, (2, 256)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (2, 256)).astype(np.int32),
    }]
    with pytest.raises(RuntimeError, match="coverage violated"):
        fit(
            factory, _loop_batches(batches), None, batch_size=2,
            num_epochs=1, log_dir=str(tmp_path / "log"), seed=0,
            on_dense_violation="raise",
        )


def test_checked_eval_step_falls_back(tmp_path):
    """checked_eval_step re-runs a violating batch through the classic
    engine and returns its (exact) metrics."""
    from sph3d_gcn_tpu.train.eval import checked_eval_step

    dense_cfg = _dense_violation_cfg()
    factory = segmentation_step_factory(
        SPH3DSceneSeg(dense_cfg), make_optimizer("adam", 1e-3),
        inner_masked=True,
    )
    rng = np.random.default_rng(7)
    batch = {
        "points": rng.standard_normal((2, 256, 9)).astype(np.float32),
        "label": rng.integers(0, 4, (2, 256)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (2, 256)).astype(np.int32),
    }
    state = factory.init_state(jax.random.key(0), batch)
    raw = factory.eval_step()(state, batch)
    assert not bool(raw["dense_ok"])  # the dense engine flags the batch
    checked = checked_eval_step(factory)(state, batch)
    assert bool(checked["dense_ok"])  # fallback metrics are certified
    classic = factory.classic_fallback().eval_step()(state, batch)
    np.testing.assert_allclose(
        np.asarray(checked["logits"]), np.asarray(classic["logits"]),
        rtol=0, atol=0,
    )


@pytest.mark.slow
def test_bn_priming_matches_batch_statistics():
    """Priming with N=1 installs exactly that batch's statistics: an
    eval-mode forward on the same batch then equals a train-mode forward
    (both normalize by the same batch stats; scene models have no
    dropout). VERDICT r2 directive #7."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), with_bn=True)
    factory = segmentation_step_factory(
        SPH3DSceneSeg(cfg), make_optimizer("adam", 1e-3), inner_masked=True
    )
    rng = np.random.default_rng(9)
    batch = {
        "points": rng.standard_normal((4, 64, 9)).astype(np.float32),
        "label": rng.integers(0, 4, (4, 64)).astype(np.int32),
        "inner_label": np.ones((4, 64), np.int32),
    }
    state = factory.init_state(jax.random.key(0), batch)
    stats = factory.prime_step()(state, batch, jax.random.key(1))
    primed = state.replace(batch_stats=stats)

    eval_logits = np.asarray(
        factory.eval_step()(primed, batch)["logits"]
    )
    model = factory.model
    train_logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["points"], train=True, mutable=["batch_stats", "intermediates"],
        rngs={"dropout": jax.random.key(2), "sample": jax.random.key(3)},
    )
    # recovering the batch stat divides by (1 - momentum) = 0.01, which
    # amplifies f32 rounding ~100x per BN layer — hence the loose atol
    train_logits = np.asarray(train_logits)
    np.testing.assert_allclose(eval_logits, train_logits, atol=3e-2)
    # contrast: without priming, eval-mode logits are far from train-mode
    unprimed = np.asarray(factory.eval_step()(state, batch)["logits"])
    primed_err = np.abs(eval_logits - train_logits).max()
    unprimed_err = np.abs(unprimed - train_logits).max()
    assert unprimed_err > 10 * primed_err
