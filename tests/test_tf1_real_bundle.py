"""Convert a checkpoint bundle written by TENSORFLOW ITSELF (not by the
repo's own pure-Python writer): scripts/make_tf1_fixture.py shells out to
tf.compat.v1.train.Saver — the exact writer the reference's training
sessions use (ref modelnet40_cls/train_modelnet.py saver.save) — and the
repo-side reader/converter must reproduce every value.
"""

import importlib.util
import json
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = __file__.rsplit("/tests/", 1)[0]

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("tensorflow") is None,
    reason="tensorflow not installed (fixture writer unavailable)",
)


def test_convert_tf_written_bundle(tmp_path):
    from sph3d_gcn_tpu.configs import modelnet_config
    from sph3d_gcn_tpu.models import SPH3DModelNet
    from sph3d_gcn_tpu.utils.checkpoint_convert import (
        _tf_name_for_path,
        convert_checkpoint,
        load_tf_checkpoint,
    )

    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    variables = model.init(
        jax.random.key(0), np.zeros((1, 512, 3), np.float32)
    )

    # spec: every model variable under its reference TF name
    spec: dict[str, list[int]] = {}

    def visit(path, leaf):
        key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        m = _tf_name_for_path(key)
        if m is not None:
            spec[m[0]] = list(leaf.shape)
        return leaf

    jax.tree_util.tree_map_with_path(visit, variables)
    assert "conv1_1/depthwise_weights" in spec and "logits/weights" in spec

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    ckpt = str(tmp_path / "model.ckpt-200000")
    seed = 7
    proc = subprocess.run(
        [sys.executable, f"{REPO}/scripts/make_tf1_fixture.py",
         str(spec_path), ckpt, "--seed", str(seed)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the pure-Python reader parses TF's own bundle; optimizer slots and
    # global_step are present in the file but stripped by the loader
    from sph3d_gcn_tpu.utils.tf1_bundle import read_bundle

    raw = read_bundle(ckpt)
    assert "global_step" in raw and raw["global_step"] == 200000
    assert any("/Adam" in n for n in raw)
    loaded = load_tf_checkpoint(ckpt)
    assert not any("/Adam" in n or n == "global_step" for n in loaded)

    out = convert_checkpoint(variables, ckpt)
    # every converted leaf equals the fixture's deterministic fill
    for i, (name, shape) in enumerate(spec.items()):
        expect = (
            np.random.default_rng(seed + i)
            .standard_normal(shape)
            .astype(np.float32)
        )
        np.testing.assert_array_equal(loaded[name], expect, err_msg=name)
    got = np.asarray(out["params"]["logits"]["weights"])
    idx = list(spec).index("logits/weights")
    expect = (
        np.random.default_rng(seed + idx)
        .standard_normal(spec["logits/weights"])
        .astype(np.float32)
    )
    np.testing.assert_array_equal(got, expect)
