"""Multi-host data-path plumbing (single-process testable parts).

No multi-host hardware exists in this environment (SURVEY.md §2.7 — the
reference has no distributed story at all), so these tests pin the parts
that are observable from one process: file-shard arithmetic, the
single-process fast path being bit-identical, process-0-only logging, and
the composed-mesh CLI helper. The multi-process branch of ``shard_batch``
(jax.make_array_from_process_local_data) is exercised with the real
single-process runtime, where local data == global data by definition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph3d_gcn_tpu.parallel import (
    local_batch_size,
    make_mesh,
    process_shard_files,
    shard_batch,
)


def test_process_shard_files_partitions():
    files = [f"f{i}" for i in range(10)]
    shards = [process_shard_files(files, p, 3) for p in range(3)]
    assert shards[0] == ["f0", "f3", "f6", "f9"]
    assert shards[1] == ["f1", "f4", "f7"]
    assert shards[2] == ["f2", "f5", "f8"]
    # disjoint cover
    assert sorted(sum(shards, [])) == sorted(files)
    # single process: unchanged
    assert process_shard_files(files, 0, 1) == files


def test_process_shard_files_defaults_to_runtime():
    files = ["a", "b", "c"]
    assert process_shard_files(files) == files  # 1 process here


def test_local_batch_size(monkeypatch):
    assert local_batch_size(16) == 16
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert local_batch_size(16) == 4
    with pytest.raises(ValueError, match="does not split"):
        local_batch_size(15)


def test_shard_batch_single_process_identity():
    mesh = make_mesh(jax.devices()[:4])
    batch = {
        "points": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "label": np.arange(8, dtype=np.int32),
    }
    out = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
        assert out[k].sharding.spec[0] == "data"


def test_make_array_from_process_local_data_path():
    """The multi-process assembly call works (trivially) when one process
    owns all the data — the branch fit()/shard_batch take on real
    multi-host jobs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(jax.devices()[:4])
    x = np.arange(8 * 2, dtype=np.float32).reshape(8, 2)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x
    )
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_logger_silent_on_secondary_process(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    from sph3d_gcn_tpu.train.loop import Logger

    logger = Logger(str(tmp_path / "sub"))
    logger.log("should not appear")
    logger.scalars(x=1)
    logger.close()
    assert capsys.readouterr().out == ""
    assert not (tmp_path / "sub").exists()  # no log dir created


def test_local_rows_single_process():
    from sph3d_gcn_tpu.train.loop import _local_rows

    x = jnp.arange(12.0).reshape(4, 3)
    np.testing.assert_array_equal(_local_rows(x), np.asarray(x))


def test_fit_multiprocess_requires_mesh(monkeypatch, tmp_path):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    from sph3d_gcn_tpu.train.loop import fit

    class _Fac:
        mesh = None
        model = None

    with pytest.raises(ValueError, match="needs factory.mesh"):
        fit(_Fac(), lambda e: iter(()), None, batch_size=4,
            num_epochs=1, log_dir=str(tmp_path))


def test_points_mesh_composed():
    from sph3d_gcn_tpu.train.cli import points_mesh

    mesh, pa, da = points_mesh(4, 2)
    assert mesh.axis_names == ("data", "points")
    assert mesh.devices.shape == (2, 4)
    assert (pa, da) == ("points", "data")

    mesh1, pa1, da1 = points_mesh(4, None)
    assert mesh1.axis_names == ("points",)
    assert (pa1, da1) == ("points", None)

    assert points_mesh(None, 4) == (None, None, None)

    with pytest.raises(ValueError, match="devices"):
        points_mesh(8, 2)  # 16 > the 8-device pool
