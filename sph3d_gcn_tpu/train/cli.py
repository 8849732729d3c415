"""Shared CLI plumbing for the training/eval drivers.

The reference drivers are single-GPU with a ``--gpu`` device picker
(ref modelnet40_cls/train_modelnet.py:26,152); the TPU-native drivers take
``--num_devices`` and run batch data parallelism over an ICI mesh
(`sph3d_gcn_tpu.parallel`). On this platform backend selection MUST go
through jax.config before any backend touch — env vars are read too early
(the host sitecustomize imports jax at interpreter startup).
"""

from __future__ import annotations


def configure_backend(
    platform: str | None,
    num_devices: int | None,
    multihost: bool = False,
    point_devices: int | None = None,
    coordinator_address: str | None = None,
    process_id: int | None = None,
    num_processes: int | None = None,
) -> None:
    """Apply --platform / --num_devices before any backend is initialized.

    With ``platform='cpu'`` and ``num_devices > 1`` a virtual CPU device
    pool is created (the multi-chip emulation used by tests and the driver
    dryrun; real TPU slices expose their devices without help).

    ``multihost=True`` calls ``jax.distributed.initialize`` so every host
    of a multi-host TPU slice (or a DCN-connected multi-slice job) joins
    one JAX process group before mesh construction — the TPU-native
    counterpart of a NCCL/MPI launcher (the reference has none, SURVEY.md
    §2.7). On Cloud TPU all coordination arguments are auto-detected from
    the TPU metadata; pass them explicitly elsewhere. Single-process
    behavior is unchanged when ``multihost`` is False.
    """
    import jax

    # composed dp x sp needs the PRODUCT: the ('data','points') mesh is
    # num_devices x point_devices (points_mesh)
    pool = (num_devices or 1) * (point_devices or 1)
    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and pool > 1:
            jax.config.update("jax_num_cpu_devices", pool)
    if multihost:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if process_id is not None:
            kwargs["process_id"] = process_id
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        jax.distributed.initialize(**kwargs)


def add_backend_args(parser) -> None:
    """Attach the shared backend flags to an argparse parser."""
    parser.add_argument(
        "--platform", default=None,
        help="force a jax backend (e.g. cpu); env vars are read too early "
             "on this platform — only jax.config works",
    )
    parser.add_argument(
        "--num_devices", type=int, default=None,
        help="data-parallel device count (default: all local devices)",
    )
    parser.add_argument(
        "--point_devices", type=int, default=None,
        help="point-axis (spatial) sharding device count: the model "
             "shards each cloud's rows over a ('points',) mesh with "
             "ICI halo exchanges (dense mode only; parallel/spatial.py)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize() before mesh construction "
             "(multi-host TPU slices / multi-slice DCN jobs)",
    )
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--num_processes", type=int, default=None)


def data_mesh(num_devices: int | None, batch_size: int):
    """Build the data-parallel mesh the step factories consume.

    Args:
      num_devices: devices to use; None = all available (mesh only when >1).
      batch_size: global batch size — must split evenly across devices.

    Returns:
      a ('data', 'model') Mesh, or None for single-device runs.
    """
    import jax

    from sph3d_gcn_tpu.parallel import make_mesh

    n = num_devices or jax.device_count()
    if n <= 1:
        return None
    if batch_size % n:
        raise ValueError(
            f"batch_size {batch_size} does not split over {n} devices"
        )
    return make_mesh(jax.devices()[:n])


POINT_AXIS = "points"


def points_mesh(point_devices: int | None, num_devices: int | None = None):
    """Build the mesh for point-axis sharding, or None.

    ``point_devices`` alone gives a 1D ('points',) mesh: the model shards
    each cloud's rows with ICI halo exchanges (parallel/spatial.py).
    Together with ``num_devices > 1`` it gives the composed dp x sp
    ('data', 'points') 2D mesh — batch items shard over 'data', each
    item's rows over 'points' (the composition the driver dryrun and
    tests/test_spatial.py certify).

    Returns (mesh, point_axis, data_axis) — axis names to pass to the
    step factory and `SPH3DConfig`, or (None, None, None) when
    ``point_devices`` is not set (plain dp uses `data_mesh` instead).
    """
    import jax
    import numpy as np

    from jax.sharding import Mesh

    if not point_devices or point_devices <= 1:
        return None, None, None
    dd = num_devices if num_devices and num_devices > 1 else 1
    need = dd * point_devices
    devices = jax.devices()
    if len(devices) < need:
        raise ValueError(
            f"--num_devices {dd} x --point_devices {point_devices} = "
            f"{need} > {len(devices)} devices"
        )
    if dd == 1:
        return (
            Mesh(np.array(devices[:point_devices]), (POINT_AXIS,)),
            POINT_AXIS,
            None,
        )
    grid = np.array(devices[:need]).reshape(dd, point_devices)
    return Mesh(grid, ("data", POINT_AXIS)), POINT_AXIS, "data"
