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

    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and num_devices and num_devices > 1:
            jax.config.update("jax_num_cpu_devices", num_devices)
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
