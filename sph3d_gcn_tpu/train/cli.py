"""Shared CLI plumbing for the training/eval drivers.

The reference drivers are single-GPU with a ``--gpu`` device picker
(ref modelnet40_cls/train_modelnet.py:26,152); the TPU-native drivers take
``--num_devices`` and run batch data parallelism over an ICI mesh
(`sph3d_gcn_tpu.parallel`). On this platform backend selection MUST go
through jax.config before any backend touch — env vars are read too early
(the host sitecustomize imports jax at interpreter startup).
"""

from __future__ import annotations


def configure_backend(platform: str | None, num_devices: int | None) -> None:
    """Apply --platform / --num_devices before any backend is initialized.

    With ``platform='cpu'`` and ``num_devices > 1`` a virtual CPU device
    pool is created (the multi-chip emulation used by tests and the driver
    dryrun; real TPU slices expose their devices without help).
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and num_devices and num_devices > 1:
            jax.config.update("jax_num_cpu_devices", num_devices)


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
