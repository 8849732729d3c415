"""Pallas TPU kernels for the hot ops (used automatically on TPU backends;
the pure-XLA formulations in ``sph3d_gcn_tpu.ops`` remain the reference
implementations and the CPU path)."""
