"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests use JAX's
multi-CPU-device emulation (SURVEY.md §4 point 4). The environment's
sitecustomize imports jax at interpreter startup (before conftest), so env
vars are too late — use jax.config, which works as long as no backend has
been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
