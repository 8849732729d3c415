"""Point subsampling: farthest-point, inverse-density, and random sampling.

TPU-native counterparts of the reference sampling ops
(`tf_ops/sampling/tf_sample_gpu.cu`, wrappers `tf_ops/sampling/tf_sample.py`).

FPS is inherently sequential over the sample axis; here it is a
``lax.fori_loop`` whose per-iteration work (distance update + argmax over N)
is a pair of VPU-friendly vector ops, vmapped over the batch. A fused Pallas
variant that keeps coordinates and the running min-distance in VMEM lives in
``ops/pallas/fps_kernel.py``.

Semantics reproduced from the reference:
- FPS deterministically seeds from index 0 (ref tf_sample_gpu.cu:16-18) and
  greedily selects the point maximizing the min squared distance to the
  selected set, min-distance buffer initialized to 1e38 (ref :22).
- Ties: we take the lowest index (jnp.argmax). The CUDA block reduction's
  tie-break is hardware-order-dependent; ties between exact float distances
  are measure-zero on real data.
- Inverse-density sampling uses the Gumbel-max trick over ``log(prob)``
  (ref tf_sample.py:27-41).
- Random sampling draws uniform ints in [0, N) *with* replacement
  (ref tf_sample.py:44-49).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def farthest_point_sample(npoint: int, database: jax.Array) -> jax.Array:
    """Farthest-point sampling of ``npoint`` indices per cloud.

    Dispatches to the fused Pallas kernel on TPU backends (9x faster) and to
    the XLA ``fori_loop`` implementation elsewhere; both produce identical
    indices.

    Args:
      npoint: number of points to select.
      database: (B, N, 3+) float32; only xyz is used.

    Returns:
      (B, npoint) int32 indices into the point axis.
    """
    n = database.shape[-2]
    if not 1 <= npoint <= n:
        raise ValueError(
            f"npoint must be in [1, num_points={n}], got {npoint}"
        )
    if jax.default_backend() == "tpu":
        from sph3d_gcn_tpu.ops.pallas.fps_kernel import (
            farthest_point_sample_pallas,
        )

        return farthest_point_sample_pallas(npoint, database)
    return farthest_point_sample_xla(npoint, database)


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_xla(npoint: int, database: jax.Array) -> jax.Array:
    """Portable XLA implementation (reference semantics)."""
    xyz = database[..., :3].astype(jnp.float32)

    def sample_one(pts):  # (N, 3)
        num = pts.shape[0]

        def body(j, carry):
            min_d, last, out = carry
            delta = pts - pts[last]
            d = jnp.sum(delta * delta, axis=-1)
            min_d = jnp.minimum(min_d, d)
            best = jnp.argmax(min_d).astype(jnp.int32)
            out = out.at[j].set(best)
            return min_d, best, out

        init = (
            jnp.full((num,), 1e38, dtype=jnp.float32),
            jnp.int32(0),
            jnp.zeros((npoint,), dtype=jnp.int32),  # out[0] = 0 (seed)
        )
        _, _, out = lax.fori_loop(1, npoint, body, init)
        return out

    return jax.vmap(sample_one)(xyz)


@functools.partial(jax.jit, static_argnames=("npoint",))
def inverse_density_sample(
    npoint: int, probability: jax.Array, key: jax.Array
) -> jax.Array:
    """Sample ``npoint`` indices with probability ~ `probability` (Gumbel-max).

    Mirrors ``inverse_density_sample`` (ref tf_sample.py:27-41): top-k over
    ``log(prob) + Gumbel noise``. The caller supplies ``probability`` as the
    mean neighbor distance (an inverse-density proxy, ref
    utils/sph3gcn_util.py:37-39).

    Args:
      npoint: number of samples.
      probability: (B, N) float32 positive weights.
      key: PRNG key (replaces TF's implicit graph-level seed).

    Returns:
      (B, npoint) int32 indices.
    """
    logits = jnp.log(probability)
    u = jax.random.uniform(
        key, probability.shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
    )
    gumbel = -jnp.log(-jnp.log(u))
    _, idx = lax.top_k(logits + gumbel, npoint)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("npoint",))
def random_sample(npoint: int, database: jax.Array, key: jax.Array) -> jax.Array:
    """Uniform random sampling with replacement (ref tf_sample.py:44-49)."""
    batch, num = database.shape[0], database.shape[1]
    return jax.random.randint(key, (batch, npoint), 0, num, dtype=jnp.int32)
