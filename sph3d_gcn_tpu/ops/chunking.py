"""Output-axis chunking for edge ops (pool/unpool/conv).

Bounds the (B, T, K, C) gathered-edge transients — and, more importantly,
their ~3x larger autodiff counterparts — by processing the output point
axis in unrolled Python chunks. Unrolled loops (not lax.map) keep every
gather at the top level, where XLA's TPU gather runs ~100x faster than
inside loop bodies (see CLAUDE.md).
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

# Byte budget for one (B, T, K, C) f32 edge chunk (backward roughly 3x).
_EDGE_CHUNK_BYTES = 32 * 1024 * 1024


def chunk_size(batch: int, k: int, channels: int, num_out: int) -> int:
    t = _EDGE_CHUNK_BYTES // max(1, 4 * batch * k * channels)
    t = max(8, min(num_out, t))
    if t > 8:
        t = (t // 8) * 8
    return t


def map_output_chunks(
    fn: Callable[..., jax.Array],
    num_out: int,
    chunk: int,
    *arrays: jax.Array,
) -> jax.Array:
    """Apply ``fn(*chunked_arrays)`` over slices of axis 1 and concatenate.

    All ``arrays`` are sliced on axis 1 (padded to a chunk multiple);
    ``fn`` must return (B, T, ...) chunks.
    """
    num_chunks = -(-num_out // chunk)
    if num_chunks == 1:
        return fn(*arrays)
    pad = num_chunks * chunk - num_out
    padded = [
        jnp.pad(a, [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)) for a in arrays
    ]
    outs = []
    for c in range(num_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        outs.append(fn(*[a[:, sl] for a in padded]))
    return jnp.concatenate(outs, axis=1)[:, :num_out]
