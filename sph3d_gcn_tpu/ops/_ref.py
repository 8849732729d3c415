"""Pure-NumPy ground-truth implementations of the six core operators.

These transliterate the *semantics* of the reference CUDA kernels
(`/root/reference/tf_ops/*/tf_*_gpu.cu`) as slow, obviously-correct loops.
They exist only as the test oracle for the TPU implementations — the
reference itself ships no tests (SURVEY.md §4), so this file *is* the
contract. Never import from here in library code.
"""

from __future__ import annotations

import numpy as np

M_EPS = 1.01e-3


def sphere_neighbor(database, query, radius, nn_sample):
    """ref tf_nnquery_gpu.cu:15-66 (sphere mode, incl. radius growth)."""
    database = np.asarray(database, np.float32)[..., :3]
    query = np.asarray(query, np.float32)[..., :3]
    b, n, _ = database.shape
    m = query.shape[1]
    k = nn_sample
    nn_index = np.zeros((b, m, k), np.int32)
    nn_count = np.zeros((b, m), np.int32)
    nn_dist = np.zeros((b, m, k), np.float32)
    for i in range(b):
        for j in range(m):
            r = np.float32(radius)
            s = 0
            while s == 0:
                s = 0
                for kk in range(n):
                    delta = database[i, kk] - query[i, j]
                    d3 = np.float32(np.sqrt(np.float32(np.dot(delta, delta))))
                    if d3 < r and abs(d3 - r) > 1e-6:
                        if s < k:
                            nn_index[i, j, s] = kk
                            nn_dist[i, j, s] = np.sqrt(d3)  # sqrt-space quirk
                        s += 1
                r = np.float32(r + 0.05)
            nn_count[i, j] = min(s, k)
    return nn_index, nn_count, nn_dist


def cube_neighbor(database, query, length, nn_sample, gridsize):
    """ref tf_nnquery_gpu.cu:75-108 (cube mode)."""
    database = np.asarray(database, np.float32)[..., :3]
    query = np.asarray(query, np.float32)[..., :3]
    b, n, _ = database.shape
    m = query.shape[1]
    k = nn_sample
    nn_index = np.zeros((b, m, k), np.int32)
    nn_bin = np.zeros((b, m, k), np.int32)
    nn_count = np.zeros((b, m), np.int32)
    half = length / 2.0
    cell = length / gridsize
    for i in range(b):
        for j in range(m):
            s = 0
            for kk in range(n):
                delta = database[i, kk] - query[i, j]
                if (
                    abs(delta[0]) < half
                    and abs(delta[1]) < half
                    and abs(delta[2]) < half
                    and s < k
                ):
                    x_id = int((delta[0] + half) / cell)
                    y_id = int((delta[1] + half) / cell)
                    z_id = int((delta[2] + half) / cell)
                    nn_index[i, j, s] = kk
                    nn_bin[i, j, s] = x_id * gridsize * gridsize + y_id * gridsize + z_id
                    s += 1
            nn_count[i, j] = s
    return nn_index, nn_bin, nn_count


def farthest_point_sample(npoint, database):
    """ref tf_sample_gpu.cu:7-78 (seed at 0, greedy max-min, ties -> first)."""
    database = np.asarray(database, np.float32)[..., :3]
    b, n, _ = database.shape
    out = np.zeros((b, npoint), np.int32)
    for i in range(b):
        temp = np.full((n,), 1e38, np.float32)
        old = 0
        out[i, 0] = 0
        for j in range(1, npoint):
            delta = database[i] - database[i, old]
            d = np.sum(delta * delta, axis=-1)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[i, j] = old
    return out


def spherical_kernel(database, query, nn_index, nn_count, nn_dist, radius, kernel):
    """ref tf_buildkernel_gpu.cu:20-78."""
    database = np.asarray(database, np.float32)[..., :3]
    query = np.asarray(query, np.float32)[..., :3]
    n_bins, p_bins, q_bins = kernel
    b, m, k = nn_index.shape
    filt = np.zeros((b, m, k), np.int32)
    for i in range(b):
        for j in range(m):
            for kk in range(int(nn_count[i, j])):
                pt_id = nn_index[i, j, kk]
                delta = database[i, pt_id] - query[i, j]
                dist = nn_dist[i, j, kk]
                dist2d = np.sqrt(delta[0] ** 2 + delta[1] ** 2)
                filt[i, j, kk] = 0
                if dist > M_EPS and abs(dist - M_EPS) > 1e-6:
                    theta = np.arctan2(delta[1], delta[0])
                    phi = np.arctan2(delta[2], dist2d)
                    theta = theta if theta < np.pi else -np.pi
                    theta = theta if theta > -np.pi else -np.pi
                    theta += np.pi
                    phi = min(phi, np.pi / 2)
                    phi = max(phi, -np.pi / 2)
                    phi += np.pi / 2
                    alpha = theta * n_bins / 2 / np.pi
                    beta = phi * p_bins / np.pi
                    gamma = dist * q_bins / (radius + 1e-6)
                    n_id = min(n_bins - 1, int(alpha))
                    p_id = min(p_bins - 1, int(beta))
                    q_id = min(q_bins - 1, int(gamma))
                    filt[i, j, kk] = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1
    return filt


def depthwise_conv3d(inputs, filt, nn_index, nn_count, bin_index):
    """ref tf_conv3d_gpu.cu:7-29 (forward)."""
    inputs = np.asarray(inputs, np.float32)
    filt = np.asarray(filt, np.float32)
    b, n, c = inputs.shape
    f_bins, _, r = filt.shape
    m, k = nn_index.shape[1], nn_index.shape[2]
    out = np.zeros((b, m, c * r), np.float32)
    for i in range(b):
        for mm in range(m):
            cnt = int(nn_count[i, mm])
            for kk in range(cnt):
                nn = nn_index[i, mm, kk]
                f = bin_index[i, mm, kk]
                for cout in range(c * r):
                    cin = cout // r
                    out[i, mm, cout] += (
                        inputs[i, nn, cin] * filt[f, cin, cout % r] / cnt
                    )
    return out


def depthwise_conv3d_grads(inputs, filt, nn_index, nn_count, bin_index, grad_out):
    """ref tf_conv3d_gpu.cu:33-101 (input and filter gradients)."""
    inputs = np.asarray(inputs, np.float32)
    filt = np.asarray(filt, np.float32)
    grad_out = np.asarray(grad_out, np.float32)
    b, n, c = inputs.shape
    f_bins, _, r = filt.shape
    m, k = nn_index.shape[1], nn_index.shape[2]
    g_in = np.zeros_like(inputs)
    g_filt = np.zeros_like(filt)
    for i in range(b):
        for mm in range(m):
            cnt = int(nn_count[i, mm])
            for kk in range(cnt):
                nn = nn_index[i, mm, kk]
                f = bin_index[i, mm, kk]
                for cout in range(c * r):
                    cin = cout // r
                    g_in[i, nn, cin] += (
                        grad_out[i, mm, cout] * filt[f, cin, cout % r] / cnt
                    )
                    g_filt[f, cin, cout % r] += (
                        grad_out[i, mm, cout] * inputs[i, nn, cin] / cnt
                    )
    return g_in, g_filt


def max_pool3d(inputs, nn_index, nn_count):
    """ref tf_pool3d_gpu.cu:5-34."""
    inputs = np.asarray(inputs, np.float32)
    b, n, c = inputs.shape
    m = nn_index.shape[1]
    out = np.zeros((b, m, c), np.float32)
    max_index = np.zeros((b, m, c), np.int32)
    for i in range(b):
        for mm in range(m):
            cnt = int(nn_count[i, mm])
            for cc in range(c):
                best = None
                best_n = 0
                for kk in range(cnt):
                    nn = nn_index[i, mm, kk]
                    v = inputs[i, nn, cc]
                    if best is None or v > best:
                        best, best_n = v, nn
                if best is not None:
                    out[i, mm, cc] = best
                    max_index[i, mm, cc] = best_n
    return out, max_index


def avg_pool3d(inputs, nn_index, nn_count):
    """ref tf_pool3d_gpu.cu:53-70."""
    inputs = np.asarray(inputs, np.float32)
    b, n, c = inputs.shape
    m = nn_index.shape[1]
    out = np.zeros((b, m, c), np.float32)
    for i in range(b):
        for mm in range(m):
            cnt = int(nn_count[i, mm])
            for kk in range(cnt):
                out[i, mm] += inputs[i, nn_index[i, mm, kk]] / cnt
    return out


def mean_interpolate(inputs, nn_index, nn_count):
    """ref tf_unpool3d_gpu.cu:5-22."""
    inputs = np.asarray(inputs, np.float32)
    b, m, c = inputs.shape
    n = nn_index.shape[1]
    out = np.zeros((b, n, c), np.float32)
    for i in range(b):
        for nn in range(n):
            cnt = int(nn_count[i, nn])
            for kk in range(cnt):
                out[i, nn] += inputs[i, nn_index[i, nn, kk]] / cnt
    return out


def weighted_interpolate(inputs, weight, nn_index, nn_count):
    """ref tf_unpool3d_gpu.cu:45-63."""
    inputs = np.asarray(inputs, np.float32)
    weight = np.asarray(weight, np.float32)
    b, m, c = inputs.shape
    n = nn_index.shape[1]
    out = np.zeros((b, n, c), np.float32)
    for i in range(b):
        for nn in range(n):
            cnt = int(nn_count[i, nn])
            for kk in range(cnt):
                out[i, nn] += inputs[i, nn_index[i, nn, kk]] * weight[i, nn, kk]
    return out
