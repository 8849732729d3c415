"""Evaluation protocols: multi-vote classification and coverage-voting
segmentation.

- Classification: ``num_votes`` forward passes per batch — vote 0 on the raw
  cloud, later votes on augmented copies — logits summed before argmax
  (ref modelnet40_cls/evaluate_modelnet.py:181-198, augment at :71-79).
- Segmentation blocks: random-resample each variable-size block to the fixed
  model size until every *inner* point has been sampled at least once,
  accumulating logits per original block point
  (ref s3dis_seg/evaluate_s3dis_with_overlap.py:270-302; same scheme in
  shapenet/scannet/ruemonge eval scripts).
"""

from __future__ import annotations

import warnings
from collections.abc import Callable

import numpy as np

from sph3d_gcn_tpu.data import augment as aug


def checked_eval_step(factory):
    """Wrap ``factory.eval_step()`` with dense-certificate enforcement.

    Returns ``(state, batch) -> metrics``. When the config runs the dense
    windowed engine and a batch's ``dense_ok`` certificate fails (window
    coverage violated — the graph may be wrong, see ops/dense.py), the
    batch is transparently re-run through the exact classic engine
    (``StepFactory.classic_fallback``), so evaluation results are never
    silently wrong. Non-dense configs pay nothing (one host bool check).
    """
    step = factory.eval_step()
    dense = bool(getattr(factory.model.config, "dense_graph", False))
    fb: dict = {}

    def run(state, batch):
        metrics = step(state, batch)
        if dense and not bool(metrics["dense_ok"]):
            # halo-only violation under point sharding: retry SHARDED with
            # 2x halos first (no single chip must hold the whole cloud;
            # see StepFactory.classic_fallback's memory bound)
            if factory.point_axis is not None and not bool(
                metrics.get("halo_ok", True)
            ):
                if "halo" not in fb:
                    fb["halo"] = factory.halo_widened().eval_step()
                metrics = fb["halo"](state, batch)
                if bool(metrics["dense_ok"]):
                    return metrics
            if "step" not in fb:
                print(
                    "dense window coverage violated at eval: compiling the "
                    "classic-engine fallback (exact per-edge ops)",
                    flush=True,
                )
                fb["step"] = factory.classic_fallback().eval_step()
            metrics = fb["step"](state, batch)
        return metrics

    return run


def vote_augment(batch_xyz: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """The classification vote augmentation
    (ref evaluate_modelnet.py:71-79)."""
    x = aug.rotate_point_cloud(batch_xyz, rng)
    x = aug.rotate_perturbation_point_cloud(x, rng)
    x = aug.random_scale_point_cloud(x, rng)
    x = aug.shift_point_cloud(x, rng)
    return x


def vote_classify(
    forward: Callable[[np.ndarray], np.ndarray],
    batch_xyz: np.ndarray,
    num_votes: int = 12,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Sum logits over augmented votes (ref evaluate_modelnet.py:181-198).

    Args:
      forward: (B, N, 3) -> (B, num_cls) logits.
      batch_xyz: raw eval batch.
      num_votes: vote count (vote 0 is un-augmented).
      rng: PRNG for votes >= 1.

    Returns:
      (B, num_cls) summed logits.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    total = None
    for vote in range(num_votes):
        x = batch_xyz if vote == 0 else vote_augment(batch_xyz.copy(), rng)
        logits = np.asarray(forward(x))
        total = logits if total is None else total + logits
    return total


def resample_block(
    num_points: int, target: int, rng: np.random.Generator
) -> np.ndarray:
    """The reference's replace=True/False resampling rule
    (ref train_s3dis.py:343-346, evaluate_s3dis_with_overlap.py:274-277)."""
    if num_points < target:
        return rng.choice(num_points, target, replace=True)
    return rng.choice(num_points, target, replace=False)


def coverage_eval_block(
    forward: Callable[[np.ndarray], np.ndarray],
    block_points: np.ndarray,
    inner: np.ndarray,
    num_model_points: int,
    rng: np.random.Generator | None = None,
    max_rounds: int | None = None,
    min_count: int = 1,
    augment_fn: Callable[[np.ndarray, np.random.Generator], np.ndarray]
    | None = None,
) -> np.ndarray:
    """Accumulate logits for ONE block until every inner point is covered.

    Args:
      forward: (1, num_model_points, D) -> (1, num_model_points, C) logits.
      block_points: (P, D) stored block points (inner + context).
      inner: (P,) inner mask.
      num_model_points: the model's fixed point count (e.g. 8192).
      rng: PRNG for resampling.
      max_rounds: optional safety bound. The default (None) matches the
        reference's unbounded loop (ref evaluate_s3dis_with_overlap.py:270);
        a finite bound warns if it exhausts with uncovered inner points.
      min_count: required samples per inner point. The scene evals use 1
        (ref evaluate_s3dis_with_overlap.py:286); the ShapeNet eval requires
        > 10 (ref evaluate_shapenet.py:239).
      augment_fn: optional (B, N, 3)-xyz augmentation; when given, every
        resample runs a second, augmented pass whose logits are accumulated
        at the same positions (ref evaluate_shapenet.py:245-247).

    Returns:
      (P, C) accumulated logits per original block point.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    num = block_points.shape[0]
    inner_idx = np.asarray(inner) == 1
    inner_size = int(inner_idx.sum())
    sample_count = np.zeros(num, np.int64)
    pred_sum = None
    rounds_done = 0
    while max_rounds is None or rounds_done < max_rounds:
        rounds_done += 1
        sel = resample_block(num, num_model_points, rng)
        chunk = block_points[None, sel]
        logits = np.asarray(forward(chunk))[0]
        if pred_sum is None:
            pred_sum = np.zeros((num, logits.shape[-1]), np.float32)
        np.add.at(pred_sum, sel, logits)
        if augment_fn is not None:
            aug = chunk.copy()
            aug[..., 0:3] = augment_fn(aug[..., 0:3], rng)
            np.add.at(pred_sum, sel, np.asarray(forward(aug))[0])
        sample_count[sel] += 1
        if int((sample_count[inner_idx] >= min_count).sum()) >= inner_size:
            break
    else:
        uncovered = int((sample_count[inner_idx] < min_count).sum())
        warnings.warn(
            f"coverage_eval_block: max_rounds={max_rounds} exhausted with "
            f"{uncovered}/{inner_size} inner points uncovered; logits are "
            "partial (the reference loops unboundedly)",
            stacklevel=2,
        )
    return pred_sum


def coverage_eval_blocks(
    forward: Callable[[np.ndarray, list[int]], np.ndarray],
    blocks: list[tuple[np.ndarray, np.ndarray]],
    num_model_points: int,
    batch_size: int,
    rng: np.random.Generator | None = None,
    max_rounds: int | None = None,
    min_count: int = 1,
    augment_fn: Callable[[np.ndarray, np.random.Generator], np.ndarray]
    | None = None,
) -> list[np.ndarray]:
    """Coverage-vote MANY blocks with full batches (no padding waste).

    The reference evaluates one block per session call but batches its
    resamples (ref evaluate_s3dis_with_overlap.py:270-302); padding a
    single block to the batch and discarding the rest — as a naive port
    does — wastes batch_size-1 forwards per round. Here each forward mixes
    resamples from up to ``batch_size`` DIFFERENT still-uncovered blocks,
    so device utilization stays full until the final partial batch.

    Args:
      forward: (points (B, N, D), block_ids list[int]) -> (B, N, C) logits;
        ``block_ids`` lets callers attach per-block side inputs (e.g. the
        ShapeNet one-hot category label). Entries beyond the real blocks in
        a padded final batch repeat the first id.
      blocks: per block, (points (P, D), inner (P,) mask).
      num_model_points: the model's fixed point count.
      batch_size: the jitted step's batch size.
      rng, max_rounds, min_count, augment_fn: as
        :func:`coverage_eval_block`.

    Returns:
      Per block, (P, C) accumulated logits (aligned with ``blocks``).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    n = len(blocks)
    sums: list[np.ndarray | None] = [None] * n
    counts = [np.zeros(len(pts), np.int64) for pts, _ in blocks]
    rounds = np.zeros(n, np.int64)
    need = list(range(n))

    def covered(i):
        inner_idx = np.asarray(blocks[i][1]) == 1
        return bool((counts[i][inner_idx] >= min_count).all())

    while need:
        take = need[:batch_size]
        sels = [
            resample_block(len(blocks[i][0]), num_model_points, rng)
            for i in take
        ]
        chunk = np.stack(
            [blocks[i][0][sel] for i, sel in zip(take, sels)]
        ).astype(np.float32)
        real = len(take)
        if real < batch_size:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:1], batch_size - real, axis=0)]
            )
        ids = take + [take[0]] * (batch_size - real)
        passes = [np.asarray(forward(chunk, ids))[:real]]
        if augment_fn is not None:
            aug = chunk.copy()
            aug[..., 0:3] = augment_fn(aug[..., 0:3], rng)
            passes.append(np.asarray(forward(aug, ids))[:real])
        for j, (i, sel) in enumerate(zip(take, sels)):
            if sums[i] is None:
                sums[i] = np.zeros(
                    (len(blocks[i][0]), passes[0].shape[-1]), np.float32
                )
            for logits in passes:
                np.add.at(sums[i], sel, logits[j])
            counts[i][sel] += 1
            rounds[i] += 1
        done_uncovered = [
            i for i in take
            if max_rounds is not None
            and rounds[i] >= max_rounds
            and not covered(i)
        ]
        for i in done_uncovered:
            inner_idx = np.asarray(blocks[i][1]) == 1
            uncovered = int((counts[i][inner_idx] < min_count).sum())
            warnings.warn(
                f"coverage_eval_blocks: block {i} exhausted "
                f"max_rounds={max_rounds} with {uncovered}/"
                f"{int(inner_idx.sum())} inner points uncovered; logits are "
                "partial (the reference loops unboundedly)",
                stacklevel=2,
            )
        need = [
            i for i in need
            if not (
                i in take
                and (
                    covered(i)
                    or (max_rounds is not None and rounds[i] >= max_rounds)
                )
            )
        ]
    return sums


def shapenet_eval_augment(
    batch_xyz: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """The ShapeNet eval-vote augmentation (ref evaluate_shapenet.py:86-94)."""
    x = aug.rotate_perturbation_point_cloud(batch_xyz, rng)
    x = aug.random_scale_point_cloud(x, rng)
    x = aug.shift_point_cloud(x, rng)
    x = aug.jitter_point_cloud(x, rng)
    return x
