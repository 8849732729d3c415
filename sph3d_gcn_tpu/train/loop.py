"""Epoch-driven training loop with logging and checkpoint/resume.

Replaces the reference's per-dataset `train_*.py` session loops
(e.g. ref modelnet40_cls/train_modelnet.py:241-311): per-epoch train +
eval passes, per-50-batch loss/accuracy logs, per-batch wall-clock, per-epoch
checkpoints with auto-resume.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator
from datetime import datetime
from typing import Any

import jax
import numpy as np

from sph3d_gcn_tpu.data.datasets import pad_batch
from sph3d_gcn_tpu.train.checkpoint import Checkpointer
from sph3d_gcn_tpu.train.steps import StepFactory


class Logger:
    """Tee to stdout and a log file (ref train_modelnet.py:56,68-71), plus a
    metrics.jsonl scalar stream (the TF-summary equivalent,
    ref train_modelnet.py:167-178,207-209).

    Multi-process runs log from process 0 only (every process still computes
    the same replicated metrics; writing them P times from P hosts would
    interleave garbage into one shared log_dir)."""

    def __init__(self, log_dir: str, name: str = "log_train.txt"):
        self._primary = jax.process_index() == 0
        if not self._primary:
            self._f = self._metrics = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, name), "a")
        self._metrics = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log(self, msg: str) -> None:
        if not self._primary:
            return
        self._f.write(msg + "\n")
        self._f.flush()
        print(msg, flush=True)

    def scalars(self, **kwargs) -> None:
        """Append one JSON line of scalar metrics."""
        if not self._primary:
            return
        self._metrics.write(json.dumps(kwargs) + "\n")
        self._metrics.flush()

    def close(self) -> None:
        if not self._primary:
            return
        self._f.close()
        self._metrics.close()


def _local_rows(x) -> np.ndarray:
    """Host view of a (possibly multi-process global) batch-sharded array.

    Single-process: the whole array. Multi-process: the rows this host's
    devices hold — which are exactly the rows its loader contributed via
    ``shard_batch`` (make_array_from_process_local_data keeps process-local
    data on process-local devices), so pairing them with the local labels
    is exact. Shards are ordered by their batch-axis offset."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _batch_accuracy(logits: np.ndarray, batch: dict, bsize: int) -> tuple[int, int]:
    if logits.ndim == 2:  # classification
        pred = logits[:bsize].argmax(-1)
        return int((pred == batch["label"][:bsize]).sum()), bsize
    pred = logits[:bsize].argmax(-1)
    label = batch["label"][:bsize]
    if "inner_label" in batch:
        mask = batch["inner_label"][:bsize] > 0
        return int(((pred == label) & mask).sum()), int(mask.sum())
    return int((pred == label).sum()), pred.size


def fit(
    factory: StepFactory,
    train_batches: Callable[[int], Iterator[dict[str, np.ndarray]]],
    eval_batches: Callable[[], Iterator[dict[str, np.ndarray]]] | None,
    batch_size: int,
    num_epochs: int,
    log_dir: str,
    seed: int = 0,
    log_every: int = 50,
    on_dense_violation: str = "fallback",
    bn_prime_steps: int = 0,
) -> Any:
    """Train for ``num_epochs``, checkpointing per epoch, resuming from the
    latest checkpoint in ``log_dir`` if present.

    Args:
      factory: configured StepFactory.
      train_batches: epoch -> iterator of batches (host numpy dicts).
      eval_batches: optional () -> iterator for the per-epoch eval pass.
      batch_size: fixed compile-time batch size (short batches get padded).
      num_epochs: total epochs (resume-aware).
      log_dir: log + checkpoint directory.
      bn_prime_steps: when > 0, replace the BN running statistics with the
        average of per-batch statistics over this many fresh training
        batches before each eval pass (``StepFactory.prime_step``). Cures
        the momentum-0.99 eval lag on short runs (BASELINE.md "Eval-mode
        note"); 0 keeps the reference's pure-EMA behavior.
      on_dense_violation: what to do when a dense-engine step reports
        ``dense_ok=False`` (window coverage violated — the graph may be
        wrong; see ops/dense.py). 'fallback' (default) re-runs the batch
        from the pre-step state through the exact classic engine
        (``StepFactory.classic_fallback``); 'raise' aborts; 'warn' logs
        and keeps the (possibly wrong) step. Irrelevant for non-dense
        configs, where dense_ok is constant True.

    Returns:
      final TrainState.
    """
    if on_dense_violation not in ("fallback", "raise", "warn"):
        raise ValueError(
            f"on_dense_violation must be 'fallback'|'raise'|'warn', "
            f"got {on_dense_violation!r}"
        )
    # Multi-host data path: each process's ``train_batches`` yields its
    # LOCAL sub-batches (built from a `process_shard_files` file shard);
    # `shard_batch` assembles the global batch-sharded array from the
    # per-process pieces. ``batch_size`` stays the GLOBAL batch size.
    # Single-process (`n_proc == 1`, the only case testable here — no
    # multi-host hardware) is bit-identical to the direct path: batches
    # go straight to the jitted step as before.
    n_proc = jax.process_count()
    if n_proc > 1:
        if factory.mesh is None:
            raise ValueError("multi-process fit() needs factory.mesh")
        if batch_size % n_proc:
            raise ValueError(
                f"global batch {batch_size} does not split over "
                f"{n_proc} processes"
            )
    local_bs = batch_size // n_proc

    logger = Logger(log_dir)
    ckpt = Checkpointer(log_dir)
    rng = jax.random.key(seed)

    def _stage(batch):
        """Pad the host batch to the fixed local size and (multi-process
        only) assemble the global device array. Returns (device_batch,
        host_batch, real_local_rows)."""
        batch, bsize = pad_batch(batch, local_bs)
        if n_proc == 1:
            return batch, batch, bsize
        from sph3d_gcn_tpu.parallel.mesh import shard_batch

        return shard_batch(factory.mesh, batch), batch, bsize

    dense_mode = bool(getattr(factory.model.config, "dense_graph", False))
    use_fallback = dense_mode and on_dense_violation == "fallback"
    fallback: dict[str, Any] = {}  # lazily compiled classic steps

    def _fallback_step(kind: str):
        if "factory" not in fallback:
            fallback["factory"] = factory.classic_fallback()
            logger.log(
                "dense window coverage violated: compiling the classic-"
                "engine fallback step (exact per-edge ops)"
            )
        if kind not in fallback:
            fb = fallback["factory"]
            fallback[kind] = (
                fb.train_step(donate=False) if kind == "train" else fb.eval_step()
            )
        return fallback[kind]

    def _halo_step(kind: str):
        """Sharded retry with 2x inter-level halos for halo-only
        violations (point sharding): stays sharded, so the cloud never
        has to fit one chip (see StepFactory.classic_fallback's memory
        bound)."""
        if "halo_factory" not in fallback:
            fallback["halo_factory"] = factory.halo_widened()
            logger.log(
                "halo coverage violated: compiling the 2x-halo sharded "
                "retry step"
            )
        key = f"halo_{kind}"
        if key not in fallback:
            hf = fallback["halo_factory"]
            fallback[key] = (
                hf.train_step(donate=False) if kind == "train"
                else hf.eval_step()
            )
        return fallback[key]

    # Init from the first training batch of epoch 0. Multi-process: every
    # host inits from its own local batch — only SHAPES reach the params
    # (init is value-independent), so states agree across hosts.
    first = next(iter(train_batches(0)))
    first, _ = pad_batch(first, local_bs)
    state = factory.init_state(jax.random.key(seed), first)

    start_epoch = 0
    latest = ckpt.latest_epoch()
    if latest is not None:
        state = ckpt.restore(state, latest)
        start_epoch = latest + 1
        logger.log(f"{datetime.now()} - resumed from epoch {latest}")

    # The fallback must re-run a violating batch from the PRE-step state,
    # so its train step cannot donate the state buffers.
    train_step = factory.train_step(donate=not use_fallback)
    eval_step = factory.eval_step() if eval_batches is not None else None
    violations = 0

    def _check_dense(metrics, where: str) -> str | None:
        """Recovery action for a failed certificate: None (step is fine),
        'halo' (halo-only violation under point sharding — retry sharded
        with widened halos) or 'classic' (window violation — exact
        per-edge engine, unsharded)."""
        nonlocal violations
        if not dense_mode or bool(metrics["dense_ok"]):
            return None
        violations += 1
        if on_dense_violation == "raise":
            raise RuntimeError(
                f"dense window coverage violated during {where}; widen "
                "SPH3DConfig.windows (scripts/measure_windows.py) or run "
                "with on_dense_violation='fallback'"
            )
        halo_only = (
            factory.point_axis is not None
            and not bool(metrics.get("halo_ok", True))
        )
        action = ("halo" if halo_only else "classic") if use_fallback else None
        logger.log(
            f"WARNING: dense window coverage violated during {where} "
            f"(violation #{violations}); "
            + {
                "halo": "re-running sharded with 2x halos",
                "classic": "re-running via the classic engine",
                None: "keeping the possibly-wrong step",
            }[action]
        )
        return action

    for epoch in range(start_epoch, num_epochs):
        logger.log(f"**** EPOCH {epoch:03d} ****")
        total_correct = total_seen = 0
        loss_sum = 0.0
        epoch_loss_sum = 0.0
        batch_idx = 0
        train_time = 0.0
        for batch in train_batches(epoch):
            dev_batch, batch, bsize = _stage(batch)
            now = time.time()
            new_state, metrics = train_step(state, dev_batch, rng)
            loss = float(metrics["loss"])  # host sync
            action = _check_dense(metrics, f"epoch {epoch} batch {batch_idx}")
            if action == "halo":
                # halo-only violation: redo SHARDED with widened halos
                # (the cloud never has to fit one chip)
                new_state, metrics = _halo_step("train")(
                    state, dev_batch, rng
                )
                if not bool(metrics["dense_ok"]):
                    logger.log(
                        "2x-halo retry still violated: falling back to "
                        "the classic engine"
                    )
                    action = "classic"
            if action == "classic":
                # Redo the batch from the PRE-step state with exact ops;
                # the dense step's update is discarded.
                new_state, metrics = _fallback_step("train")(
                    state, dev_batch, rng
                )
            if action is not None:
                loss = float(metrics["loss"])
            state = new_state
            train_time += time.time() - now
            logits = _local_rows(metrics["logits"])
            c, s = _batch_accuracy(logits, batch, bsize)
            total_correct += c
            total_seen += s
            loss_sum += loss
            epoch_loss_sum += loss
            batch_idx += 1
            if batch_idx % log_every == 0:
                logger.log(f" ---- batch: {batch_idx:03d} ----")
                logger.log(f"mean loss: {loss_sum / log_every:f}")
                logger.log(
                    f"accuracy: {total_correct / max(1, total_seen):f}"
                )
                total_correct = total_seen = 0
                loss_sum = 0.0
        if batch_idx:
            logger.log(
                "training one batch require %.2f milliseconds"
                % (1000 * train_time / batch_idx)
            )
            logger.scalars(
                epoch=epoch,
                step=int(state.step),
                train_loss=epoch_loss_sum / batch_idx,
                ms_per_batch=1000 * train_time / batch_idx,
            )

        if eval_step is not None and bn_prime_steps > 0:
            prime = fallback.setdefault(
                "prime", factory.prime_step()
            )
            stats_sum = None
            primed = 0
            for batch in train_batches(epoch):
                if primed >= bn_prime_steps:
                    break
                batch, _, _ = _stage(batch)
                s = prime(state, batch, jax.random.fold_in(rng, primed))
                stats_sum = (
                    s if stats_sum is None
                    else jax.tree.map(lambda a, b: a + b, stats_sum, s)
                )
                primed += 1
            if primed:
                # eval-only: the training EMA in ``state`` is untouched
                eval_state = state.replace(
                    batch_stats=jax.tree.map(
                        lambda a: a / primed, stats_sum
                    )
                )
                logger.log(f"primed BN stats over {primed} batches")
            else:
                eval_state = state
        else:
            eval_state = state

        if eval_step is not None:
            logger.log(f"---- EPOCH {epoch:03d} EVALUATION ----")
            ev_correct = ev_seen = 0
            ev_loss = 0.0
            ev_items = 0
            ev_batches = 0
            for batch in eval_batches():
                dev_batch, batch, bsize = _stage(batch)
                metrics = eval_step(eval_state, dev_batch)
                action = _check_dense(metrics, f"epoch {epoch} eval")
                if action == "halo":
                    metrics = _halo_step("eval")(eval_state, dev_batch)
                    if not bool(metrics["dense_ok"]):
                        action = "classic"
                if action == "classic":
                    metrics = _fallback_step("eval")(eval_state, dev_batch)
                if "item_loss" in metrics:
                    # Aggregate over real items only — padded repeats of the
                    # last item would otherwise bias short final batches.
                    ev_loss += float(
                        _local_rows(metrics["item_loss"])[:bsize].sum()
                    )
                    ev_items += bsize
                else:
                    ev_loss += float(metrics["loss"])
                    ev_items += 1
                logits = _local_rows(metrics["logits"])
                c, s = _batch_accuracy(logits, batch, bsize)
                ev_correct += c
                ev_seen += s
                ev_batches += 1
            if ev_batches:
                logger.log(f"eval mean loss: {ev_loss / max(1, ev_items):f}")
                logger.log(f"eval accuracy: {ev_correct / max(1, ev_seen):f}")
                logger.scalars(
                    epoch=epoch,
                    eval_loss=ev_loss / max(1, ev_items),
                    eval_accuracy=ev_correct / max(1, ev_seen),
                )

        ckpt.save(epoch, state)
        logger.log(f"Model saved at epoch {epoch}")

    if violations:
        logger.log(
            f"dense window coverage violations total: {violations} "
            + ("(all re-run through the classic engine)"
               if use_fallback else "(steps kept — results may be wrong)")
        )
    ckpt.close()
    logger.close()
    return state
