"""Jitted, mesh-sharded train/eval step factories.

Replaces the reference's `sess.run(train_op, feed_dict)` loop
(ref train_modelnet.py:285-291) with a donated, jitted step. Data
parallelism is expressed with `jax.sharding`: parameters/optimizer state
replicated, batch sharded over the mesh 'data' axis — XLA inserts the
gradient all-reduce over ICI (SURVEY.md §2.7 "TPU-native equivalents").
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from sph3d_gcn_tpu.nn.layers import l2_regularization
from sph3d_gcn_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(flax.struct.PyTreeNode):
    """Training state: params + BN running stats + optimizer state."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState

    @classmethod
    def create(cls, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )


# Loss adapters: (logits, batch) -> scalar data loss.
LossFn = Callable[[jax.Array, dict[str, jax.Array]], jax.Array]


@dataclasses.dataclass(frozen=True)
class StepFactory:
    """Builds jitted train/eval steps for a model + optimizer + loss.

    Args:
      model: a Flax module whose __call__ is (points, [cls_label,] train).
      tx: optax optimizer (created once; its schedule owns the step count).
      loss_fn: maps (logits, batch) to the data loss.
      weight_decay: reference-style L2 coefficient applied to
        ``l2_regularization`` of the params, or None (ref
        train_modelnet.py:156-160).
      mesh: optional device mesh; when given, steps are compiled with
        replicated state and batch sharded over the 'data' axis.
      model_kwargs_keys: batch keys forwarded positionally to the model
        after `points` (e.g. ('cls_label',) for the onehot ShapeNet model).
      item_loss_fn: optional (logits, batch) -> (B,) per-item data loss,
        returned by eval steps so callers can aggregate over *real* (unpadded)
        items only.
    """

    model: Any
    tx: optax.GradientTransformation
    loss_fn: LossFn
    weight_decay: float | None = None
    mesh: Mesh | None = None
    model_kwargs_keys: tuple[str, ...] = ()
    item_loss_fn: LossFn | None = None
    # Point-axis (spatial) sharding: the mesh axis the model shards its
    # point rows over (cfg.point_axis must name the same axis). Steps are
    # then shard_map'ed over the mesh with state/batch replicated — the
    # model manages its own row sharding and halo exchanges internally
    # (parallel/spatial.py), so sp scales the POINT count per chip where
    # 'data' parallelism scales the batch.
    point_axis: str | None = None
    # Composed dp x sp: a second mesh axis the BATCH shards over inside
    # the same shard_map (cfg.data_axis must match so BN stats sync over
    # it). loss_reduction names how loss_fn reduces over batch items —
    # 'mean' (classification, plain seg) or 'sum' (the reference's
    # inner-masked S3DIS loss) — so the cross-shard reassembly of the
    # global loss is exact.
    data_axis: str | None = None
    loss_reduction: str = "mean"

    def init_state(self, rng, sample_batch) -> TrainState:
        """Initialize params/BN stats/optimizer state from a sample batch
        (replicated onto the mesh when one is configured)."""
        extra = [sample_batch[k] for k in self.model_kwargs_keys]
        k_params, k_sample = jax.random.split(rng)
        # jit the init: one compile instead of hundreds of eager per-op
        # dispatches (each ~seconds over the axon relay at 10k points).
        # Under point sharding, init with an UNSHARDED clone: parameter
        # and BN-stat shapes are row-count-free, and lax.axis_index is
        # only bound inside the shard_map'ed steps.
        init_model = self.model
        if self.point_axis is not None:
            cfg = dataclasses.replace(
                self.model.config, point_axis=None, data_axis=None
            )
            init_model = self.model.clone(config=cfg)
        variables = jax.jit(
            init_model.init, static_argnames=("train",)
        )(
            {"params": k_params, "sample": k_sample},
            sample_batch["points"],
            *extra,
            train=False,
        )
        state = TrainState.create(variables, self.tx)
        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))
        return state

    def _losses(self, params, batch_stats, batch, rng, train):
        extra = [batch[k] for k in self.model_kwargs_keys]
        variables = {"params": params, "batch_stats": batch_stats}
        # IDS/random subsampling draws a "sample" rng even at eval
        # (ref tf_sample.py:27-49 are plain graph ops, live in both modes);
        # supplying an extra stream is harmless for FPS configs.
        k_drop, k_sample = jax.random.split(rng)
        if self.point_axis is not None and self.data_axis is not None:
            # each batch shard draws distinct dropout/sampling streams
            i = lax.axis_index(self.data_axis)
            k_drop = jax.random.fold_in(k_drop, i)
            k_sample = jax.random.fold_in(k_sample, i)
        rngs = (
            {"dropout": k_drop, "sample": k_sample}
            if train
            else {"sample": rng}
        )
        if train:
            logits, mutated = self.model.apply(
                variables,
                batch["points"],
                *extra,
                train=True,
                rngs=rngs,
                mutable=["batch_stats", "intermediates"],
            )
            new_stats = mutated["batch_stats"]
        else:
            logits, mutated = self.model.apply(
                variables, batch["points"], *extra, train=False, rngs=rngs,
                mutable=["intermediates"],
            )
            new_stats = batch_stats
        # Window-coverage certificate of the dense edge engine: AND of every
        # 'dense_ok' flag the model sowed (True when dense mode is off).
        # 'halo_ok' (point sharding only) separates halo breaches from
        # window breaches: a halo-only violation is recoverable by a
        # wider-halo re-run (halo_widened), window violations need the
        # classic engine.
        ok = jnp.bool_(True)
        h_ok = jnp.bool_(True)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            mutated.get("intermediates", {})
        ):
            if any(getattr(p, "key", None) == "dense_ok" for p in path):
                ok &= leaf
            if any(getattr(p, "key", None) == "halo_ok" for p in path):
                h_ok &= leaf
        data_loss = self.loss_fn(logits, batch)
        total = data_loss
        if self.weight_decay is not None:
            total = total + self.weight_decay * l2_regularization(params)
        if self.point_axis is not None:
            # Reassemble the global loss from per-shard values with
            # psum_replicated (identity transpose — parallel/spatial.py
            # for why the built-in psum cannot be used on a grad path).
            # Scaling: every points-shard computes the same local loss
            # (logits gather inside the model), so a psum over the point
            # axis needs /d_p; a 'mean'-reduced loss over a data-sharded
            # batch needs the /d_d of the global mean, a 'sum'-reduced
            # one sums across batch shards as-is. The weight-decay term
            # is replicated on every shard, so it always carries the full
            # /(d_d * d_p). The VALUE equals the unsharded loss; the
            # backward seeds every shard with its true cotangent.
            from sph3d_gcn_tpu.parallel.spatial import psum_replicated

            axes = tuple(
                a for a in (self.data_axis, self.point_axis)
                if a is not None
            )
            denom = 1
            for a in axes:
                denom *= lax.axis_size(a)
            if self.loss_reduction == "mean" or self.data_axis is None:
                scale = 1.0 / denom
            else:  # 'sum' over a data-sharded batch
                scale = 1.0 / lax.axis_size(self.point_axis)
            wd_part = total - data_loss
            total = psum_replicated(
                data_loss * scale + wd_part / denom, axes
            )
            if self.data_axis is not None:
                # report the GLOBAL data loss (the local one differs per
                # batch shard); wd_part is replicated so this is exact
                data_loss = total - wd_part
        return total, (data_loss, logits, new_stats, ok, h_ok)

    def halo_widened(self, scale: int = 2) -> "StepFactory":
        """A point-sharded StepFactory on the SAME parameters with the
        inter-level halos widened ``scale``x (cfg.halo_scale).

        The first recovery step for a halo-only violation (``halo_ok``
        False, i.e. a skewed cloud pushed a pool/unpool window past the
        1x halo): the re-run stays SHARDED — no single chip ever has to
        hold the whole cloud — at the cost of wider halo exchanges.
        Returns ``self`` unchanged when point sharding is off."""
        if self.point_axis is None:
            return self
        cfg = self.model.config
        new_cfg = dataclasses.replace(
            cfg, halo_scale=max(cfg.halo_scale, 1) * scale
        )
        return dataclasses.replace(
            self, model=self.model.clone(config=new_cfg)
        )

    def classic_fallback(self) -> "StepFactory":
        """A StepFactory on the SAME parameters with the dense windowed
        engine disabled (classic per-edge ops).

        The dense engine can return provably-wrong neighborhoods when a
        cloud exceeds the configured windows; it reports that through the
        per-step ``dense_ok`` certificate (ops/dense.py). This factory is
        the recovery path: identical model/params/optimizer, dense maps
        replaced by the exact classic ops (the reference-parity engine,
        ref tf_nnquery_gpu.cu:30-60 never returns a wrong neighborhood).
        Param trees are identical across engines, so states interchange.

        MEMORY BOUND: under point-axis sharding this fallback runs
        UNSHARDED on one device (the classic engine has no row sharding),
        so the whole cloud's activations must fit a single chip's HBM. At
        the whole-scene point counts sp exists for that may not hold —
        there, recover with ``halo_widened`` first (fit() does) and treat
        a window violation as a configuration error (widen
        SPH3DConfig.windows via scripts/measure_windows.py) rather than
        relying on this path.
        """
        import dataclasses as _dc

        cfg = self.model.config
        if not getattr(cfg, "dense_graph", False):
            return self
        new_cfg = _dc.replace(
            cfg,
            dense_graph=False,
            # the classic engine has no point-axis sharding; the recovery
            # path runs unsharded (it exists for occasional flagged
            # batches, not steady-state throughput)
            point_axis=None,
            data_axis=None,
            # the classic engine needs conv-block remat to fit full-size
            # seg models in HBM (configs/__init__.py)
            remat_blocks=cfg.num_input >= 4096,
        )
        return dataclasses.replace(
            self,
            model=self.model.clone(config=new_cfg),
            mesh=None if self.point_axis is not None else self.mesh,
            point_axis=None,
            data_axis=None,
        )

    def _sp_shard_map(self, step, in_specs=None, out_specs=None):
        """shard_map a step over the mesh for point-axis sharding: state
        and rng replicated, the batch sharded over data_axis when set
        (else replicated); the model shards its own rows internally.
        check_vma is off because the per-shard program mixes replicated
        and device-varying values by design; gradient correctness comes
        from the explicit transposes (psum_replicated seeding in _losses,
        all_rows/pmean custom VJPs, the grads psum in train_step)."""
        if self.mesh is None or self.point_axis not in self.mesh.axis_names:
            raise ValueError(
                f"point_axis={self.point_axis!r} needs a mesh with that "
                f"axis (got {None if self.mesh is None else self.mesh.axis_names})"
            )
        if self.data_axis is not None:
            if self.data_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"data_axis={self.data_axis!r} not in mesh axes "
                    f"{self.mesh.axis_names}"
                )
            batch_spec = PartitionSpec(self.data_axis)
        else:
            batch_spec = PartitionSpec()
        return jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=in_specs if in_specs is not None else (
                PartitionSpec(), batch_spec, PartitionSpec()
            ),
            out_specs=out_specs if out_specs is not None
            else PartitionSpec(),
            check_vma=False,
        )

    def train_step(self, donate: bool = True):
        """Returns jitted (state, batch, rng) -> (state, metrics).

        ``donate=False`` keeps the input state buffers alive — required by
        the dense-violation fallback in ``fit()``, which must be able to
        re-run a batch from the pre-step state."""

        def step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            grad_fn = jax.value_and_grad(self._losses, has_aux=True)
            (total, (data_loss, logits, new_stats, ok, h_ok)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, True
            )
            if self.point_axis is not None:
                # Each shard's backward yields TRUE partial grads for its
                # sharded rows/items and correctly-scaled grads along
                # replicated segments (the psum_replicated loss seeding)
                # — psum over every shard axis assembles the exact
                # unsharded gradient. shard_map's own unmapping of
                # replicated-in cotangents keeps only one shard's, so the
                # sum must happen here.
                axes = tuple(
                    a for a in (self.data_axis, self.point_axis)
                    if a is not None
                )
                grads = jax.tree.map(lambda g: lax.psum(g, axes), grads)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            )
            metrics = {
                "loss": total, "data_loss": data_loss, "logits": logits,
                "dense_ok": ok, "halo_ok": h_ok,
            }
            return new_state, metrics

        donate_argnums = (0,) if donate else ()
        if self.point_axis is not None:
            from jax.sharding import PartitionSpec as P

            batch_spec = (
                P(self.data_axis) if self.data_axis is not None else P()
            )
            out_specs = (P(), {
                "loss": P(), "data_loss": P(), "logits": batch_spec,
                "dense_ok": P(), "halo_ok": P(),
            })
            return jax.jit(
                self._sp_shard_map(step, out_specs=out_specs),
                donate_argnums=donate_argnums,
            )
        if self.mesh is None:
            return jax.jit(step, donate_argnums=donate_argnums)
        rep = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        return jax.jit(
            step,
            donate_argnums=donate_argnums,
            in_shardings=(rep, data, rep),
            out_shardings=(rep, {
                "loss": rep, "data_loss": rep, "logits": data,
                "dense_ok": rep, "halo_ok": rep,
            }),
        )

    def prime_step(self):
        """Returns jitted (state, batch, rng) -> per-batch BN statistics.

        The depthwise conv's neighbor-mean smoothing gives BN inputs tiny
        batch variance, so running-average stats (momentum .99) need ~10^3
        steps before eval-mode accuracy is meaningful (BASELINE.md
        "Eval-mode note") — invisible on the reference's 250-epoch
        schedule, hostile to short runs. Priming sidesteps the EMA: one
        train-mode apply mutates stats as ``new = m*old + (1-m)*batch``,
        so the batch statistic is recovered exactly as
        ``(new - m*old) / (1-m)`` with no per-layer momentum plumbing;
        ``fit(bn_prime_steps=N)`` averages it over N batches and installs
        the result as the running stats.
        """
        momentum = 0.99  # nn/layers.BatchNorm default (ref sph3gcn_util.py:328)

        def step(state: TrainState, batch, rng):
            extra = [batch[k] for k in self.model_kwargs_keys]
            k_drop, k_sample = jax.random.split(rng)
            _, mutated = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["points"],
                *extra,
                train=True,
                rngs={"dropout": k_drop, "sample": k_sample},
                mutable=["batch_stats"],
            )
            return jax.tree.map(
                lambda new, old: (new - momentum * old) / (1.0 - momentum),
                mutated["batch_stats"],
                state.batch_stats,
            )

        if self.point_axis is not None:
            return jax.jit(self._sp_shard_map(step))
        if self.mesh is None:
            return jax.jit(step)
        rep = replicated(self.mesh)
        return jax.jit(
            step,
            in_shardings=(rep, batch_sharding(self.mesh), rep),
            out_shardings=rep,
        )

    def eval_step(self):
        """Returns jitted (state, batch) -> (loss, logits)."""

        def step(state: TrainState, batch):
            total, (data_loss, logits, _, ok, h_ok) = self._losses(
                state.params, state.batch_stats, batch, jax.random.key(0), False
            )
            out = {"loss": total, "data_loss": data_loss, "logits": logits,
                   "dense_ok": ok, "halo_ok": h_ok}
            if self.item_loss_fn is not None:
                out["item_loss"] = self.item_loss_fn(logits, batch)
            return out

        if self.point_axis is not None:
            from jax.sharding import PartitionSpec as P

            batch_spec = (
                P(self.data_axis) if self.data_axis is not None else P()
            )
            out_specs = {"loss": P(), "data_loss": P(),
                         "logits": batch_spec, "dense_ok": P(),
                         "halo_ok": P()}
            if self.item_loss_fn is not None:
                out_specs["item_loss"] = batch_spec
            return jax.jit(self._sp_shard_map(
                step, in_specs=(P(), batch_spec), out_specs=out_specs
            ))
        if self.mesh is None:
            return jax.jit(step)
        rep = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        out_sh = {"loss": rep, "data_loss": rep, "logits": data,
                  "dense_ok": rep, "halo_ok": rep}
        if self.item_loss_fn is not None:
            out_sh["item_loss"] = data
        return jax.jit(
            step,
            in_shardings=(rep, data),
            out_shardings=out_sh,
        )


def classification_step_factory(
    model, tx, weight_decay=None, mesh=None, point_axis=None,
    data_axis=None,
) -> StepFactory:
    """StepFactory with the mean softmax-CE classification loss
    (ref SPH3D_modelnet.py:112-119)."""
    from sph3d_gcn_tpu.models.modelnet import (
        classification_item_loss,
        classification_loss,
    )

    return StepFactory(
        model=model,
        tx=tx,
        loss_fn=lambda logits, batch: classification_loss(logits, batch["label"]),
        weight_decay=weight_decay,
        mesh=mesh,
        item_loss_fn=lambda logits, batch: classification_item_loss(
            logits, batch["label"]
        ),
        point_axis=point_axis,
        data_axis=data_axis,
        loss_reduction="mean",
    )


def segmentation_step_factory(
    model, tx, weight_decay=None, mesh=None, inner_masked=False,
    model_kwargs_keys=(), point_axis=None, data_axis=None,
) -> StepFactory:
    """StepFactory with the per-point CE loss; ``inner_masked`` selects the
    S3DIS/ScanNet inner-point masked variant (ref SPH3D_s3dis.py:116-133)."""
    from sph3d_gcn_tpu.models.segmentation import (
        inner_masked_item_loss,
        inner_masked_segmentation_loss,
        segmentation_item_loss,
        segmentation_loss,
    )

    if inner_masked:
        loss_fn = lambda logits, batch: inner_masked_segmentation_loss(
            logits, batch["label"], batch["inner_label"]
        )
        item_loss_fn = lambda logits, batch: inner_masked_item_loss(
            logits, batch["label"], batch["inner_label"]
        )
    else:
        loss_fn = lambda logits, batch: segmentation_loss(logits, batch["label"])
        item_loss_fn = lambda logits, batch: segmentation_item_loss(
            logits, batch["label"]
        )
    return StepFactory(
        model=model,
        tx=tx,
        loss_fn=loss_fn,
        weight_decay=weight_decay,
        mesh=mesh,
        model_kwargs_keys=model_kwargs_keys,
        item_loss_fn=item_loss_fn,
        point_axis=point_axis,
        data_axis=data_axis,
        loss_reduction="sum" if inner_masked else "mean",
    )
