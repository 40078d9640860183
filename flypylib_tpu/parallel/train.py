"""Mesh data-parallel training.

TPU-native replacement for flypylib multi_gpu.make_parallel (SURVEY.md
section 2.2 row 6): instead of replicating a Keras model under
``tf.device('/gpu:i')`` and slicing batches with Lambda layers, the jit'd
train step is pjit-partitioned over a ``Mesh``: params/opt-state
replicated, the on-device-sampled patch batch sharded over the ``data``
axis (``with_sharding_constraint``), and XLA inserts the gradient
all-reduce (psum) over ICI automatically.

The step body is exactly the single-chip one from
flypylib_tpu.train.trainer — same sampling, same augmentation, same loss —
so single-chip and multi-chip training share semantics by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flypylib_tpu.models.zoo import ModelSpec
from flypylib_tpu.ops.augment import AUGMENT_GROUP_SIZE, augment_patch
from flypylib_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    _sample_corners,
    masked_bce_loss,
)


def make_dp_train_step(
    spec: ModelSpec,
    cfg: TrainConfig,
    vol_shape,
    mesh: Mesh,
    data_axis: str = "data",
):
    """Build a mesh-data-parallel jit train step.

    ``cfg.batch_size`` is the GLOBAL batch; it must divide by the mesh's
    ``data`` axis size.  Returns ``(train_step, patch_size)`` with
    signature ``train_step(state, key, image, labels, mask, pos_locs,
    n_pos_locs) -> (state, metrics)``.
    """
    n_data = mesh.shape[data_axis]
    if cfg.batch_size % n_data != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by data axis {n_data}"
        )
    patch = spec.valid_size(cfg.patch_size)
    ctx = spec.context
    out = patch - 2 * ctx
    batch_sharding = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    def gather_patch(vol, corner, size):
        return jax.lax.dynamic_slice(vol, corner, (size,) * 3)

    def loss_fn(params, batch_stats, key, image, labels, mask, pos_locs,
                n_pos_locs):
        k_corner, k_aug = jax.random.split(key)
        corners = _sample_corners(
            k_corner, cfg.batch_size, vol_shape, patch, pos_locs, n_pos_locs,
            cfg,
        )
        x = jax.vmap(lambda c: gather_patch(image, c, patch))(corners)
        yc = corners + ctx
        y = jax.vmap(lambda c: gather_patch(labels, c, out))(yc)
        m = jax.vmap(lambda c: gather_patch(mask, c, out))(yc)
        if cfg.augment:
            codes = jax.random.randint(
                k_aug, (cfg.batch_size,), 0, AUGMENT_GROUP_SIZE
            )
            x = jax.vmap(augment_patch)(x, codes)
            y = jax.vmap(augment_patch)(y, codes)
            m = jax.vmap(augment_patch)(m, codes)
        # shard the patch batch over the data axis: conv fwd/bwd run
        # batch-parallel, grads all-reduce over ICI
        x = jax.lax.with_sharding_constraint(x, batch_sharding)
        y = jax.lax.with_sharding_constraint(y, batch_sharding)
        m = jax.lax.with_sharding_constraint(m, batch_sharding)

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outputs = spec.module.apply(
            variables, x[..., None], train=True,
            mutable=["batch_stats"] if batch_stats else [],
        )
        logits, updates = (
            outputs if isinstance(outputs, tuple) else (outputs, {})
        )
        logits = logits[..., 0]
        loss = masked_bce_loss(logits, y, m)
        metrics = {"loss": loss, "pos_frac": jnp.mean(y)}
        return loss, (metrics, updates.get("batch_stats", batch_stats))

    @jax.jit
    def step_impl(state, key, image, labels, mask, pos_locs, n_pos_locs):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, key, image, labels, mask,
            pos_locs, n_pos_locs,
        )
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: repl, grads)
        )
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=opt_state),
            metrics,
        )

    return step_impl, patch
