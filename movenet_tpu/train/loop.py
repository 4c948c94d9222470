"""Functional train/eval steps.

One canonical loop replaces the reference's two divergent trainers
(trainer.py:112-178 legacy, pytorch_lightning_trainer.py:52-97
Lightning).  The step functions are pure — params/opt-state in,
params/opt-state out — so the same code runs single-device under
``jax.jit`` and data-parallel under ``pjit`` with sharded batches
(movenet_tpu.parallel).

Loss semantics (reference trainer.py:128-129, tests/test_model.py:61):
``cross_entropy(output, target)`` with ``target = codes[:, RF:]`` where
``output`` is, by default, the model's *softmax* output — the
CE-on-probabilities quirk.  ``parity_softmax_output=False`` switches to
standard CE-on-logits.

Gradient accumulation (reference trainer.py:130-152, Lightning
``accumulate_grad_batches``) is a ``lax.scan`` over a leading microbatch
axis: mean of microbatch gradients, one optimizer update.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from movenet_tpu.models.wavenet import WaveNet


class Batch(struct.PyTreeNode):
    """A training batch: int mu-law codes and optional video frames.

    With gradient accumulation, arrays carry a leading
    (accumulation_steps,) axis.
    """

    codes: jnp.ndarray                       # (B, T) or (A, B, T) int32
    video: Optional[jnp.ndarray] = None      # (B, F, H, W, C) float or None
    labels: Optional[jnp.ndarray] = None     # (B,) int32 class ids or None
    # optional host-precomputed (T, 3B) int32 fused-kernel codes pack
    # (models.fused.codes_pack_np); saves the on-device relayout.
    # Single-device fused path only — the mesh paths recompute their
    # per-shard packs in-device.
    codes_pack: Optional[jnp.ndarray] = None


class TrainState(train_state.TrainState):
    """flax TrainState + the LR schedule for metric logging."""

    lr_schedule: Any = struct.field(pytree_node=False, default=None)


def create_train_state(model: WaveNet, config, tx,
                       rng: jax.Array,
                       sample_batch: Batch,
                       lr_schedule=None) -> TrainState:
    codes = sample_batch.codes
    video = sample_batch.video
    labels = sample_batch.labels
    if codes.ndim == 3:  # strip accumulation axis for init
        codes = codes[0]
        video = None if video is None else video[0]
        labels = None if labels is None else labels[0]
    variables = model.init(rng, codes, video, labels,
                           method=WaveNet.init_all)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        lr_schedule=lr_schedule,
    )


def _loss_and_metrics(model: WaveNet, parity: bool,
                      fused: bool = False, interpret: bool = False):
    rf = model.receptive_fields

    def fn(params, batch: Batch):
        labels = batch.labels if model.global_classes else None
        if fused:
            # fully kernelized: fused trunk + fused head/CE; logits
            # never materialize in HBM
            from movenet_tpu.models.fused import fused_train_loss

            return fused_train_loss(model, params, batch.codes,
                                    batch.video, labels, parity=parity,
                                    interpret=interpret,
                                    codes_pack=batch.codes_pack)
        logits = model.apply(
            {"params": params}, batch.codes, batch.video, labels,
            method=WaveNet.train_logits)
        logits = logits.astype(jnp.float32)       # (B, T-RF, C)
        targets = batch.codes[:, rf:]
        tgt = targets[..., None]
        if parity:
            # CE computed on softmax probabilities, as upstream.
            # -log_softmax(p)[y] == logsumexp(p) - p[y] exactly; the
            # analytic form skips a full log_softmax pass over the
            # (B, T, C) tensor.
            probs = jax.nn.softmax(logits, axis=-1)
            nll = jax.nn.logsumexp(probs, axis=-1, keepdims=True) \
                - jnp.take_along_axis(probs, tgt, axis=-1)
        else:
            nll = jax.nn.logsumexp(logits, axis=-1, keepdims=True) \
                - jnp.take_along_axis(logits, tgt, axis=-1)
        loss = nll.mean()
        acc = (logits.argmax(-1) == targets).mean()
        return loss, acc

    return fn


def _use_fused(config) -> bool:
    """Fused Pallas blocks are TPU kernels; fall back to the XLA path on
    other backends (tests run on CPU) unless ``fused_interpret`` forces
    the kernels through the Pallas interpreter (multi-chip dryruns and
    CPU equivalence tests of the fused+mesh composition)."""
    if not bool(getattr(config, "fused_blocks", False)):
        return False
    return jax.default_backend() == "tpu" or \
        bool(getattr(config, "fused_interpret", False))


def _fused_interpret(config) -> bool:
    return bool(getattr(config, "fused_interpret", False)) and \
        jax.default_backend() != "tpu"


def _shard_map_loss(loss_fn, mesh):
    """Run a (params, batch) -> (loss, acc) loss under ``jax.shard_map``
    over the mesh's data axis.

    GSPMD cannot partition an opaque Mosaic ``tpu_custom_call``, so the
    fused Pallas path cannot rely on pjit propagating the batch sharding
    through the kernels (the XLA path can).  shard_map hands every
    device its LOCAL batch shard — each runs its own kernel invocation —
    and the pmean here plus shard_map's AD transpose for the replicated
    params (a psum of per-shard param cotangents over ``data``)
    reproduce exactly the DP loss/gradient math the unfused path gets
    from GSPMD.  Equal shard sizes make mean-of-means the global mean.
    The reference analogue is DDP wrapping the whole model, kernels
    included (reference trainer.py:226-235).
    """
    from jax.sharding import PartitionSpec as P

    from movenet_tpu.parallel.mesh import DATA_AXIS

    def body(params, b: Batch):
        loss, acc = loss_fn(params, b)
        return (jax.lax.pmean(loss, DATA_AXIS),
                jax.lax.pmean(acc, DATA_AXIS))

    def wrapped(params, batch: Batch):
        if batch.codes_pack is not None:
            # the pack's batch dim lives in lanes; each shard rebuilds
            # its local pack in-device instead
            batch = batch.replace(codes_pack=None)
        lead = (None,) * (batch.codes.ndim - 2)
        specs = Batch(
            codes=P(*lead, DATA_AXIS, None),
            video=(None if batch.video is None
                   else P(*lead, DATA_AXIS, None, None, None, None)),
            labels=(None if batch.labels is None
                    else P(*lead, DATA_AXIS)),
        )
        # check_vma=False: pallas_call outputs don't declare varying-
        # mesh-axes metadata; correctness of the psum/transpose wiring
        # is pinned numerically against the XLA path
        # (tests/test_parallel.py, __graft_entry__._dryrun_fused_mesh,
        # bench.py check)
        return jax.shard_map(body, mesh=mesh, in_specs=(P(), specs),
                             out_specs=(P(), P()),
                             check_vma=False)(params, batch)

    return wrapped


def _build_loss(model: WaveNet, config, mesh=None):
    """Loss builder shared by train/eval: resolves the fused-vs-XLA path
    against the mesh (fused kernels are batch-parallel via shard_map;
    seq>1 sharding stays on the XLA path, whose causal-shift halo
    exchanges GSPMD already handles)."""
    parity = config.model_config.parity_softmax_output
    fused = _use_fused(config)
    if mesh is not None and fused:
        from movenet_tpu.parallel.mesh import SEQ_AXIS

        if dict(mesh.shape).get(SEQ_AXIS, 1) > 1:
            fused = False
    loss_fn = _loss_and_metrics(model, parity, fused=fused,
                                interpret=_fused_interpret(config))
    if mesh is not None and fused:
        loss_fn = _shard_map_loss(loss_fn, mesh)
    return loss_fn


def make_train_step(model: WaveNet, config, mesh=None):
    """Build the jittable train step.

    accumulation_steps == 1: batch is (B, ...).
    accumulation_steps  > 1: batch is (A, B, ...); gradients are averaged
    over the A microbatches before the single optimizer update.

    ``mesh``: required for the fused Pallas path on a >1-device data
    mesh (see _shard_map_loss); the XLA path ignores it (pjit shardings
    are applied by the caller, movenet_tpu.parallel.sharding).
    """
    accum = config.accumulation_steps
    loss_fn = _build_loss(model, config, mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Batch):
        # flat end-to-end update when the optimizer exposes its
        # single-vector core (FlatGradientTransformation): grads are
        # taken w.r.t. the RAVELED parameter vector, the norm is one
        # reduction, the optimizer runs on one array, and one add +
        # one unravel produce the new tree.  The tree-wise formulation
        # costs ~2.3 ms/step of tiny-kernel launches on v5e (~100
        # leaves x several ops each); this is ~0.3 ms.  Trajectories
        # are identical (same elementwise math, same ordering).
        core = getattr(state.tx, "core", None)
        if core is not None:
            from jax.flatten_util import ravel_pytree

            flat_params, unravel = ravel_pytree(state.params)

            def loss_flat(fp, mb):
                return loss_fn(unravel(fp), mb)

            flat_grad = jax.value_and_grad(loss_flat, has_aux=True)
            if accum <= 1:
                (loss, acc), g = flat_grad(flat_params, batch)
            else:
                def micro(carry, mb):
                    g_sum, l_sum, a_sum = carry
                    (l, a), g = flat_grad(flat_params, mb)
                    return (g_sum + g, l_sum + l, a_sum + a), None

                (g, l_sum, a_sum), _ = jax.lax.scan(
                    micro, (jnp.zeros_like(flat_params), 0.0, 0.0),
                    batch)
                g = g / accum
                loss, acc = l_sum / accum, a_sum / accum
            grad_norm = jnp.sqrt(jnp.sum(g * g))
            updates, new_opt = core.update(g, state.opt_state,
                                           flat_params)
            new_state = state.replace(
                step=state.step + 1,
                params=unravel(flat_params + updates),
                opt_state=new_opt)
        else:
            if accum <= 1:
                (loss, acc), grads = grad_fn(state.params, batch)
            else:
                def micro(carry, mb):
                    g_sum, l_sum, a_sum = carry
                    (l, a), g = grad_fn(state.params, mb)
                    g_sum = jax.tree.map(jnp.add, g_sum, g)
                    return (g_sum, l_sum + l, a_sum + a), None

                zeros = jax.tree.map(jnp.zeros_like, state.params)
                (g_sum, l_sum, a_sum), _ = jax.lax.scan(
                    micro, (zeros, 0.0, 0.0), batch)
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                loss, acc = l_sum / accum, a_sum / accum

            grad_norm = optax.global_norm(grads)
            new_state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": loss,
            "accuracy": acc,
            "grad_norm": grad_norm,
        }
        if state.lr_schedule is not None:
            metrics["learning_rate"] = state.lr_schedule(state.step)
        return new_state, metrics

    return train_step


def make_scan_train_step(model: WaveNet, config, n_steps: int,
                         mesh=None):
    """Run ``n_steps`` optimizer steps in ONE jitted call via lax.scan.

    Dispatch through a remote/tunneled PJRT backend costs ~1 ms per
    call; scanning N steps inside one executable amortizes it N-fold
    (the standard TPU pattern for host-dispatch-bound loops).  The
    returned function takes batches stacked on a leading (N, ...) axis
    and returns EVERY scanned step's metrics stacked on a leading
    (n_steps,) axis — per-step logging fidelity is preserved (the
    scanned loss curve is identical to n_steps individual calls).
    """
    step = make_train_step(model, config, mesh)

    def multi_step(state: TrainState, batches: Batch):
        def body(s, b):
            s, m = step(s, b)
            return s, m
        return jax.lax.scan(body, state, batches, length=n_steps)

    return multi_step


def make_eval_step(model: WaveNet, config, mesh=None):
    loss_fn = _build_loss(model, config, mesh)

    def eval_step(state: TrainState, batch: Batch):
        loss, acc = loss_fn(state.params, batch)
        return {"loss": loss, "accuracy": acc}

    return eval_step
