"""Jitted train/eval steps for both architectures.

One XLA program per step: LCN preprocessing, forward, all losses, backward,
and the optimizer update fuse together (the reference ran these as separate
eager phases with explicit cuda.synchronize timing, model/worker.py:497-554).

Data parallelism: the step is jitted with NamedShardings — batch sharded
over the 'data' mesh axis, state replicated; XLA inserts the gradient
all-reduce. Works identically on 1 device (no-op collective).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.dataset import Batch
from ..data.wire import decode_batch
from .objective import (LossContext, sf_losses, mf_losses, preprocess_images,
                        augment_batch_device, rigid_flow_device)
from .state import TrainState


def _sf_forward(model, params, batch: Batch, ctx: LossContext):
    net_in, *_ = preprocess_images(batch, ctx.lcn_radius)
    return model.apply(params, net_in)          # tuple of 4 (tl*bs,H,W,1)


def _mf_forward(model, params, batch: Batch, ctx: LossContext):
    from ..ops import disp_to_depth
    tl, bs, H, W = batch.im.shape
    net_in, *_ = preprocess_images(batch, ctx.lcn_radius)
    ir = net_in.reshape(tl, bs, H, W, 2)
    amb = batch.ambient[..., None]
    pdisp = batch.primary_disp[..., None]
    pdepth = disp_to_depth(pdisp, ctx.focal_length, ctx.baseline)
    return model.apply(params, ir, amb, pdisp, pdepth, batch.R, batch.t,
                       batch.flow)              # (tl, bs, H, W, 1)


def _make_step_fns(model, ctx: LossContext,
                   optimizer: optax.GradientTransformation,
                   architecture: str):
    """Raw (unjitted) train/eval step functions plus the threaded constants.

    Shared by ``build_steps`` (jit + closure) and ``build_steps_aot``
    (explicit AOT lowering for off-hardware compile checks).
    """
    if architecture in ("single_frame", "sf"):
        forward, losses = _sf_forward, sf_losses
        take_disp0 = lambda outs, b: outs[0][..., 0].reshape(b.im.shape)
    elif architecture in ("multi_frame", "mf"):
        forward, losses = _mf_forward, mf_losses
        take_disp0 = lambda outs, b: outs[..., 0]
    else:
        raise ValueError(architecture)

    # CRITICAL TPU detail: array constants (projector pattern, camera rays/
    # grid) must be *arguments* of the jitted step, not closed-over
    # constants — gathers on closure constants fall into XLA's slow flat
    # dynamic-gather lowering (~2000x, measured in scripts/bench_loss.py).
    consts = (ctx.cam, ctx.pattern_lcn, ctx.pattern_pyr, ctx.flow_params)
    static_ctx = ctx._replace(cam=None, pattern_lcn=None, pattern_pyr=None,
                              flow_params=None)

    is_mf = architecture in ("multi_frame", "mf")

    def _prepare(batch: Batch, ctx_full: LossContext) -> Batch:
        if ctx.flow_source == "rigid":
            flow = rigid_flow_device(ctx_full.cam, batch.disp_gt, batch.R,
                                     batch.t, ctx.focal_length, ctx.baseline)
            batch = batch._replace(flow=flow)
        elif ctx.flow_source == "net":
            from ..models.flownet import FlowNet, flow_all_pairs
            flow = flow_all_pairs(FlowNet(), ctx_full.flow_params,
                                  batch.im, batch.ambient,
                                  ctx.flow_in_channels)
            batch = batch._replace(flow=flow)
        elif ctx.flow_source == "pred" and is_mf:
            # MF: the predicted-disparity provider uses the presaved primary
            # disparities (the SF predictions FuseNet fuses anyway); the SF
            # variant derives flow from the live prediction in sf_losses
            flow = rigid_flow_device(ctx_full.cam, batch.primary_disp,
                                     batch.R, batch.t, ctx.focal_length,
                                     ctx.baseline)
            batch = batch._replace(flow=flow)
        return batch

    def train_step(state: TrainState, batch: Batch, epoch, consts):
        batch = decode_batch(batch)      # 16-bit wire fields -> f32 (no-op
        cam, pattern_lcn, pattern_pyr, flow_params = consts
        ctx_full = static_ctx._replace(cam=cam, pattern_lcn=pattern_lcn,
                                       pattern_pyr=pattern_pyr,
                                       flow_params=flow_params)
        rng, step_rng, aug_rng = jax.random.split(state.rng, 3)
        if ctx.augment:
            batch = augment_batch_device(batch, aug_rng, ctx_full)
        batch = _prepare(batch, ctx_full)

        def loss_fn(params):
            outs = forward(model, params, batch, ctx_full)
            total, comps = losses(outs, batch, ctx_full, train=True,
                                  epoch=epoch, rng=step_rng)
            return total, comps

        (_, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        return new_state, comps

    def eval_step(params, batch: Batch, epoch, consts):
        batch = decode_batch(batch)
        cam, pattern_lcn, pattern_pyr, flow_params = consts
        ctx_full = static_ctx._replace(cam=cam, pattern_lcn=pattern_lcn,
                                       pattern_pyr=pattern_pyr,
                                       flow_params=flow_params)
        batch = _prepare(batch, ctx_full)
        outs = forward(model, params, batch, ctx_full)
        _, comps = losses(outs, batch, ctx_full, train=False, epoch=epoch,
                          rng=jax.random.key(0))
        # disparities travel device->host as u16 x256 fixed point (1/256 px,
        # far below metric thresholds) — D2H rides the same slow tunnel as
        # H2D (data/wire.py); callers decode with wire.decode_disp_np
        disp = take_disp0(outs, batch)
        disp_u16 = jnp.clip(disp * 256.0 + 0.5, 0, 65535).astype(jnp.uint16)
        return disp_u16, comps

    return train_step, eval_step, consts


def build_steps(model, ctx: LossContext, optimizer: optax.GradientTransformation,
                architecture: str, mesh=None):
    """Returns (train_step, eval_step), both jitted with DP shardings.

    train_step(state, batch, epoch) -> (state, components)
    eval_step(params, batch, epoch) -> (disp0 (tl,bs,H,W), components)
    """
    train_step, eval_step, consts = _make_step_fns(model, ctx, optimizer,
                                                   architecture)

    # Sharding is carried by the *inputs*: `put_batch` commits the batch with
    # its per-leaf NamedShardings and the state is replicated at creation;
    # jit propagates them and inserts the gradient all-reduce over 'data'.
    if mesh is not None:
        from ..parallel.mesh import replicate_pytree
        consts = replicate_pytree(consts, mesh)
    train_jit = jax.jit(train_step, donate_argnums=(0,))
    eval_jit = jax.jit(eval_step)

    def train_step_pub(state, batch, epoch):
        return train_jit(state, batch, epoch, consts)

    def eval_step_pub(params, batch, epoch):
        return eval_jit(params, batch, epoch, consts)

    # expose the raw jits + threaded constants for cost analysis (bench.py
    # lowers the same program — a cache hit — to read XLA's FLOP estimate)
    train_step_pub._jit, eval_step_pub._jit = train_jit, eval_jit
    train_step_pub._consts = eval_step_pub._consts = consts
    return train_step_pub, eval_step_pub


def build_steps_aot(model, ctx: LossContext,
                    optimizer: optax.GradientTransformation,
                    architecture: str, mesh, state, batch: Batch):
    """AOT-lower the sharded train step at the given abstract shapes.

    ``state``/``batch`` may be concrete arrays or ShapeDtypeStruct pytrees —
    only shapes/dtypes are used.  Returns the jax ``Lowered`` object so
    callers can ``.compile()`` off-hardware (e.g. the production-shape
    512x432 compile check in __graft_entry__.py) and inspect
    ``memory_analysis()`` without executing anything.
    """
    from ..parallel.mesh import batch_shardings, replicated

    train_step, _, consts = _make_step_fns(model, ctx, optimizer,
                                           architecture)
    repl = replicated(mesh)
    b_shardings = batch_shardings(mesh, batch)

    def abstract(x, sharding):
        if x is None:
            return None
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    state_abs = jax.tree.map(lambda x: abstract(x, repl), state)
    batch_abs = Batch(**{
        k: abstract(getattr(batch, k), getattr(b_shardings, k))
        for k in Batch._fields})
    consts_abs = jax.tree.map(lambda x: abstract(x, repl), consts)
    epoch_abs = jax.ShapeDtypeStruct((), jnp.float32, sharding=repl)
    return jax.jit(train_step, donate_argnums=(0,)).lower(
        state_abs, batch_abs, epoch_abs, consts_abs)
