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


def _chunk_batch(batch: Batch, k: int, dp: int = 1) -> Batch:
    """Split the batch-size axis into k leading scan chunks.

    Every field is (tl, bs, ...) except flow (tl, tl, bs, ...); the chunk
    count moves to a new leading axis: (k, tl, bs/k, ...).  With ``dp``
    data-parallel shards the bs axis is block-distributed over devices, so
    each chunk takes bs/(dp*k) consecutive samples from EVERY device's
    block (reshape (dp, k, per) + transpose — device-local data movement,
    no collective)."""
    def split(name, x):
        if x is None:
            return None
        a = 2 if name == "flow" else 1
        bs = x.shape[a]
        assert bs % (dp * k) == 0, \
            f"batch size {bs} not divisible by dp*accum={dp}x{k}"
        x = x.reshape(*x.shape[:a], dp, k, bs // (dp * k), *x.shape[a + 1:])
        x = jnp.moveaxis(x, a + 1, 0)               # (k, ..., dp, per, ...)
        return x.reshape(*x.shape[:a + 1], bs // k, *x.shape[a + 3:])
    return Batch(**{f: split(f, getattr(batch, f)) for f in Batch._fields})


def _make_step_fns(model, ctx: LossContext,
                   optimizer: optax.GradientTransformation,
                   architecture: str, accum_steps: int = 1):
    """Raw (unjitted) train/eval step functions plus the threaded constants.

    Shared by ``build_steps`` (jit + closure) and ``build_steps_aot``
    (explicit AOT lowering for off-hardware compile checks).

    ``accum_steps > 1`` runs the forward+backward over bs/accum microbatches
    under ``lax.scan`` and applies the averaged gradient once — peak
    activation memory drops to one microbatch's (the bs=4 bf16 noremat
    DIS-MF graph is ~15.9 GiB temp on a 16 GiB v5e; accum=2 is what lets
    the un-rematerialized graph train in the worker).  These models carry
    no batch statistics (GroupNorm only), so the averaged microbatch
    gradient equals the full-batch gradient exactly for plain-mean loss
    terms (smoothness, the MF/pseudo-GT L1s); the masked-mean terms
    (photometric, geometric, SGM) normalize by each microbatch's own mask
    count instead of the full batch's — the same statistic as training at
    the smaller batch size (measured grad delta ~1e-4 on fixtures,
    tests/test_accum.py).
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
            # variant derives flow from the live prediction in sf_losses.
            # optimization_barrier: the flow feeds ~10 consumers across the
            # fusion blocks; the barrier pins one materialization so XLA
            # cannot re-fuse the unproject/project chain into each of them
            # (neutral on the measured step — kept as graph hygiene)
            flow = rigid_flow_device(ctx_full.cam, batch.primary_disp,
                                     batch.R, batch.t, ctx.focal_length,
                                     ctx.baseline)
            flow = jax.lax.optimization_barrier(flow)
            batch = batch._replace(flow=flow)
        return batch

    def train_step(state: TrainState, batch: Batch, epoch, consts):
        batch = decode_batch(batch)      # 16-bit wire fields -> f32 (no-op
        cam, pattern_lcn, pattern_pyr, flow_params = consts
        ctx_full = static_ctx._replace(cam=cam, pattern_lcn=pattern_lcn,
                                       pattern_pyr=pattern_pyr,
                                       flow_params=flow_params)
        rng, step_rng, aug_rng = jax.random.split(state.rng, 3)

        def grads_of(b: Batch, srng, arng):
            if ctx.augment:
                b = augment_batch_device(b, arng, ctx_full)
            b = _prepare(b, ctx_full)

            def loss_fn(params):
                outs = forward(model, params, b, ctx_full)
                total, comps = losses(outs, b, ctx_full, train=True,
                                      epoch=epoch, rng=srng)
                return total, comps

            (_, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return grads, comps

        if accum_steps <= 1:
            grads, comps = grads_of(batch, step_rng, aug_rng)
        else:
            chunks = _chunk_batch(batch, accum_steps)

            def body(carry, xs):
                g_acc, c_acc = carry
                b, i = xs
                g, c = grads_of(b, jax.random.fold_in(step_rng, i),
                                jax.random.fold_in(aug_rng, i))
                return (jax.tree.map(jnp.add, g_acc, g), c_acc + c), None

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            # component count depends on the loss config: trace one chunk
            # abstractly to size the accumulator
            n_comp = jax.eval_shape(
                lambda: grads_of(jax.tree.map(lambda x: x[0], chunks),
                                 step_rng, aug_rng)[1]).shape[0]
            (g_sum, c_sum), _ = jax.lax.scan(
                body, (zero_g, jnp.zeros((n_comp,), jnp.float32)),
                (chunks, jnp.arange(accum_steps)))
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: (g * inv).astype(g.dtype), g_sum)
            comps = c_sum * inv

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
                architecture: str, mesh=None, accum_steps: int = 1):
    """Returns (train_step, eval_step), both jitted with DP shardings.

    train_step(state, batch, epoch) -> (state, components)
    eval_step(params, batch, epoch) -> (disp0 (tl,bs,H,W), components)
    """
    train_step, eval_step, consts = _make_step_fns(model, ctx, optimizer,
                                                   architecture, accum_steps)

    # Sharding is carried by the *inputs*: `put_batch` commits the batch with
    # its per-leaf NamedShardings and the state is replicated at creation;
    # jit propagates them and inserts the gradient all-reduce over 'data'.
    if mesh is not None:
        from ..parallel.mesh import replicate_pytree
        consts = replicate_pytree(consts, mesh)
    train_jit = jax.jit(train_step, donate_argnums=(0,))
    eval_jit = jax.jit(eval_step)

    # DIS_EXEC_CACHE=<dir>: reuse compiled executables across processes
    # (the per-process XLA compile-cache keys make every fresh process pay
    # its compiles again — utils/execache.py has the measurements)
    from ..utils.execache import CachingJit, cache_dir
    if cache_dir() is not None:
        train_jit = CachingJit(train_jit, f"{architecture}_train")
        eval_jit = CachingJit(eval_jit, f"{architecture}_eval")

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
                    architecture: str, mesh, state, batch: Batch,
                    accum_steps: int = 1):
    """AOT-lower the sharded train step at the given abstract shapes.

    ``state``/``batch`` may be concrete arrays or ShapeDtypeStruct pytrees —
    only shapes/dtypes are used.  Returns the jax ``Lowered`` object so
    callers can ``.compile()`` off-hardware (e.g. the production-shape
    512x432 compile check in __graft_entry__.py) and inspect
    ``memory_analysis()`` without executing anything.
    """
    from ..parallel.mesh import batch_shardings, replicated

    train_step, _, consts = _make_step_fns(model, ctx, optimizer,
                                           architecture, accum_steps)
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
