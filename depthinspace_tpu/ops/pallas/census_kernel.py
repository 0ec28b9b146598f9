"""Fused Pallas TPU kernel for the census-SAD photometric dissimilarity.

Replaces the reference's hand-written CUDA op (reference
model/ext_functions.py:115-154: ``photometric_loss_forward/backward``,
census_sad, block 9, eps 0.5) with a TPU kernel that keeps the whole BxB
stencil in VMEM:

- the portable jnp path (ops/census.py) streams 81 shifted slices through
  HBM (~13 GB of traffic per training step at 32x512x432); this kernel
  reads each input image once (~0.1 GB) and runs the 81-offset stencil on
  the VPU from VMEM — the op goes from HBM-bound to compute-bound;
- the backward pass is the same hand-derived adjoint as ops/census.py
  (scatter of the per-offset sensitivities + center correction), realized
  as overlapping read-modify-write updates on a VMEM scratch accumulator;
  the replicate-padding fold-back runs as cheap XLA ops outside the kernel;
- grid is over the batch axis: one (H+2p, W+2p) image pair per program
  (~2.7 MB of VMEM at 512x432 — comfortably within the ~16 MB budget).

Numerics are validated against ops/census.py (which itself matches the
reference's pure-PyTorch oracle) in tests/test_census_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _h(d, eps):
    return 0.5 * (1.0 + d * lax.rsqrt(d * d + eps))


def _fwd_kernel(es_ref, ta_ref, out_ref, *, H, W, B, eps):
    p = B // 2
    es_pad = es_ref[0]
    ta_pad = ta_ref[0]
    es_c = es_pad[p:p + H, p:p + W]
    ta_c = ta_pad[p:p + H, p:p + W]
    acc = jnp.zeros((H, W), jnp.float32)
    for dy in range(B):
        for dx in range(B):
            d_es = es_pad[dy:dy + H, dx:dx + W] - es_c
            d_ta = ta_pad[dy:dy + H, dx:dx + W] - ta_c
            acc += jnp.abs(_h(d_es, eps) - _h(d_ta, eps))
    out_ref[0] = acc * (1.0 / (B * B))


def _bwd_kernel(es_ref, ta_ref, g_ref, gout_ref, scratch, *, H, W, B, eps):
    p = B // 2
    es_pad = es_ref[0]
    ta_pad = ta_ref[0]
    g = g_ref[0]
    es_c = es_pad[p:p + H, p:p + W]
    ta_c = ta_pad[p:p + H, p:p + W]
    scratch[...] = jnp.zeros_like(scratch)
    center = jnp.zeros((H, W), jnp.float32)
    inv_b2 = 1.0 / (B * B)
    for dy in range(B):
        for dx in range(B):
            d_es = es_pad[dy:dy + H, dx:dx + W] - es_c
            d_ta = ta_pad[dy:dy + H, dx:dx + W] - ta_c
            h_diff = _h(d_es, eps) - _h(d_ta, eps)
            q = d_es * d_es + eps
            dh = 0.5 * eps * lax.rsqrt(q) / q
            s = jnp.sign(h_diff) * dh * g * inv_b2
            scratch[dy:dy + H, dx:dx + W] += s
            center += s
    scratch[p:p + H, p:p + W] -= center
    gout_ref[0] = scratch[...]


def _pad_edge(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="edge")


def _unpad_edge_adjoint(g_pad, p):
    core = g_pad[:, p:-p, :]
    core = core.at[:, 0, :].add(g_pad[:, :p, :].sum(axis=1))
    core = core.at[:, -1, :].add(g_pad[:, -p:, :].sum(axis=1))
    out = core[:, :, p:-p]
    out = out.at[:, :, 0].add(core[:, :, :p].sum(axis=2))
    out = out.at[:, :, -1].add(core[:, :, -p:].sum(axis=2))
    return out


def _forward(es, ta, block_size, eps):
    N, H, W = es.shape
    p = block_size // 2
    Hp, Wp = H + 2 * p, W + 2 * p
    es_pad = _pad_edge(es, p)
    ta_pad = _pad_edge(ta, p)
    kernel = partial(_fwd_kernel, H=H, W=W, B=block_size, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
    )(es_pad, ta_pad)


def _backward(es, ta, g, block_size, eps):
    N, H, W = es.shape
    p = block_size // 2
    Hp, Wp = H + 2 * p, W + 2 * p
    es_pad = _pad_edge(es, p)
    ta_pad = _pad_edge(ta, p)
    kernel = partial(_bwd_kernel, H=H, W=W, B=block_size, eps=eps)
    grad_pad = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Hp, Wp), jnp.float32)],
    )(es_pad, ta_pad, g)
    return _unpad_edge_adjoint(grad_pad, p)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _census_sad_pallas(es, ta, block_size=9, eps=0.5):
    return _forward(es, ta, block_size, eps)


def _vjp_fwd(es, ta, block_size, eps):
    return _forward(es, ta, block_size, eps), (es, ta)


def _vjp_bwd(block_size, eps, res, g):
    es, ta = res
    return _backward(es, ta, g, block_size, eps), jnp.zeros_like(ta)


_census_sad_pallas.defvjp(_vjp_fwd, _vjp_bwd)

census_sad_pallas = jax.jit(_census_sad_pallas, static_argnums=(2, 3))


def census_sad_auto(es, ta, block_size=9, eps=0.5):
    """Backend dispatch: Pallas kernel on TPU, scan path elsewhere.

    Like the reference's cuda/cpu split (model/ext_functions.py:122-127),
    both paths implement identical math."""
    from ..census import census_sad
    if jax.default_backend() == "tpu":
        return census_sad_pallas(es, ta, block_size, eps)
    return census_sad(es, ta, block_size, eps)
