"""Census-transform photometric dissimilarity (the hot-path kernel).

The reference's only native op on the training hot path is
``ext_cuda.photometric_loss_forward/backward`` — a per-pixel BxB
census(-SAD/MSE) / SAD / MSE patch dissimilarity between the projected
pattern and the IR image with a hand-written CUDA backward (reference
model/ext_functions.py:115-154, called with block=9, census_sad, eps=0.5
from model/networks.py:372).  The reference keeps a pure-PyTorch oracle
(model/ext_functions.py:156-183); ``census_sad_oracle`` below is the jnp
port of that math and serves as the correctness reference.

Math (census, soft-Heaviside):
  d_es(p, o) = es(p + o) - es(p)  for every offset o in the BxB window
  (replicate padding at image borders)
  h(d)       = 0.5 * (1 + d / sqrt(d^2 + eps))
  out(p)     = sum_o |h(d_es(p,o)) - h(d_ta(p,o))| / B^2          (census_sad)

TPU-first design
----------------
``census_sad`` is a ``jax.custom_vjp`` whose forward and backward are
O(1)-memory scans over the B^2 offsets (the naive formulation would
materialize an (N, H, W, 81) tensor — 2.8 GB at the training shape).  The
backward is the hand-derived adjoint:

  dh/dd = 0.5 * eps * (d^2 + eps)^{-3/2}
  delta(p,o) = sign(h_es - h_ta)(p,o) * dh/dd(d_es(p,o)) * g(p) / B^2
  grad_es_pad(p + o) += delta(p,o);   grad_es(p) -= sum_o delta(p,o)

followed by folding the replicate-padding margins back onto the border
pixels (the adjoint of 'edge' padding).  Like the reference CUDA op, the
backward produces gradients only for ``es`` (the projected pattern, through
which gradients flow into the disparity); ``ta`` receives zeros
(reference model/ext_functions.py:140 returns None for ta).

A fused Pallas kernel implementing the same contract lives in
``depthinspace_tpu.ops.pallas.census_kernel`` and is used on TPU; this module
is the portable reference path and the numerical ground truth for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _soft_heaviside(d: jax.Array, eps: float) -> jax.Array:
    return 0.5 * (1.0 + d * lax.rsqrt(d * d + eps))


def _pad_edge(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="edge")


@partial(jax.jit, static_argnums=(2, 3))
def census_sad_oracle(es: jax.Array, ta: jax.Array,
                      block_size: int = 9, eps: float = 0.5) -> jax.Array:
    """Direct (memory-heavy) formulation; use only on small inputs / tests.

    es, ta: (N, H, W). Returns (N, H, W).
    Port of reference photometric_loss_pytorch (model/ext_functions.py:156-183)
    for type='census_sad'.
    """
    N, H, W = es.shape
    p = block_size // 2
    es_pad = _pad_edge(es, p)
    ta_pad = _pad_edge(ta, p)
    es_uf = jnp.stack([es_pad[:, dy:dy + H, dx:dx + W]
                       for dy in range(block_size) for dx in range(block_size)],
                      axis=-1)
    ta_uf = jnp.stack([ta_pad[:, dy:dy + H, dx:dx + W]
                       for dy in range(block_size) for dx in range(block_size)],
                      axis=-1)
    h_es = _soft_heaviside(es_uf - es[..., None], eps)
    h_ta = _soft_heaviside(ta_uf - ta[..., None], eps)
    return jnp.abs(h_es - h_ta).sum(-1) / block_size ** 2


def _unpad_edge_adjoint(g_pad: jax.Array, p: int) -> jax.Array:
    """Adjoint of jnp.pad(mode='edge'): fold padded margins onto the border."""
    # rows
    core = g_pad[:, p:-p, :]
    core = core.at[:, 0, :].add(g_pad[:, :p, :].sum(axis=1))
    core = core.at[:, -1, :].add(g_pad[:, -p:, :].sum(axis=1))
    # cols
    out = core[:, :, p:-p]
    out = out.at[:, :, 0].add(core[:, :, :p].sum(axis=2))
    out = out.at[:, :, -1].add(core[:, :, -p:].sum(axis=2))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _census_sad(es: jax.Array, ta: jax.Array,
                block_size: int = 9, eps: float = 0.5) -> jax.Array:
    """Census-SAD patch dissimilarity map, O(1) extra memory.

    es, ta: (N, H, W) float32. Returns (N, H, W).
    """
    return _census_fwd_impl(es, ta, block_size, eps)


def _census_fwd_impl(es, ta, block_size, eps):
    shape = es.shape
    p = block_size // 2
    es_pad = _pad_edge(es, p)
    ta_pad = _pad_edge(ta, p)

    def body(acc, o):
        dy = o // block_size
        dx = o % block_size
        es_o = lax.dynamic_slice(es_pad, (0, dy, dx), shape)
        ta_o = lax.dynamic_slice(ta_pad, (0, dy, dx), shape)
        h_es = _soft_heaviside(es_o - es, eps)
        h_ta = _soft_heaviside(ta_o - ta, eps)
        return acc + jnp.abs(h_es - h_ta), None

    acc, _ = lax.scan(body, jnp.zeros_like(es),
                      jnp.arange(block_size ** 2, dtype=jnp.int32))
    return acc / block_size ** 2


def _census_fwd(es, ta, block_size, eps):
    return _census_fwd_impl(es, ta, block_size, eps), (es, ta)


def _census_bwd(block_size, eps, res, g):
    es, ta = res
    shape = es.shape
    p = block_size // 2
    es_pad = _pad_edge(es, p)
    ta_pad = _pad_edge(ta, p)
    inv_b2 = 1.0 / block_size ** 2

    def body(carry, o):
        grad_pad, center = carry
        dy = o // block_size
        dx = o % block_size
        es_o = lax.dynamic_slice(es_pad, (0, dy, dx), shape)
        ta_o = lax.dynamic_slice(ta_pad, (0, dy, dx), shape)
        d_es = es_o - es
        h_es = _soft_heaviside(d_es, eps)
        h_ta = _soft_heaviside(ta_o - ta, eps)
        dh = 0.5 * eps * lax.rsqrt(d_es * d_es + eps) / (d_es * d_es + eps)
        delta = jnp.sign(h_es - h_ta) * dh * g * inv_b2
        cur = lax.dynamic_slice(grad_pad, (0, dy, dx), shape)
        grad_pad = lax.dynamic_update_slice(grad_pad, cur + delta, (0, dy, dx))
        return (grad_pad, center + delta), None

    init = (jnp.zeros_like(es_pad), jnp.zeros_like(es))
    (grad_pad, center), _ = lax.scan(
        body, init, jnp.arange(block_size ** 2, dtype=jnp.int32))
    grad_es = _unpad_edge_adjoint(grad_pad, p) - center
    return grad_es, jnp.zeros_like(ta)


_census_sad.defvjp(_census_fwd, _census_bwd)

# Public, jitted entry point (the custom VJP composes with jit).
census_sad = jax.jit(_census_sad, static_argnums=(2, 3))


@partial(jax.jit, static_argnums=(2, 3, 4))
def photometric_dissimilarity(es: jax.Array, ta: jax.Array,
                              block_size: int = 9, loss_type: str = "census_sad",
                              eps: float = 0.5) -> jax.Array:
    """Dispatch matching the reference op's type enum
    (model/ext_functions.py:142-154): mse / sad / census_mse / census_sad.

    Only census_sad is on the default training path; the others are provided
    for API parity and use straightforward jnp formulations.
    """
    loss_type = loss_type.lower()
    if loss_type == "census_sad":
        return census_sad(es, ta, block_size, eps)
    N, H, W = es.shape
    p = block_size // 2
    if loss_type in ("mse", "sad"):
        es_pad = _pad_edge(es, p)
        ta_pad = _pad_edge(ta, p)

        def body(acc, o):
            dy = o // block_size
            dx = o % block_size
            es_o = lax.dynamic_slice(es_pad, (0, dy, dx), es.shape)
            ta_o = lax.dynamic_slice(ta_pad, (0, dy, dx), ta.shape)
            d = es_o - ta_o
            return acc + (d * d if loss_type == "mse" else jnp.abs(d)), None

        acc, _ = lax.scan(body, jnp.zeros_like(es),
                          jnp.arange(block_size ** 2, dtype=jnp.int32))
        return acc / block_size ** 2
    if loss_type == "census_mse":
        es_pad = _pad_edge(es, p)
        ta_pad = _pad_edge(ta, p)

        def body(acc, o):
            dy = o // block_size
            dx = o % block_size
            es_o = lax.dynamic_slice(es_pad, (0, dy, dx), es.shape)
            ta_o = lax.dynamic_slice(ta_pad, (0, dy, dx), ta.shape)
            d = (_soft_heaviside(es_o - es, eps)
                 - _soft_heaviside(ta_o - ta, eps))
            return acc + d * d, None

        acc, _ = lax.scan(body, jnp.zeros_like(es),
                          jnp.arange(block_size ** 2, dtype=jnp.int32))
        return acc / block_size ** 2
    raise ValueError(f"invalid loss type {loss_type!r}")
