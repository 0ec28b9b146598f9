"""Census loss: scan-based fwd/bwd vs oracle and vs torch oracle."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from depthinspace_tpu.ops import census_sad, census_sad_oracle
from depthinspace_tpu.ops.census import photometric_dissimilarity


def torch_census_oracle(es, ta, block_size, loss_type, eps):
    """Port of reference photometric_loss_pytorch
    (model/ext_functions.py:156-183)."""
    es = torch.from_numpy(es[:, None])
    ta = torch.from_numpy(ta[:, None])
    p = block_size // 2
    es_pad = torch.nn.functional.pad(es, (p, p, p, p), mode="replicate")
    ta_pad = torch.nn.functional.pad(ta, (p, p, p, p), mode="replicate")
    es_uf = torch.nn.functional.unfold(es_pad, kernel_size=block_size)
    ta_uf = torch.nn.functional.unfold(ta_pad, kernel_size=block_size)
    es_uf = es_uf.view(es.shape[0], es.shape[1], -1, es.shape[2], es.shape[3])
    ta_uf = ta_uf.view(ta.shape[0], ta.shape[1], -1, ta.shape[2], ta.shape[3])
    if loss_type in ("census_mse", "census_sad"):
        des = es_uf - es.unsqueeze(2)
        dta = ta_uf - ta.unsqueeze(2)
        h_des = 0.5 * (1 + des / torch.sqrt(des * des + eps))
        h_dta = 0.5 * (1 + dta / torch.sqrt(dta * dta + eps))
        diff = h_des - h_dta
        ref = diff * diff if loss_type == "census_mse" else torch.abs(diff)
    elif loss_type == "mse":
        ref = (es_uf - ta_uf) ** 2
    else:
        ref = torch.abs(es_uf - ta_uf)
    ref = ref.view(es.shape[0], -1, es.shape[2], es.shape[3])
    ref = torch.sum(ref, dim=1, keepdim=True) / block_size ** 2
    return ref[:, 0].numpy()


def _inputs(n=2, h=13, w=15, seed=0):
    rng = np.random.RandomState(seed)
    es = rng.randn(n, h, w).astype(np.float32)
    ta = rng.randn(n, h, w).astype(np.float32)
    return es, ta


def test_oracle_matches_torch():
    es, ta = _inputs()
    for bs in (3, 9):
        ours = np.asarray(census_sad_oracle(jnp.asarray(es), jnp.asarray(ta),
                                            block_size=bs, eps=0.5))
        ref = torch_census_oracle(es, ta, bs, "census_sad", 0.5)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_all_loss_types_match_torch():
    es, ta = _inputs(seed=3)
    for lt in ("mse", "sad", "census_mse", "census_sad"):
        ours = np.asarray(photometric_dissimilarity(
            jnp.asarray(es), jnp.asarray(ta), 9, lt, 0.5))
        ref = torch_census_oracle(es, ta, 9, lt, 0.5)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_scan_forward_matches_oracle():
    es, ta = _inputs(seed=1)
    a = np.asarray(census_sad(jnp.asarray(es), jnp.asarray(ta), 9, 0.5))
    b = np.asarray(census_sad_oracle(jnp.asarray(es), jnp.asarray(ta), 9, 0.5))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff_of_oracle():
    es, ta = _inputs(n=1, h=10, w=12, seed=2)
    g = np.random.RandomState(5).randn(1, 10, 12).astype(np.float32)

    def loss_custom(e):
        return jnp.sum(census_sad(e, jnp.asarray(ta), 9, 0.5) * g)

    def loss_oracle(e):
        return jnp.sum(census_sad_oracle(e, jnp.asarray(ta), 9, 0.5) * g)

    g_custom = jax.grad(loss_custom)(jnp.asarray(es))
    g_oracle = jax.grad(loss_oracle)(jnp.asarray(es))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_oracle),
                               rtol=1e-4, atol=1e-5)
