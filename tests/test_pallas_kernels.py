"""Pallas Gram-kernel tests (interpreter mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.ops.pallas_kernels import rbf_gram_matrix
from morbit_tpu.ops.rbf import RBF_KERNELS, apply_kernel, kernel_default_param


@pytest.mark.parametrize("kernel", RBF_KERNELS)
def test_gram_kernel_matches_xla(kernel):
    rng = np.random.default_rng(0)
    N, n = 24, 5
    sites = jnp.asarray(rng.uniform(0, 1, (N, n)))
    mask = jnp.asarray(rng.random(N) > 0.3)
    param = kernel_default_param(kernel)

    Phi_p = rbf_gram_matrix(sites, mask, kernel, param, interpret=True)

    d = sites[:, None, :] - sites[None, :, :]
    r2 = jnp.sum(d * d, -1)
    Phi_x = jnp.where(mask[:, None] & mask[None, :],
                      apply_kernel(kernel, r2, param),
                      jnp.eye(N, dtype=sites.dtype))
    assert np.allclose(np.asarray(Phi_p), np.asarray(Phi_x), atol=1e-8)


def test_gram_kernel_vmap():
    rng = np.random.default_rng(1)
    B, N, n = 4, 16, 3
    sites = jnp.asarray(rng.uniform(0, 1, (B, N, n)))
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    out = jax.vmap(lambda s, m: rbf_gram_matrix(s, m, "multiquadric", 1.0,
                                                interpret=True))(sites, mask)
    assert out.shape == (B, N, N)
    assert np.all(np.isfinite(np.asarray(out)))
