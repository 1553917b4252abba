"""Approximate quantile tests vs numpy exact quantiles."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.stats import approx_quantile, approx_quantile_rows


def test_approx_quantile_close_to_exact():
    rng = np.random.default_rng(0)
    x = rng.gamma(2.0, 1.0, (300, 400)).astype(np.float32)
    for q in (0.5, 0.7, 0.95, 0.98):
        approx = float(approx_quantile(jnp.asarray(x), q, bins=512))
        exact = float(np.quantile(x, q))
        assert abs(approx - exact) < (x.max() / 512) * 2 + 1e-6, (q, approx, exact)


def test_approx_quantile_masked():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 4000).astype(np.float32)
    mask = x > 0
    approx = float(
        approx_quantile(jnp.asarray(x), 0.95, bins=512, lo=0.0,
                        mask=jnp.asarray(mask))
    )
    exact = float(np.quantile(x[mask], 0.95))
    assert abs(approx - exact) < 0.05


def test_approx_quantile_rows():
    rng = np.random.default_rng(2)
    x = rng.random((64, 500)).astype(np.float32) * 1.2
    approx = np.asarray(
        approx_quantile_rows(jnp.asarray(x), 0.7, bins=64, lo=0.0, hi=1.2)
    )
    exact = np.quantile(x, 0.7, axis=1)
    assert np.abs(approx - exact).max() < 1.2 / 64 * 2


def test_degenerate_constant_field():
    x = jnp.zeros((32, 32))
    v = float(approx_quantile(x, 0.98))
    assert 0.0 <= v < 1e-6 + 1e-9
