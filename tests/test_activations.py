"""Gated activation variants (reference pdm/models/activations.py:
GatedGELU / GatedApproximateGELU / GatedGEGLU / GatedSwiGLU inside
GatedFeedForward). Each applies the grouped neuron gate to the hidden
half(s) before the elementwise nonlinearity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.models.attention import FeedForward

DIM, INNER, GW = 8, 16, 4


@pytest.mark.parametrize("act", ["geglu", "gelu", "gelu-approximate", "swiglu"])
def test_ff_activation_variants_forward_and_gate(act):
    ff = FeedForward(dim_out=DIM, inner_dim=INNER, gate_width=GW, activation_fn=act)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, DIM))
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    y = ff.apply({"params": params}, x)
    assert y.shape == (2, 3, DIM)
    assert jnp.isfinite(y).all()

    # all-ones gate == ungated (gates are [B, gate_width] forward inputs)
    ones = jnp.ones((2, GW))
    y1 = ff.apply({"params": params}, x, ones)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y), rtol=1e-6)

    # zero gate kills the hidden path: output is the (constant) net_2 bias
    zeros = jnp.zeros((2, GW))
    y0 = ff.apply({"params": params}, x, zeros)
    bias = params["net_2"]["bias"]
    np.testing.assert_allclose(
        np.asarray(y0), np.broadcast_to(np.asarray(bias), y0.shape), atol=1e-6
    )

    # partial gate differs from both
    half = jnp.tile(jnp.array([1.0, 0.0, 1.0, 0.0]), (2, 1))
    yh = ff.apply({"params": params}, x, half)
    assert not np.allclose(np.asarray(yh), np.asarray(y))
    assert not np.allclose(np.asarray(yh), np.asarray(y0))


def test_gelu_variants_math():
    """The three non-GLU projections produce proj->nonlinearity exactly."""
    from unlearn_ft_tpu.models.attention import GELU, ApproximateGELU

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, DIM))
    for mod, fn in [
        (GELU(INNER, GW), lambda h: jax.nn.gelu(h, approximate=False)),
        (GELU(INNER, GW, approximate="tanh"), lambda h: jax.nn.gelu(h, approximate=True)),
        (ApproximateGELU(INNER, GW), lambda h: h * jax.nn.sigmoid(1.702 * h)),
    ]:
        p = mod.init(jax.random.PRNGKey(3), x)["params"]
        h = x @ p["proj"]["kernel"] + p["proj"]["bias"]
        np.testing.assert_allclose(
            np.asarray(mod.apply({"params": p}, x)), np.asarray(fn(h)),
            rtol=1e-5, atol=1e-6,
        )
