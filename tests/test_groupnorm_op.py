import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unlearn_ft_tpu.ops.groupnorm import group_norm_silu


def test_group_norm_silu_matches_flax():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    s = jax.random.normal(jax.random.PRNGKey(1), (16,))
    b = jax.random.normal(jax.random.PRNGKey(2), (16,))
    got = group_norm_silu(x, s, b, 4, 1e-5)
    ref = nn.silu(nn.GroupNorm(4, epsilon=1e-5).apply({"params": {"scale": s, "bias": b}}, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g1 = jax.grad(lambda v: group_norm_silu(v, s, b, 4, 1e-5).sum())(x)
    g2 = jax.grad(
        lambda v: nn.silu(
            nn.GroupNorm(4, epsilon=1e-5).apply({"params": {"scale": s, "bias": b}}, v)
        ).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
