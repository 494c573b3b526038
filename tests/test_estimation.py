import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.utils import estimation as est


def test_hard_concrete_threshold_and_ste():
    x = jnp.array([[0.1, 0.5, 0.9, 0.49999]])
    h = est.hard_concrete(x)
    np.testing.assert_allclose(h, [[0.0, 1.0, 1.0, 0.0]])
    # straight-through: gradient of sum(hard_concrete(x)) wrt x is all-ones
    g = jax.grad(lambda v: est.hard_concrete(v).sum())(x)
    np.testing.assert_allclose(g, np.ones_like(x))


def test_gumbel_sigmoid_range_and_determinism():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((4, 8))
    y1 = est.gumbel_sigmoid_sample(key, logits, temperature=0.4, offset=2.0)
    y2 = est.gumbel_sigmoid_sample(key, logits, temperature=0.4, offset=2.0)
    assert y1.shape == (4, 8)
    assert ((y1 >= 0) & (y1 <= 1)).all()
    np.testing.assert_array_equal(y1, y2)  # fixed key => deterministic (eval mode)


def test_force_width_non_zero():
    key = jax.random.PRNGKey(1)
    logits = jnp.full((6, 8), -100.0)  # everything hard-off
    y = est.gumbel_sigmoid_sample(key, logits, 0.4, force_width_non_zero=True)
    alive = est.hard_concrete(y).sum(axis=1)
    assert (alive > 0).all()


def test_importance_gumbel_ordered():
    # flipped-cumsum construction: earlier positions carry more cumulative
    # mass, so averaged over keys, gate means must be non-increasing.
    logits = jnp.zeros((1, 6))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    samples = jax.vmap(
        lambda k: est.importance_gumbel_softmax_sample(k, logits, 0.4, offset=0.0)
    )(keys)
    mean = samples.mean(axis=0)[0]
    assert mean[0] > mean[-1]
    diffs = np.diff(np.asarray(mean))
    assert (diffs < 0.05).all()  # non-increasing up to MC noise
