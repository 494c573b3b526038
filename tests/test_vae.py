import jax
import jax.numpy as jnp

from unlearn_ft_tpu.models.vae import AutoencoderKL, VAEConfig


def test_vae_shapes_and_roundtrip():
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]

    z = vae.apply({"params": params}, x, jax.random.PRNGKey(3), method=vae.encode)
    assert z.shape == (1, 8, 8, 4)  # one downsample stage => f2

    mean, logvar = vae.apply({"params": params}, x, method=vae.encode_moments)
    assert mean.shape == z.shape and logvar.shape == z.shape

    rec = vae.apply({"params": params}, z, method=vae.decode)
    assert rec.shape == x.shape
    assert jnp.isfinite(rec).all()

    # encode is deterministic given the rng key
    z2 = vae.apply({"params": params}, x, jax.random.PRNGKey(3), method=vae.encode)
    assert (z == z2).all()
