import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.data import filter_dataset_by_expert
from unlearn_ft_tpu.models.hypernet import HyperStructure
from unlearn_ft_tpu.models.quantizer import QuantizerConfig
from unlearn_ft_tpu.utils.arch import unet_gate_layout


def test_filter_dataset_by_expert_partitions():
    layout = unet_gate_layout(
        down_block_types=("CrossAttnDownBlock2DHalfGated",),
        mid_block_type="UNetMidBlock2DCrossAttnWidthGated",
        up_block_types=("CrossAttnUpBlock2DHalfGated",),
        num_attention_heads=(2,),
        layers_per_block=2,
        ff_gate_width=4,
        resnet_groups=4,
    )
    hn = HyperStructure(layout, input_dim=16)
    hparams = hn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    qcfg = QuantizerConfig(layout=layout, n_e=4)
    qparams = qcfg.init_params(jax.random.PRNGKey(1))
    qstate = qcfg.init_state(qparams)

    emb = np.random.default_rng(0).standard_normal((300, 16)).astype(np.float32)
    masks = [
        filter_dataset_by_expert(emb, hn, hparams, qcfg, qparams, qstate, e, batch_size=128)
        for e in range(4)
    ]
    total = np.stack(masks).sum(axis=0)
    # every caption routed to exactly one expert
    np.testing.assert_array_equal(total, np.ones(300))
    # assignment is deterministic
    m0b = filter_dataset_by_expert(emb, hn, hparams, qcfg, qparams, qstate, 0, batch_size=128)
    np.testing.assert_array_equal(masks[0], m0b)
