import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.utils.arch import GateLayout, sd21_gate_layout


def test_sd21_layout_counts():
    layout = sd21_gate_layout()
    # 70 width gates, 14 depth gates (3 CrossAttnDownHalf x2 + DownHalf x1
    # + UpHalf x1 + 3 CrossAttnUpHalf x2), derived from the reference's
    # HalfGated block classes.
    assert len(layout.width_list) == 70
    assert layout.num_depth == 14
    assert layout.num_width == 1606
    assert layout.total_dim == 1620


def test_sd21_first_block_structure():
    layout = sd21_gate_layout()
    b0 = layout.blocks[0]
    assert [list(s.widths) for s in b0.submodules] == [[32], [32], [5, 5, 32], [5, 5, 32]]
    assert [s.depth for s in b0.submodules] == [0, 1, 0, 1]
    mid = layout.blocks[4]
    assert mid.name == "UNetMidBlock2DCrossAttnWidthGated"
    assert [list(s.widths) for s in mid.submodules] == [[32], [32], [20, 20, 32]]
    assert [s.depth for s in mid.submodules] == [0, 0, 0]
    up0 = layout.blocks[5]
    assert [list(s.widths) for s in up0.submodules] == [[32], [32], [32]]
    assert [s.depth for s in up0.submodules] == [0, 0, 1]


def test_split_merge_roundtrip():
    layout = sd21_gate_layout()
    key = jax.random.PRNGKey(0)
    flat = jax.random.uniform(key, (3, layout.total_dim))
    s = layout.split(flat)
    assert len(s.width) == 70 and len(s.depth) == 14
    assert s.width[0].shape == (3, 32)
    assert s.depth[0].shape == (3,)
    np.testing.assert_allclose(layout.merge(s), flat)


def test_split_per_block_consistent():
    layout = sd21_gate_layout()
    flat = jnp.arange(2 * layout.total_dim, dtype=jnp.float32).reshape(2, -1)
    s = layout.split(flat)
    per_block = layout.split_per_block(s)
    assert len(per_block) == 9
    total_w = sum(len(pb.width) for pb in per_block)
    total_d = sum(len(pb.depth) for pb in per_block)
    assert total_w == 70 and total_d == 14
    # first block gets the first 4 width gates in order
    np.testing.assert_array_equal(per_block[0].width[0], s.width[0])


def test_json_roundtrip():
    layout = sd21_gate_layout()
    restored = GateLayout.from_json(layout.to_json())
    assert restored == layout


def test_random_arch_vector():
    layout = sd21_gate_layout()
    v = layout.random_arch_vector(0.5, seed=0)
    assert v.shape == (1, layout.total_dim)
    s = layout.split(jnp.asarray(v))
    kept = (s.width[0] > 0.5).sum()
    assert kept == 16  # half of 32
