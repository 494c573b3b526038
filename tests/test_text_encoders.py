"""Golden tests: Flax CLIP/MPNet ports + converters vs HF torch modules
(randomly initialized tiny configs — exact same weights via the converter)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from unlearn_ft_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel  # noqa: E402
from unlearn_ft_tpu.models.mpnet import MPNetConfig, MPNetModel, mean_pool  # noqa: E402
from unlearn_ft_tpu.models.convert import convert_clip_text, convert_mpnet  # noqa: E402


def test_clip_text_matches_hf():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        hidden_act="gelu",
        eos_token_id=99,
        bos_token_id=98,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    ids = torch.tensor([[98, 5, 7, 12, 99, 0, 0, 0], [98, 20, 99, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        out = hf(ids)
    want_hidden = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        hidden_act="gelu",
        eos_token_id=99,
    )
    params = convert_clip_text(hf.state_dict(), num_layers=2)
    got_hidden, got_pooled = CLIPTextModel(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy())
    )
    np.testing.assert_allclose(got_hidden, want_hidden, atol=2e-5)
    np.testing.assert_allclose(got_pooled, want_pooled, atol=2e-5)


def test_mpnet_matches_hf():
    from transformers import MPNetConfig as HFConfig
    from transformers import MPNetModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=50,
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=3,
        intermediate_size=48,
        max_position_embeddings=64,
    )
    torch.manual_seed(1)
    hf = HFModel(hf_cfg).eval()

    ids = torch.tensor([[0, 5, 7, 12, 2, 1, 1, 1], [0, 20, 9, 2, 1, 1, 1, 1]])
    mask = (ids != 1).long()
    with torch.no_grad():
        out = hf(input_ids=ids, attention_mask=mask)
    want = out.last_hidden_state.numpy()

    cfg = MPNetConfig(
        vocab_size=50,
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=3,
        intermediate_size=48,
        max_position_embeddings=64,
    )
    params = convert_mpnet(hf.state_dict(), num_layers=2)
    got = MPNetModel(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())
    )
    # padded positions may differ (HF leaves them unmasked downstream);
    # compare only valid tokens, which is what mean_pool consumes
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], want[m], atol=1e-4)

    pooled = mean_pool(got, jnp.asarray(mask.numpy()))
    want_pooled = (want * mask.numpy()[..., None]).sum(1) / mask.numpy().sum(1, keepdims=True)
    np.testing.assert_allclose(pooled, want_pooled, atol=1e-4)


def test_t5_encoder_matches_hf():
    from transformers import T5Config as HFConfig
    from transformers import T5EncoderModel as HFModel

    from unlearn_ft_tpu.models.convert import convert_t5_encoder
    from unlearn_ft_tpu.models.t5 import T5Config, T5EncoderModel

    hf_cfg = HFConfig(
        vocab_size=60, d_model=24, d_kv=8, num_heads=3, d_ff=48, num_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0, use_cache=False,
    )
    torch.manual_seed(2)
    hf = HFModel(hf_cfg).eval()

    ids = torch.tensor([[5, 7, 12, 9, 1, 0, 0, 0], [20, 9, 1, 0, 0, 0, 0, 0]])
    mask = (ids != 0).long()
    with torch.no_grad():
        want = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    cfg = T5Config(
        vocab_size=60, d_model=24, d_kv=8, num_heads=3, d_ff=48, num_layers=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    params = convert_t5_encoder(hf.state_dict(), num_layers=2)
    got = T5EncoderModel(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())
    )
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], want[m], atol=2e-4)


def test_clip_projection_and_penultimate_match_hf():
    """SDXL text towers: penultimate hidden state (hidden_states[-2]) and
    text_projection pooled output (CLIPTextModelWithProjection)."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection as HFModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=16, hidden_act="gelu",
        eos_token_id=99, bos_token_id=98, projection_dim=20,
    )
    torch.manual_seed(3)
    hf = HFModel(hf_cfg).eval()

    ids = torch.tensor([[98, 5, 7, 12, 99, 0, 0, 0], [98, 20, 99, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        out = hf(ids, output_hidden_states=True)
    want_pooled = out.text_embeds.numpy()
    want_penult = out.hidden_states[-2].numpy()

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=16, hidden_act="gelu",
        eos_token_id=99, projection_dim=20,
    )
    params = convert_clip_text(hf.state_dict(), num_layers=3)
    _, got_pooled, got_penult = CLIPTextModel(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy()), penultimate=True
    )
    np.testing.assert_allclose(got_pooled, want_pooled, atol=2e-5)
    np.testing.assert_allclose(got_penult, want_penult, atol=2e-5)
