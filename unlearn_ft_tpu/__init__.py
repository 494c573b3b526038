"""unlearn_ft_tpu — TPU-native (JAX/XLA/Pallas) rebuild of rezashkv/unlearn-ft.

A from-scratch framework for prompt-adaptive structural pruning (APTP),
expert fine-tuning, and bilevel concept-suppression fine-tuning of
diffusion models, designed TPU-first:

- models are Flax module trees with static shapes (NHWC layout),
- pruning gates are mask inputs to one compiled graph (no per-expert recompiles),
- materialized pruning is a host-side pytree slicing transform,
- training steps are pure jitted functions sharded over a `jax.sharding.Mesh`,
- hot ops (attention, GroupNorm+SiLU) have Pallas TPU kernels.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
