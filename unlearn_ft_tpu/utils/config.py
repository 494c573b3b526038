"""Config system: YAML files with attribute access + argparse overlay.

Mirrors the reference's OmegaConf schema and parse_args
(pdm/utils/arg_utils.py:5-133; scripts/aptp/finetune.py:19-45 merges
``config.update(vars(args))``) so the shipped reference YAMLs carry over
unchanged — without depending on omegaconf (not in this image).
"""
from __future__ import annotations

import argparse
import copy
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """dict with recursive attribute access and deep merge."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj: Any) -> Any:
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def merge(self, other: Dict) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                self[k].merge(v)
            else:
                self[k] = Config.wrap(v)
        return self

    def get_path(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def to_dict(self) -> Dict:
        return {
            k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
        }

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def copy(self) -> "Config":
        return Config.wrap(copy.deepcopy(self.to_dict()))


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.wrap(yaml.safe_load(f))


def parse_args(argv: Optional[list] = None) -> argparse.Namespace:
    """CLI surface of the reference's parse_args (arg_utils.py:5-133)."""
    p = argparse.ArgumentParser(description="unlearn_ft_tpu training")
    p.add_argument("--base_config_path", type=str, required=True)
    p.add_argument(
        "--pretrained_model_name_or_path", type=str,
        default="stabilityai/stable-diffusion-2-1",
    )
    p.add_argument("--pruning_ckpt_dir", type=str, default=None)
    p.add_argument("--expert_id", type=int, default=None)
    p.add_argument(
        "--pruning_type", type=str, default="multi-expert",
        choices=["multi-expert", "single-expert"],
    )
    p.add_argument("--erasure_ckpt_path", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument(
        "--mpnet_model", type=str, default="sentence-transformers/all-mpnet-base-v2"
    )
    p.add_argument("--wandb_run_name", type=str, default=None)
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    p.add_argument("--num_devices", type=int, default=None)
    return p.parse_args(argv)


def build_config(argv: Optional[list] = None) -> Config:
    args = parse_args(argv)
    config = load_config(args.base_config_path)
    config.merge({k: v for k, v in vars(args).items()})
    return config


def resolve_model_type(config) -> str:
    """sd | sdxl | flux from `model.type`, inferred from the config shape
    when absent: a `flux_config` block selects flux; an SDXL text_time
    U-Net (or a second text-encoder config) selects sdxl."""
    g = config.get_path
    mt = g("model.type")
    if mt:
        return str(mt)
    if g("model.prediction_model.flux_config"):
        return "flux"
    unet_cfg = g("model.prediction_model.unet_config") or {}
    if (unet_cfg.get("addition_embed_type") == "text_time"
            or g("model.text_encoder_2_config")):
        return "sdxl"
    return "sd"
