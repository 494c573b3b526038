from .optim import make_optimizer, make_lr_schedule  # noqa: F401
