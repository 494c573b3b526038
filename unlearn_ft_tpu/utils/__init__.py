from . import estimation, snr, arch  # noqa: F401
