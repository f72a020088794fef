"""Entropy models: factorized bottleneck, conditional Gaussian, subband models."""

from . import bottleneck, gaussian, models  # noqa: F401
