"""Codec graphs: transforms, entropy-model bindings, post-processing nets."""

from . import transforms  # noqa: F401
