"""Training runtime: losses, data, state, agent loop, checkpointing."""

from . import loss  # noqa: F401
