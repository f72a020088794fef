"""Multi-chip execution: mesh construction, data parallelism, spatial tiling.

The reference has no distributed execution at all (SURVEY.md section 2.4:
single pinned GPU, CPU for test mode). This package is the TPU-native
replacement: ``jax.sharding.Mesh`` + jit with ``NamedSharding`` so XLA
inserts psum/all-gather collectives over ICI.
"""

from . import mesh  # noqa: F401
