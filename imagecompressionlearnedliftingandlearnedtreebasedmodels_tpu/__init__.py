"""TPU-native learned wavelet image compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``uberkk/ImageCompressionLearnedLiftingandLearnedTreeBasedModels``
(arXiv:2212.03616): learned lifting-scheme DWTs, per-subband scaling
autoencoders, tree-based (zerotree) and causal-context entropy models, and a
host-side C++ rANS coder fed by TPU-computed CDF tables.

Layout (see SURVEY.md at the repo root for the reference layer map):

- ``config``    typed config schema covering the reference's JSON surface
- ``ops``       transforms: fixed CDF 9/7 DWT, learned lifting, GDN, masked
                convs, color transforms (reference L5a)
- ``entropy``   factorized bottleneck, conditional Gaussian, subband entropy
                models (reference L5b)
- ``coding``    host C++ rANS / range coding and bitstream assembly
                (reference: compressai.ans, range_coder native deps)
- ``models``    codec graphs and post-processing networks (reference L4)
- ``train``     losses, data pipeline, train/validate/test drivers
                (reference L2/L3/L6/L7)
- ``parallel``  mesh construction, data-parallel train step, spatial tiling
                (new: the reference has no distributed execution)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
