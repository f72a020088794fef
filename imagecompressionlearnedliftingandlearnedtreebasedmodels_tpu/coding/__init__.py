"""Host-side entropy coding: C++ rANS, CDF tables, bitstream assembly."""

from . import rans  # noqa: F401
