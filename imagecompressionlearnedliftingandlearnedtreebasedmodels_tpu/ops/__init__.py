"""Transform-path ops: DWTs, lifting, GDN, masked convs, color, math."""

from . import color, dwt97, math_utils  # noqa: F401
