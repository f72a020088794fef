"""Experiment CLI (reference L0, ``main.py``).

Usage::

    python -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.cli config.json

Dispatches the agent named by ``config.agent`` and expands
``multi_agent``/``multi_param`` sweeps into one full run per value
(reference ``main.py:17-32``).
"""

from __future__ import annotations

import sys

from .config import expand_sweep, process_config
from .registry import get_agent


def run_agent(cfg):
    agent_cls = get_agent(cfg.agent)
    agent = agent_cls(cfg)
    try:
        agent.run()
    finally:
        agent.finalize()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print(__doc__)
        return 2
    cfg = process_config(argv[0])
    for sub in expand_sweep(cfg):
        run_agent(sub)
    return 0


if __name__ == "__main__":
    sys.exit(main())
