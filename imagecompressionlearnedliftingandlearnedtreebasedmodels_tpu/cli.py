"""Experiment CLI (reference L0, ``main.py``).

Usage::

    python -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.cli config.json

Dispatches the agent named by ``config.agent`` and expands
``multi_agent``/``multi_param`` sweeps into one full run per value
(reference ``main.py:17-32``).
"""

from __future__ import annotations

import json
import os
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
    return agent


def _aggregate_results(cfg, agents, experiments_root="experiments"):
    """Per-sweep-value metrics dump (reference ``RDValidLogger.json_log``
    writing ``experiments/<multi_exp_name>/results.json``,
    ``loggers/rate_dist.py:96-114``)."""
    results = {}
    for sub_cfg, agent in agents:
        entry = {"exp_name": sub_cfg.exp_name,
                 str(sub_cfg.multi_param): getattr(sub_cfg,
                                                   sub_cfg.multi_param)}
        entry["best_valid_loss"] = getattr(agent, "best_valid_loss", None)
        results[sub_cfg.exp_name] = entry
    out_dir = os.path.join(experiments_root,
                           cfg.multi_exp_name or cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as fh:
        json.dump(results, fh, indent=2, default=str)


def main(argv=None):
    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print(__doc__)
        return 2
    cfg = process_config(argv[0])
    subs = expand_sweep(cfg)
    agents = [(sub, run_agent(sub)) for sub in subs]
    if cfg.multi_agent:
        _aggregate_results(cfg, agents)
    return 0


if __name__ == "__main__":
    sys.exit(main())
