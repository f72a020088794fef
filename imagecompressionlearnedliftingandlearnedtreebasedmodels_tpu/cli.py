"""Experiment CLI (reference L0, ``main.py``).

Usage::

    python -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.cli [--supervise] config.json

Dispatches the agent named by ``config.agent`` and expands
``multi_agent``/``multi_param`` sweeps into one full run per value
(reference ``main.py:17-32``).

``--supervise`` wraps the whole run in the liveness supervisor
(``train/supervisor.py``): the run is restarted from its checkpoints if
the process crashes or wedges on a dropped accelerator transport.  The
optional ``--stall-timeout`` (seconds, default 900) sets how long the
training heartbeat may go quiet before the run is declared wedged.
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
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--supervise" in argv:
        # re-exec this CLI (without the flag) under the liveness
        # supervisor; resume_training is forced on so restarted attempts
        # continue from the run's checkpoints instead of starting over
        argv.remove("--supervise")
        stall = 900.0
        if "--stall-timeout" in argv:
            i = argv.index("--stall-timeout")
            stall = float(argv[i + 1])
            del argv[i:i + 2]
        from .train.supervisor import supervise
        return supervise(
            [sys.executable, "-m", __spec__.name if __spec__ else __name__,
             "--resume-training"] + argv, timeout=stall)
    resume_override = "--resume-training" in argv
    if resume_override:
        argv.remove("--resume-training")
    # Programmatic platform override: this deployment's site customization
    # pins the accelerator platform programmatically, so the plain
    # JAX_PLATFORMS env var is ineffective for re-exec'd children (e.g.
    # the supervised path above). LIFTING_TPU_PLATFORM=cpu forces the
    # backend before any jax use.
    platform = os.environ.get("LIFTING_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if len(argv) != 1:
        print(__doc__)
        return 2
    cfg = process_config(argv[0])
    if resume_override:
        cfg.resume_training = True
    subs = expand_sweep(cfg)
    agents = [(sub, run_agent(sub)) for sub in subs]
    if cfg.multi_agent:
        _aggregate_results(cfg, agents)
    return 0


if __name__ == "__main__":
    sys.exit(main())
