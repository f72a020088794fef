"""String-keyed component registries.

The reference wires components by importing every class of every module into
package namespaces and looking them up with ``globals()[config.agent]``
(reference ``agents/__init__.py:6-10``, ``main.py:30``). Here registration is
explicit — same string-keyed capability, no import-time magic.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

_AGENTS: Dict[str, Callable] = {}


def register_agent(name: str):
    def deco(cls):
        _AGENTS[name] = cls
        return cls
    return deco


def get_agent(name: str):
    if name not in _AGENTS:
        # lazy import of built-ins to avoid heavy imports at config time
        from .train.loop import LiftingDWTAgent
        _AGENTS.setdefault("LiftingBasedDWTAgent", LiftingDWTAgent)
        _AGENTS.setdefault("CompressionAgent", LiftingDWTAgent)
    if name not in _AGENTS:
        raise KeyError(f"unknown agent {name!r}; known: {sorted(_AGENTS)}")
    return _AGENTS[name]
