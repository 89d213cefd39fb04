"""Shared IO helpers for source/sink operators.

Sink keys write real files and read them back (that round trip IS the
operator under test), so they need a scratch area: ``.artifacts/<sf>/``
inside the repo (gitignored). Paths are deterministic per (sf, name) and
every writer uses mode=overwrite, so repeated runs are idempotent.
"""

from __future__ import annotations

import os

_ARTIFACT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".artifacts")


def artifact_path(sf_dir: str, name: str) -> str:
    """Scratch path for a sink artifact, unique per scale factor."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "default"
    path = os.path.join(_ARTIFACT_ROOT, sf, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path
