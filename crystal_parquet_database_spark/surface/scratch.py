"""Per-invocation scratch directories for driver-gated queries that build
real on-disk state (versioned PqDBs, bucketed tables, layout rewrites).

One per-process root per query name — wiped once, at first use in the
process, to clear stale prior-process leftovers — with a distinct
counter-suffixed subdir per INVOCATION. Earlier invocations' directories
stay on disk for the life of the process, so a harness that holds two lazy
reads of the same query and executes them out of order still reads intact
data: no execute-before-reinvoke assumption. Growth is bounded by
invocations per process (gate state is fixture-sized).
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

_invocations = itertools.count()
_wiped_roots: set[str] = set()


def fresh_dir(name: str) -> str:
    """A unique scratch dir for one invocation of gate query ``name``."""
    root = os.path.join(tempfile.gettempdir(), f"pqdb_gate_{os.getpid()}", name)
    if root not in _wiped_roots:
        shutil.rmtree(root, ignore_errors=True)
        _wiped_roots.add(root)
    base = os.path.join(root, str(next(_invocations)))
    os.makedirs(base, exist_ok=True)
    return base
