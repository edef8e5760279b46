"""Per-invocation scratch directories for driver-gated queries that build
real on-disk state (versioned PqDBs, bucketed tables, layout rewrites).

One per-process root per query name — wiped once, at first use in the
process, to clear stale prior-process leftovers — with a distinct
counter-suffixed subdir per INVOCATION. Earlier invocations' directories
stay on disk for the life of the process, so a harness that holds two lazy
reads of the same query and executes them out of order still reads intact
data: no execute-before-reinvoke assumption. Growth is bounded by
invocations per process (gate state is fixture-sized).

Retention policy: per-invocation subdirs are NEVER reaped during the
owning process's lifetime — correctness (out-of-order lazy execution)
beats disk in a test/bench process whose gate state is a few MB. OTHER
processes' trees are garbage the moment their pid dies, and nothing else
ever deletes them — so the FIRST ``fresh_dir`` of each process sweeps
``pqdb_gate_<pid>`` trees whose pid is no longer alive (a persistent /tmp
on a CI/bench host would otherwise accumulate one tree per run, forever).
A long-lived session embedding this package should additionally call
``reap()`` at its own quiescent points — when no gate-query frame from
this process can still be executed.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

_invocations = itertools.count()
_wiped_roots: set[str] = set()
_swept_dead_peers = False


def _sweep_dead_peer_trees() -> None:
    """Once per process: delete pqdb_gate_<pid> trees owned by dead pids."""
    global _swept_dead_peers
    if _swept_dead_peers:
        return
    _swept_dead_peers = True
    prefix = os.path.join(tempfile.gettempdir(), "pqdb_gate_")
    import glob

    for tree in glob.glob(prefix + "*"):
        pid_part = os.path.basename(tree)[len("pqdb_gate_"):]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        try:
            os.kill(int(pid_part), 0)  # alive? (signal 0 = probe only)
        except ProcessLookupError:
            shutil.rmtree(tree, ignore_errors=True)
        except PermissionError:
            pass  # alive, different user — not ours to touch


def fresh_dir(name: str) -> str:
    """A unique scratch dir for one invocation of gate query ``name``."""
    _sweep_dead_peer_trees()
    root = os.path.join(tempfile.gettempdir(), f"pqdb_gate_{os.getpid()}", name)
    if root not in _wiped_roots:
        shutil.rmtree(root, ignore_errors=True)
        _wiped_roots.add(root)
    base = os.path.join(root, str(next(_invocations)))
    os.makedirs(base, exist_ok=True)
    return base


def reap() -> None:
    """Delete THIS process's entire scratch tree and forget the wipe records,
    so the next ``fresh_dir`` starts clean. For long-lived embedding sessions
    only — every DataFrame previously returned by a gate query becomes
    unreadable, so call it only when none can still be executed."""
    shutil.rmtree(os.path.join(tempfile.gettempdir(), f"pqdb_gate_{os.getpid()}"), ignore_errors=True)
    _wiped_roots.clear()
