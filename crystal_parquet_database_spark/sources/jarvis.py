"""JARVIS figshare fetch helper (reference: crystpqdb/loaders/jarvis.py:43-60).

Parity note: the reference's jarvis module is import-broken upstream (its 40
loader classes are commented out of the reference factory), so there is no
loader behavior to reproduce — but its ``_download`` body (figshare fetch via
``jarvis.db.figshare.data`` + unzip-and-remove) is working code, mirrored
here as a standalone helper. The ``jarvis-tools`` package is optional: the
fetch is import-gated, while the unzip step is plain stdlib and testable
offline.

If the upstream loaders are ever fixed, register a ``BaseLoader`` subclass
for ("jarvis", <dataset>) in ``sources.factory`` and feed it from this
helper; until then the factory intentionally omits jarvis (factory.py).
"""

from __future__ import annotations

import zipfile
from pathlib import Path


def unzip_all(dirpath: Path | str, remove_archives: bool = True) -> list[Path]:
    """Extract every ``*.zip`` in ``dirpath`` in place (reference
    jarvis.py:52-60). Returns the extracted archive paths."""
    dirpath = Path(dirpath)
    done: list[Path] = []
    for zip_path in sorted(dirpath.glob("*.zip")):
        with zipfile.ZipFile(zip_path, "r") as zf:
            zf.extractall(dirpath)
        if remove_archives:
            try:
                zip_path.unlink()
            except OSError:
                pass
        done.append(zip_path)
    return done


def fetch_jarvis_dataset(dataset: str, store_dir: Path | str) -> Path:
    """Download a JARVIS figshare dataset into ``store_dir`` and unzip any
    archives (reference jarvis.py:43-60). Requires the optional public
    ``jarvis-tools`` package; raises ImportError with guidance otherwise."""
    try:
        from jarvis.db.figshare import data as jarvis_data
    except ImportError as e:  # pragma: no cover - package absent in CI
        raise ImportError(
            "fetch_jarvis_dataset requires the optional 'jarvis-tools' package "
            "(pip install jarvis-tools); only the figshare fetch needs it — "
            "unzip_all and everything downstream are dependency-free"
        ) from e

    store_dir = Path(store_dir)
    store_dir.mkdir(parents=True, exist_ok=True)
    jarvis_data(str(dataset), store_dir=str(store_dir))
    unzip_all(store_dir)
    return store_dir
