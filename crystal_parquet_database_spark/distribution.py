"""Dataset distribution via the Hugging Face Hub (reference parity: A20,
crystpqdb/download.py:11-39).

The artifact is a directory of plain Parquet files either way, so the Spark
engine consumes a downloaded snapshot directly with ``spark.read.parquet`` —
no conversion step. Both functions are driver-side utilities and import-gated
(huggingface_hub is not in this container)."""

from __future__ import annotations

import os


def download(dirpath: str, repo_id: str = "lllangWV/CrystPQDB") -> str:
    """Snapshot-download a dataset repo into ``dirpath``
    (reference: download.py:11-18)."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise ImportError("huggingface_hub is required for dataset download") from e
    return snapshot_download(
        repo_id=repo_id, repo_type="dataset", local_dir=dirpath
    )


def upload(db_path: str, repo_id: str, max_workers: int = 8) -> None:
    """Upload every ``*.parquet`` under ``db_path`` to a dataset repo
    (reference: download.py:23-39, thread-per-file)."""
    try:
        from concurrent.futures import ThreadPoolExecutor

        from huggingface_hub import HfApi
    except ImportError as e:
        raise ImportError("huggingface_hub is required for dataset upload") from e
    api = HfApi()
    files = [
        os.path.join(root, f)
        for root, _d, fs in os.walk(db_path)
        for f in fs
        if f.endswith(".parquet")
    ]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        list(
            pool.map(
                lambda p: api.upload_file(
                    path_or_fileobj=p,
                    path_in_repo=os.path.relpath(p, db_path),
                    repo_id=repo_id,
                    repo_type="dataset",
                ),
                files,
            )
        )
