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
    """Upload every ``*.parquet`` under ``db_path`` to a dataset repo as ONE
    atomic commit (reference parity: download.py:23-39, which used a thread
    per file — but per-file ``upload_file`` calls commit concurrently to the
    same branch, which the Hub intermittently rejects with 412
    'concurrent commit' and which leaves a partially applied repo on any
    failure; a single batched commit uploads all-or-nothing and keeps the
    repo history at one commit per database version). ``max_workers`` is
    kept for signature compatibility; the hub client manages its own blob
    transfer parallelism inside the batched commit."""
    try:
        from huggingface_hub import CommitOperationAdd, HfApi
    except ImportError as e:
        raise ImportError("huggingface_hub is required for dataset upload") from e
    api = HfApi()
    ops = [
        CommitOperationAdd(
            path_in_repo=os.path.relpath(os.path.join(root, f), db_path),
            path_or_fileobj=os.path.join(root, f),
        )
        for root, _d, fs in os.walk(db_path)
        for f in sorted(fs)
        if f.endswith(".parquet")
    ]
    api.create_commit(
        repo_id=repo_id,
        repo_type="dataset",
        operations=ops,
        commit_message=f"upload {len(ops)} parquet files",
    )
