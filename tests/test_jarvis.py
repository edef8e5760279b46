"""Offline tests for the JARVIS figshare helper (no network, no
jarvis-tools): the unzip step must extract-and-remove, and the fetch must
fail with actionable guidance when the optional package is absent."""

from __future__ import annotations

import importlib.util
import zipfile

import pytest

from crystal_parquet_database_spark.sources.jarvis import (
    fetch_jarvis_dataset,
    unzip_all,
)


def test_unzip_all_extracts_and_removes(tmp_path):
    for name in ("a", "b"):
        with zipfile.ZipFile(tmp_path / f"{name}.zip", "w") as zf:
            zf.writestr(f"{name}.json", "{}")
    done = unzip_all(tmp_path)
    assert [p.name for p in done] == ["a.zip", "b.zip"]
    assert (tmp_path / "a.json").exists() and (tmp_path / "b.json").exists()
    assert not list(tmp_path.glob("*.zip"))


def test_unzip_all_can_keep_archives(tmp_path):
    with zipfile.ZipFile(tmp_path / "a.zip", "w") as zf:
        zf.writestr("a.json", "{}")
    unzip_all(tmp_path, remove_archives=False)
    assert (tmp_path / "a.json").exists() and (tmp_path / "a.zip").exists()


@pytest.mark.skipif(
    importlib.util.find_spec("jarvis") is not None,
    reason="jarvis-tools installed; gated path not exercised",
)
def test_fetch_requires_optional_package(tmp_path):
    with pytest.raises(ImportError, match="jarvis-tools"):
        fetch_jarvis_dataset("dft_3d", tmp_path)
