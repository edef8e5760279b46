"""Executor-parallel Alexandria ingestion via Spark 4's Python DataSource API.

The reference's download stage (crystpqdb/loaders/alexandria.py:142-190 —
`_download_file` over a ThreadPoolExecutor) fetches and decompresses on ONE
machine. This source moves that work onto the CLUSTER: each `.json.bz2` file
(local path or http(s) URL) becomes one `InputPartition`, and every executor
fetch/decompress/parses its own files — ingestion bandwidth scales with
executor count, the driver never touches file bytes, and a 1000-file drop
ingests 1000-wide.

Usage::

    spark.dataSource.register(AlexandriaJsonDataSource)
    df = (spark.read.format("alexandria_json")
          .option("files", ",".join(urls_or_paths)).load())
    # → (source_file string, entry_id string, payload string) — one row per
    #   Alexandria entry; feed payload to from_json with the loader schema.

Network fetch is import-gated (urllib stdlib) and only triggered by http(s)
URLs, so tests drive the identical partition/read machinery on local files.
"""

from __future__ import annotations

import bz2
import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_bytes(path: str, timeout: float = 60.0) -> bytes:
    if path.startswith(("http://", "https://")):
        from urllib.request import urlopen  # executor-side fetch

        # bounded: one stalled server must fail its task (and let Spark
        # retry it), not hang the stage forever — the driver-side loader
        # path has always passed a timeout (alexandria.py), this executor
        # path dropped it
        with urlopen(path, timeout=timeout) as resp:  # noqa: S310 — caller supplies the index
            return resp.read()
    with open(path, "rb") as fh:
        return fh.read()


class _AlexandriaReader(DataSourceReader):
    def __init__(self, options: dict):
        self._timeout = float(options.get("timeout_seconds", 60.0))
        files = options.get("files", "")
        # strip per-entry whitespace: a human-formatted "a.json, b.json"
        # would otherwise produce an unopenable " b.json" path executor-side
        self._files = [f.strip() for f in files.split(",") if f.strip()]
        if not self._files:
            # fail on the DRIVER with a usable message — an empty partition
            # list makes the engine call read(None), a cryptic executor
            # AttributeError
            raise ValueError(
                "alexandria_json requires .option('files', "
                "'<comma-separated paths or http(s) urls>')"
            )

    def partitions(self) -> list[InputPartition]:
        # one partition per file — ingestion parallelism = file count,
        # scheduled across however many executors exist
        return [_FilePartition(f) for f in self._files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        raw = _read_bytes(partition.path, timeout=self._timeout)
        # detect compression on the PATH component only — a presigned URL's
        # query string ('...json.bz2?X-Amz-Signature=...') hides the suffix
        from urllib.parse import urlparse

        if urlparse(partition.path).path.endswith(".bz2"):
            raw = bz2.decompress(raw)
        doc = json.loads(raw)
        # Canonical Alexandria shape (reference crystpqdb/loaders/
        # alexandria.py: data.get("entries", [])) is a LIST of entry dicts,
        # each carrying its id at data.mat_id; a dict-of-id→entry variant
        # also exists in the wild. Handle both; a bare top-level list/dict
        # (no "entries" wrapper) gets the same treatment.
        entries = doc.get("entries", doc) if isinstance(doc, dict) else doc
        if isinstance(entries, dict) and ("data" in entries or "structure" in entries):
            # a BARE top-level entry (no "entries" wrapper): without this
            # check the id→entry branch below iterates its items() and emits
            # garbage rows keyed 'data'/'structure' whose payloads are entry
            # FRAGMENTS — downstream from_json null-pads them into corrupt
            # records. An id→entry map never uses these reserved field names
            # as ids (Alexandria ids are mat_ids like 'agm001...').
            eid = (entries.get("data") or {}).get("mat_id", 0) if isinstance(
                entries.get("data"), dict
            ) else 0
            items: Iterator[tuple] = iter([(eid, entries)])
        elif isinstance(entries, dict):
            items = iter(entries.items())
        elif isinstance(entries, list):
            items = (
                (
                    (e.get("data") or {}).get("mat_id", i)
                    if isinstance(e, dict)
                    else i,
                    e,
                )
                for i, e in enumerate(entries)
            )
        else:
            items = iter(())
        for entry_id, payload in items:
            yield (partition.path, str(entry_id), json.dumps(payload))


class AlexandriaJsonDataSource(DataSource):
    """`alexandria_json` — executor-parallel fetch+decompress+explode of
    Alexandria entry files (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "alexandria_json"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("source_file", StringType()),
                StructField("entry_id", StringType()),
                StructField("payload", StringType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _AlexandriaReader(self.options)
