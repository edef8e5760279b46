"""The end-to-end example must run: multi-source ingest → combined PqDB →
normalize → nested analytics."""

from __future__ import annotations

import tempfile


def test_create_crystal_db_example(spark):
    from examples.create_crystal_db import main

    with tempfile.TemporaryDirectory(prefix="example_") as d:
        db = main(work_dir=d, n_per_source=10)
        # alex 3d + mp summary + mc3d (2d/1d have no fixture files)
        assert db.n_rows == 30
        srcs = {
            r["source_database"]
            for r in db.read(columns=["source_database"]).distinct().collect()
        }
        assert srcs == {"alex", "materials_project", "materialscloud"}
        # ids contiguous across the combined DB
        ids = sorted(r["id"] for r in db.read(columns=["id"]).collect())
        assert ids == list(range(30))


def test_stream_ingest_example(spark, capsys):
    from examples.stream_ingest_events import main

    with tempfile.TemporaryDirectory(prefix="ingest_ex_") as d:
        db = main(work_dir=d)
        assert db.read(columns=["event_id"]).count() == 300
    out = capsys.readouterr().out
    assert "exactly-once verified" in out


def test_search_corpus_example(spark, capsys):
    from examples.search_corpus import main

    main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "BM25 top hits" in out and "incremental near-dup pairs" in out
