"""Loader registry (reference: crystpqdb/loaders/factory.py:17-54)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from crystal_parquet_database_spark.sources.alexandria import (
    Alexandria1DLoader,
    Alexandria2DLoader,
    AlexandriaLoader,
)
from crystal_parquet_database_spark.sources.base import BaseLoader, LoaderConfig
from crystal_parquet_database_spark.sources.mc3d import MC3DLoader
from crystal_parquet_database_spark.sources.mp import MPLoader


class LoaderFactory:
    _registry: dict[tuple[str, str], type[BaseLoader]] = {
        ("alex", "3d"): AlexandriaLoader,
        ("alex", "2d"): Alexandria2DLoader,
        ("alex", "1d"): Alexandria1DLoader,
        ("materials_project", "summary"): MPLoader,
        ("materialscloud", "mc3d"): MC3DLoader,
        # JARVIS intentionally absent: the reference's jarvis module is
        # import-broken and commented out of its factory (factory.py:13,24;
        # README.md:131) — 40 stub classes, no behavior to reproduce. Its one
        # working piece (the figshare fetch) is mirrored as
        # sources.jarvis.fetch_jarvis_dataset, import-gated on jarvis-tools.
    }

    @classmethod
    def available(cls) -> list[tuple[str, str]]:
        return sorted(cls._registry)

    @classmethod
    def register(cls, key: tuple[str, str], loader_cls: type[BaseLoader]) -> None:
        cls._registry[key] = loader_cls

    @classmethod
    def get_loader(
        cls,
        spark: SparkSession,
        source_database: str,
        source_dataset: str,
        config: LoaderConfig | None = None,
    ) -> BaseLoader:
        key = (source_database, source_dataset)
        if key not in cls._registry:
            raise KeyError(
                f"no loader for {key}; available: {cls.available()}"
            )
        return cls._registry[key](spark, config)


def get_loader(
    spark: SparkSession,
    source_database: str,
    source_dataset: str,
    config: LoaderConfig | None = None,
) -> BaseLoader:
    return LoaderFactory.get_loader(spark, source_database, source_dataset, config)
