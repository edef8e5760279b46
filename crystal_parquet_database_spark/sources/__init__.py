"""Multi-source ingestion pipelines (reference: crystpqdb/loaders/)."""

from crystal_parquet_database_spark.sources.base import BaseLoader, LoaderConfig
from crystal_parquet_database_spark.sources.factory import LoaderFactory, get_loader

__all__ = ["BaseLoader", "LoaderConfig", "LoaderFactory", "get_loader"]
