"""Documents / embeddings table sources (driver testdata).

Same planning-time probe pattern as ``sources.pages``: schema from
parquet metadata on the driver, column projection pushed into the read
(the reference's layer-selection contract,
``/root/reference/rios/applier.py:730-743``).
"""

from __future__ import annotations

import os

import ray.data


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def embeddings_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(documents_path(sf_dir), columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(embeddings_path(sf_dir), columns=columns)
