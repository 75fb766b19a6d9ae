"""Naming constants for the on-disk dataset layout.

Mirrors the reference's layout contract
(/root/reference/plateau/core/naming.py:4-34,
docs/spec/format_specification.rst:34-54):

    <UUID>.by-dataset-metadata.json                      # the commit file
    <UUID>/indices/<COLUMN>/<TS>.by-dataset-index.parquet  # secondary indexes
    <UUID>/<TABLE>/_common_metadata                      # (implicit: schema lives in commit file)
    <UUID>/<TABLE>/{KEY=VALUE/...}/<PARTITION_UUID>.parquet

The JSON commit file is the single source of truth; a dataset state
change is exactly one atomic put of this file (copy-on-write).
"""

from __future__ import annotations

import re
import uuid as _uuid

METADATA_VERSION = 4
# the storage spec has exactly one supported version (reference
# naming.py:5-7 DEFAULT/MIN/MAX_METADATA_VERSION = 4)
MIN_METADATA_VERSION = 4
MAX_METADATA_VERSION = 4
METADATA_SUFFIX = ".by-dataset-metadata.json"
# reference-interop alternate commit-file format: zstd-compressed
# msgpack of the same document (reference naming.py:12-13)
MSGPACK_METADATA_SUFFIX = ".by-dataset-metadata.msgpack.zstd"
INDEX_SUFFIX = ".by-dataset-index.parquet"
TABLE_NAME = "table"  # single table per dataset (plateau 4.0 semantics)
PARQUET_SUFFIX = ".parquet"
CSV_SUFFIXES = (".csv", ".csv.gz")
# extension beyond the reference (parquet/csv only): JSON-lines payload
# files, the raw-crawl interchange format for LLM corpus ingest
JSON_SUFFIXES = (".json", ".json.gz")
# extension beyond the reference: ORC payload files (Spark-native
# columnar alternative; vectorized reader with predicate pushdown)
ORC_SUFFIX = ".orc"
STAGING_DIR = ".staging"  # per-commit write staging: <uuid>/.staging/<commit-id>/

_UUID_RE = re.compile(r"^[a-zA-Z0-9_\-]+$")


def validate_dataset_uuid(dataset_uuid: str) -> None:
    if not _UUID_RE.match(dataset_uuid):
        raise ValueError(
            f"Invalid dataset UUID {dataset_uuid!r}: only alphanumeric, '_' and '-' allowed"
        )


def gen_uuid() -> str:
    """Auto-generated dataset uuid when the caller passes None
    (reference: plateau/core/uuid.py gen_uuid, exercised by
    io/testing/write.py test_store_dataframes_as_dataset_auto_uuid)."""
    return _uuid.uuid4().hex


def verify_metadata_version(metadata_version: int) -> None:
    """Reject unsupported storage-format versions with the reference's
    exact error shape (plateau/core/utils.py:13-22
    _verify_metadata_version; naming.py MIN/MAX_METADATA_VERSION)."""
    if metadata_version < MIN_METADATA_VERSION:
        raise NotImplementedError(
            f"Minimal supported metadata version is {MIN_METADATA_VERSION}. "
            f"You requested {metadata_version} instead."
        )
    if metadata_version > MAX_METADATA_VERSION:
        raise NotImplementedError(
            f"Future metadata version `{metadata_version}` encountered."
        )


def metadata_key(dataset_uuid: str) -> str:
    return f"{dataset_uuid}{METADATA_SUFFIX}"


def history_key(dataset_uuid: str, generation: int) -> str:
    """Per-commit metadata snapshot (time travel): one JSON document per
    generation under ``<uuid>/history/``. Snapshots are NOT referenced
    by the current commit, so ``garbage_collect_dataset`` reclaims them
    (and the old payload files they point to) — time travel is valid
    until GC, exactly the lakehouse VACUUM contract."""
    return f"{dataset_uuid}/history/g{generation:010d}.json"


def msgpack_metadata_key(dataset_uuid: str) -> str:
    return f"{dataset_uuid}{MSGPACK_METADATA_SUFFIX}"


def index_key(dataset_uuid: str, column: str, timestamp: str) -> str:
    return f"{dataset_uuid}/indices/{column}/{timestamp}{INDEX_SUFFIX}"


# extension beyond the reference: per-file Bloom-filter sidecars
# (plans/blooms.py) live next to the secondary indexes
BLOOM_SUFFIX = ".by-dataset-bloom.parquet"


def bloom_key(dataset_uuid: str, column: str, timestamp: str) -> str:
    return f"{dataset_uuid}/blooms/{column}/{timestamp}{BLOOM_SUFFIX}"


def gen_partition_uuid() -> str:
    return _uuid.uuid4().hex
