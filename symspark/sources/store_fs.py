"""Filesystem abstraction for symbol stores: local paths, s3://, gs://.

The reference ships three store backends per processor - local file, S3
and GCS (sourcemapprocessor/store.go:94-166, dsymprocessor/store.go:54-126,
proguardprocessor/store.go:56-128).  The Spark-first equivalent routes the
OFFLINE builders (sourcemap_build / proguard_build) through
:mod:`pyarrow.fs`, whose C++ S3FileSystem / GcsFileSystem are the public
SDK-backed analogs; Spark itself reads the RESULTING parquet dims through
its own Hadoop connectors (``s3a://`` / ``gs://`` URIs pass straight to
``spark.read``).

``resolve(uri)`` returns ``(FileSystem, path)``:
- plain paths      -> LocalFileSystem
- file:// URIs     -> LocalFileSystem
- s3://bucket/key  -> S3FileSystem (region/credentials from the standard
                      AWS environment, as in the reference's aws-sdk config)
- gs://bucket/key  -> GcsFileSystem
"""

from __future__ import annotations

from pyarrow import fs as pafs


def resolve(uri: str) -> tuple[pafs.FileSystem, str]:
    if "://" not in uri:
        return pafs.LocalFileSystem(), uri
    filesystem, path = pafs.FileSystem.from_uri(uri)
    return filesystem, path


def list_dir(filesystem: pafs.FileSystem, path: str):
    """Immediate children of ``path`` as FileInfo, name-sorted (the
    builders' deterministic scan order)."""
    sel = pafs.FileSelector(path, recursive=False)
    return sorted(filesystem.get_file_info(sel), key=lambda i: i.path)


def read_text(filesystem: pafs.FileSystem, path: str) -> str:
    with filesystem.open_input_stream(path) as f:
        return f.read().decode("utf-8", errors="replace")


def read_bytes(filesystem: pafs.FileSystem, path: str) -> bytes:
    with filesystem.open_input_stream(path) as f:
        return f.read()


def exists(filesystem: pafs.FileSystem, path: str) -> bool:
    return filesystem.get_file_info(path).type != pafs.FileType.NotFound
