"""Pluggable file IO: local posix + optional fsspec remote backends.

TPU-native counterpart of the reference's FileIO abstraction
(reference: euler/common/file_io.h:34 with posix local_file_io.cc and
dlopen'd-libhdfs hdfs_file_io.cc:22,57-64 — one interface, pluggable
storage). Here the interface is a handful of functions that route any
``scheme://`` path through fsspec when it is installed (gs://, s3://,
hdfs://, memory:// ...) and plain-local paths through the stdlib, so
the converter/loader/checkpoint paths work against remote storage
without conditional code at every call site.

fsspec is optional: remote paths raise a clear error when it is absent
(this image does not bundle it), local paths never touch it.
"""
from __future__ import annotations

import glob as _glob
import os
import re
from typing import IO, List

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_remote(path: str) -> bool:
    return bool(_SCHEME_RE.match(str(path)))


def _fs(path: str):
    try:
        import fsspec
    except ImportError as e:
        raise ImportError(
            f"remote path {path!r} needs fsspec (not installed in this "
            "environment); copy the files to local disk or install "
            "fsspec + the scheme's backend") from e
    fs, _, _ = fsspec.get_fs_token_paths(path)
    return fs


def open_file(path: str, mode: str = "rb") -> IO:
    """Open local or remote; parents are created for local writes."""
    if is_remote(path):
        return _fs(path).open(path, mode)
    if any(m in mode for m in "wax"):
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
    return open(path, mode)


def exists(path: str) -> bool:
    if is_remote(path):
        return _fs(path).exists(path)
    return os.path.exists(path)


def listdir(path: str) -> List[str]:
    if is_remote(path):
        fs = _fs(path)
        return [p.rsplit("/", 1)[-1] for p in fs.ls(path)]
    return os.listdir(path)


def glob(pattern: str) -> List[str]:
    if is_remote(pattern):
        fs = _fs(pattern)
        proto = pattern.split("://", 1)[0]
        return sorted(f"{proto}://{p}" for p in fs.glob(pattern))
    return sorted(_glob.glob(pattern))


def makedirs(path: str) -> None:
    if is_remote(path):
        _fs(path).makedirs(path, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def join(base: str, *parts: str) -> str:
    if is_remote(base):
        return "/".join([base.rstrip("/")] + [p.strip("/") for p in parts])
    return os.path.join(base, *parts)
