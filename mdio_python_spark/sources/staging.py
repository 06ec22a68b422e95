"""Part-file staging abstraction for distributed ordered export.

The reference's SEG-Y export merges per-worker partial files over shared
storage (``/root/reference/src/mdio/segy/blocked_io.py:214-302``,
``creation.py:236-264``). On a real cluster the executors and the driver
do NOT share a POSIX filesystem, so the staging location must be a *store
URI* every party can reach (an object-store prefix, NFS mount, etc.), not
a path relative to one machine.

This module provides the minimal filesystem surface export needs — write
a named part, read it back, list parts in name order, clean up — with:

- a local/posix backend (``file://`` or bare paths) used on local[...]
  and shared-filesystem clusters, and
- a scheme registry (``register_scheme``) where deployments plug in an
  object-store backend (an s3/gcs/abfs class holding bucket+prefix and
  opening its client lazily inside each task).

Stores are small picklable objects resolved ON THE DRIVER and shipped to
executors inside the task closure, so a custom backend needs no
executor-side registration — cloudpickle carries the class by value.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Iterator
from typing import BinaryIO
from urllib.parse import urlparse

_SCHEMES: dict[str, Callable[[str], "StagingStore"]] = {}


def register_scheme(scheme: str, factory: Callable[[str], "StagingStore"]) -> None:
    """Register a staging backend for ``scheme://...`` URIs (driver-side)."""
    _SCHEMES[scheme] = factory


class StagingStore:
    """Interface contract for a staging backend. Instances must be
    picklable (they ride to executors in the task closure) and any client
    state must be created lazily inside ``open_write``/``open_read``."""

    def open_write(self, name: str) -> BinaryIO:  # pragma: no cover - contract
        raise NotImplementedError

    def open_read(self, name: str) -> BinaryIO:  # pragma: no cover - contract
        raise NotImplementedError

    def delete(self, name: str) -> None:  # pragma: no cover - contract
        raise NotImplementedError

    def list(self) -> list[str]:  # pragma: no cover - contract
        """Part names in lexicographic order."""
        raise NotImplementedError

    def remove_all(self) -> None:  # pragma: no cover - contract
        raise NotImplementedError


class LocalStaging(StagingStore):
    """POSIX-directory backend (local mode / shared filesystem)."""

    def __init__(self, root: str):
        self.root = root

    def open_write(self, name: str) -> BinaryIO:
        os.makedirs(self.root, exist_ok=True)
        return open(os.path.join(self.root, name), "wb")

    def open_read(self, name: str) -> BinaryIO:
        return open(os.path.join(self.root, name), "rb")

    def delete(self, name: str) -> None:
        os.remove(os.path.join(self.root, name))

    def list(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(os.listdir(self.root))

    def remove_all(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def staging_for(uri: str | StagingStore) -> StagingStore:
    """Resolve a staging URI (or pass through a ready store instance)."""
    if isinstance(uri, StagingStore):
        return uri
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        return LocalStaging(parsed.path if parsed.scheme else uri)
    if parsed.scheme in _SCHEMES:
        return _SCHEMES[parsed.scheme](uri)
    raise ValueError(
        f"no staging backend registered for scheme {parsed.scheme!r} — "
        "call staging.register_scheme or pass a StagingStore instance"
    )


def concat_parts(store: StagingStore, out: BinaryIO, buffer: int = 64 << 20) -> None:
    """Stream every staged part into ``out`` in name order."""
    for name in store.list():
        with store.open_read(name) as part:
            shutil.copyfileobj(part, out, length=buffer)


def iter_part_chunks(
    store: StagingStore, buffer: int = 64 << 20
) -> Iterator[bytes]:
    """Chunk iterator over all parts in order (for non-file sinks)."""
    for name in store.list():
        with store.open_read(name) as part:
            while chunk := part.read(buffer):
                yield chunk
