"""Content-store interface: immutable, content-addressed blobs + directories.

Mirrors the operator surface of the reference's FileSystem interface
(reference src/comlake/core/fs/FileSystem.java:25-46: mkdir, cp, add, ls,
fetch) without prescribing IPFS: the engine addresses content by CID and the
store maps CIDs to byte streams and Spark-readable paths.  Append-only
immutability is the reference's stated design principle
(thesis/main/intro.tex:35-43).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import BinaryIO


class ContentStore(ABC):
    @abstractmethod
    def add(self, stream: BinaryIO) -> str:
        """Store a byte stream, return its CID (FileSystem.java add)."""

    @abstractmethod
    def fetch(self, cid: str) -> BinaryIO:
        """Open a byte stream for a CID (FileSystem.java fetch)."""

    @abstractmethod
    def mkdir(self) -> str:
        """Create an empty directory, return its CID (FileSystem.java mkdir)."""

    @abstractmethod
    def cp(self, src_cid: str, dest_dir_cid: str, name: str) -> str | None:
        """Immutably derive a new directory with src mounted at name; return
        the new directory's CID, or None if dest is not a directory
        (FileSystem.java cp; reference returns null on failure,
        InterPlanetaryFileSystem.java:81-97)."""

    @abstractmethod
    def ls(self, cid: str) -> dict[str, str] | None:
        """Map child name → CID for a directory CID, None if not a directory
        (FileSystem.java ls)."""

    @abstractmethod
    def spark_path(self, cid: str) -> str:
        """A path/URL Spark can read for this CID — the bridge between the
        content store and spark.read (the engine addition the reference's
        single-node lazy-seq reader didn't need)."""

    def is_dir(self, cid: str) -> bool:
        return self.ls(cid) is not None
