"""Filesystem helpers: output dirs, input listing, list chunking.

Covers the reference's FileManager (helen/modules/python/FileManager.py:9-70)
and the directory-listing helpers scattered through the interfaces
(CallConsensusInterface.get_file_paths_from_directory, StitchInterface.py:29-37).
"""
from __future__ import annotations

import datetime
import os
from typing import Iterator, List, Sequence, TypeVar

T = TypeVar("T")


def ensure_output_dir(path: str) -> str:
    """Create the directory if missing; return its absolute path."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    return path


def timestamped_dir(parent: str, prefix: str) -> str:
    """Create parent/<prefix>_<YYYYMMDD_HHMMSS>/ and return it."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    return ensure_output_dir(os.path.join(parent, f"{prefix}_{stamp}"))


def _list_with_suffixes(directory: str, suffixes: Sequence[str]) -> List[str]:
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"not a directory: {directory}")
    out = []
    for name in sorted(os.listdir(directory)):
        full = os.path.join(os.path.abspath(directory), name)
        if os.path.isfile(full) and any(name.endswith(s) for s in suffixes):
            out.append(full)
    return out


def list_image_files(directory: str) -> List[str]:
    """All MarginPolish image files (*.h5) in a directory, sorted.

    Packed image caches (names containing ``images_cache`` — io.packed's
    naming across the single-host, per-host and train variants) are
    excluded: pointing ``cache_dir`` at the image directory must not feed
    the cache back in as an input image file on the next listing."""
    return [
        f for f in _list_with_suffixes(directory, (".h5", ".hdf5"))
        if "images_cache" not in os.path.basename(f)
    ]


def list_prediction_files(directory: str) -> List[str]:
    """All intermediate prediction files (*.hdf) in a directory, sorted."""
    return _list_with_suffixes(directory, (".hdf",))


def chunk_list(items: Sequence[T], chunk_size: int) -> Iterator[List[T]]:
    """Yield successive chunks of at most chunk_size items."""
    chunk_size = max(1, int(chunk_size))
    for i in range(0, len(items), chunk_size):
        yield list(items[i : i + chunk_size])


