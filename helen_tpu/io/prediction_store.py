"""Intermediate prediction HDF5 store.

Writes/reads the same on-disk schema as the reference DataStore
(reference DataStore.py:83-133) so stitch can merge predictions positionally:

  predictions/<contig>/<contig>-<start>-<end>/contig_start        int scalar
  predictions/<contig>/<contig>-<start>-<end>/contig_end          int scalar
  predictions/<contig>/<contig>-<start>-<end>/<chunk_id>/position uint32 (L, 3)
  predictions/<contig>/<contig>-<start>-<end>/<chunk_id>/bases    uint8  (L,)
  predictions/<contig>/<contig>-<start>-<end>/<chunk_id>/rles     uint8  (L,)

The ``<contig>-<start>-<end>`` prefix groups all image chunks of one
MarginPolish region.  Unlike the reference (in-memory dedupe sets that die
with the process), this store is resumable: ``has_chunk`` checks the file so
an interrupted consensus run can skip already-written groups.
"""
from __future__ import annotations

import os
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Set, Tuple

import h5py
import numpy as np

PRED_ROOT = "predictions"

# Per-thread read-handle cache. Stitch reads each prediction file once per
# REGION (thousands of times per contig); h5py open costs ~1 ms, which was
# >50% of single-thread stitch wall time. Handles are keyed on
# (mtime_ns, size) so a file rewritten by a resumed consensus run is
# transparently reopened. Thread-local => safe under the stitch process pool
# (fresh processes) and the in-process fallback alike; h5py handles must not
# cross threads.
_read_handles = threading.local()

# Process-wide registry of every cached read handle, so a writer (e.g. a
# resumed consensus run reopening its shard file RDWR) can evict them first —
# HDF5 refuses to open a file read-write while the same process holds it
# read-only. Guarded by a lock; h5py itself serializes libhdf5 calls.
_registry_lock = threading.Lock()
_registry: Dict[str, List["h5py.File"]] = {}


def close_read_handles(path: Optional[str] = None) -> None:
    """Close cached read-only handles for ``path`` (or all), across threads.

    Stale per-thread cache entries are detected via ``f.id.valid`` on next
    use and transparently reopened. Only call when no reader is mid-request
    (e.g. after stitch, before a resumed consensus writer reopens its file).
    """
    key = os.path.realpath(path) if path is not None else None
    with _registry_lock:
        targets = [key] if key is not None else list(_registry)
        for k in targets:
            for f in _registry.pop(k, []):
                try:
                    f.close()
                except Exception:
                    pass


def open_prediction_file(path: str) -> "h5py.File":
    """Return a cached read-only handle for ``path`` (per-thread)."""
    cache: Dict[str, Tuple[Tuple[int, int], h5py.File]] = getattr(
        _read_handles, "files", None
    )
    if cache is None:
        cache = _read_handles.files = {}
    st = os.stat(path)
    stamp = (st.st_mtime_ns, st.st_size)
    entry = cache.get(path)
    if entry is not None:
        old_stamp, f = entry
        if old_stamp == stamp and f.id.valid:
            return f
        try:
            f.close()
        except Exception:
            pass
        with _registry_lock:
            reg = _registry.get(os.path.realpath(path))
            if reg and f in reg:
                reg.remove(f)
        groups = getattr(_read_handles, "groups", None)
        if groups:
            for key in [k for k in groups if k[0] == path]:
                del groups[key]
    f = h5py.File(path, "r")
    cache[path] = (stamp, f)
    with _registry_lock:
        _registry.setdefault(os.path.realpath(path), []).append(f)
    return f


def _contig_group(path: str, contig: str) -> Optional["h5py.Group"]:
    """Cached ``f[predictions/<contig>]`` group for a cached handle (the
    group lookup itself costs ~0.1 ms in h5py's high-level layer and stitch
    does it once per region otherwise). Returns None when absent."""
    groups = getattr(_read_handles, "groups", None)
    if groups is None:
        groups = _read_handles.groups = {}
    f = open_prediction_file(path)  # evicts stale group entries on reopen
    key = (path, contig)
    if key not in groups:
        if PRED_ROOT in f and contig in f[PRED_ROOT]:
            groups[key] = f[PRED_ROOT][contig]
        else:
            groups[key] = None
    return groups[key]


class PredictionStore:
    """Writer for per-shard prediction files (one file per inference shard).

    Writes go through h5py's low-level API with shared property lists,
    cached dataspaces and COMPACT dataset layout (payloads are ~16 KiB per
    image, far under the 64 KiB compact limit): measured ~2x over the
    high-level path-assignment API (~0.25 vs ~0.5 ms/image) — the store
    write is the host-side bottleneck of consensus calling on real TPU
    hosts, where the chip itself is >10x faster than the metadata-bound
    HDF5 writes. The on-disk schema is unchanged (same groups, names,
    dtypes; compact vs contiguous layout is invisible to readers).
    """

    def __init__(self, filename: str, mode: str = "w"):
        self.filename = filename
        if os.path.exists(filename):
            # evict cached read-only handles (a prior stitch in this process)
            # or HDF5 refuses the read-write open
            close_read_handles(filename)
        self.file = h5py.File(filename, mode)
        if mode in ("w", "a") and PRED_ROOT not in self.file:
            # always present, even in a shard that ends up receiving zero
            # chunks (a --writers pool with fewer regions than writers):
            # stitch treats an empty predictions group as an empty shard,
            # while a file with NO predictions group stays a hard error
            # (it is not a prediction file at all)
            self.file.create_group(PRED_ROOT)
        self._regions: Set[str] = set()
        self._chunks: Set[Tuple[str, str]] = set()
        self._region_groups: Dict[str, "h5py.Group"] = {}
        # shared low-level property lists / dataspaces for the hot write path
        from h5py import h5d, h5p, h5s

        self._gcpl = h5p.create(h5p.GROUP_CREATE)
        self._gcpl.set_obj_track_times(False)
        self._dcpl_compact = h5p.create(h5p.DATASET_CREATE)
        self._dcpl_compact.set_obj_track_times(False)
        self._dcpl_compact.set_layout(h5d.COMPACT)
        self._dcpl_plain = h5p.create(h5p.DATASET_CREATE)
        self._dcpl_plain.set_obj_track_times(False)
        self._spaces: Dict[Tuple[int, ...], "h5s.SpaceID"] = {}
        if mode == "a" and PRED_ROOT in self.file:
            for contig in self.file[PRED_ROOT]:
                for region in self.file[PRED_ROOT][contig]:
                    self._regions.add(region)
                    for key in self.file[PRED_ROOT][contig][region]:
                        if key not in ("contig_start", "contig_end"):
                            self._chunks.add((region, key))

    def _space(self, shape: Tuple[int, ...]):
        from h5py import h5s

        sp = self._spaces.get(shape)
        if sp is None:
            sp = self._spaces[shape] = h5s.create_simple(shape)
        return sp

    def _write_dataset(self, group_id, name: bytes, arr: np.ndarray) -> None:
        from h5py import h5d, h5s, h5t

        # compact layout keeps the payload in the object header (one metadata
        # object instead of header + heap data); only valid under 64 KiB
        dcpl = self._dcpl_compact if arr.nbytes < 64000 else self._dcpl_plain
        d = h5d.create(group_id, name, h5t.py_create(arr.dtype), self._space(arr.shape), dcpl=dcpl)
        d.write(h5s.ALL, h5s.ALL, arr)

    def __enter__(self) -> "PredictionStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if self.file:
            self.file.close()
            self.file = None

    def write_metadata(self, data: Dict[str, object]) -> None:
        """Store small structured metadata blobs as JSON strings under top-
        level keys (reference DataStore.write_metadata, DataStore.py:52-60,
        used yaml; JSON avoids the unsafe-load footgun)."""
        import json

        for key, value in data.items():
            if key in self.file:
                del self.file[key]
            self.file[key] = json.dumps(value)

    def load_metadata(self, keys: Optional[List[str]] = None) -> Dict[str, object]:
        import json

        out: Dict[str, object] = {}
        for key in keys or [k for k in self.file.keys() if k != PRED_ROOT]:
            if key in self.file:
                raw = self.file[key][()]
                if isinstance(raw, bytes):
                    raw = raw.decode()
                try:
                    out[key] = json.loads(raw)
                except (TypeError, ValueError):
                    continue
        return out

    def preload_chunk_keys(self, keys) -> None:
        """Union extra (region, chunk) keys into the dedupe set — used by a
        resumed run to skip chunks that live in OTHER shard files (e.g. a
        previous --writers pool's shards)."""
        self._chunks.update(tuple(k) for k in keys)

    def has_chunk(self, contig: str, contig_start: int, contig_end: int, chunk_id: int) -> bool:
        region = f"{contig}-{contig_start}-{contig_end}"
        return (region, str(chunk_id)) in self._chunks

    def write_prediction(
        self,
        contig: str,
        contig_start: int,
        contig_end: int,
        chunk_id: int,
        position: np.ndarray,
        bases: np.ndarray,
        rles: np.ndarray,
        quals: Optional[np.ndarray] = None,
    ) -> bool:
        """Write one image's predictions; duplicate (region, chunk) pairs are
        first-write-wins, matching the reference dedupe (DataStore.py:104-124).

        position is stored as uint32 exactly like the reference
        (DataStore.py:125-127): short images' (-1,-1,-1) padding rows wrap to
        4294967295 on BOTH sides, so the stitch-stage "skip pos<0" check is
        dead for store-read rows in both pipelines; the wrapped rows share
        one key, dedupe to a single entry, and sort to the region tail —
        byte-identical output requires replaying this, so do NOT "fix" the
        dtype here without changing the parity contract."""
        if "/" in contig:
            # '/' is the HDF5 group separator: such a name would silently
            # nest extra groups, splitting the contig across bogus names at
            # stitch (the reference corrupts its store the same way). Fail
            # loudly instead — these names are invalid in the image pipeline.
            raise ValueError(
                f"contig name {contig!r} contains '/', which is not "
                "representable in the prediction-store HDF5 layout"
            )
        from h5py import h5g

        region = f"{contig}-{contig_start}-{contig_end}"
        rgrp = self._region_groups.get(region)
        if rgrp is None:
            base_path = f"{PRED_ROOT}/{contig}/{region}"
            if region in self._regions or base_path in self.file:
                rgrp = self.file[base_path]
            else:
                rgrp = self.file.create_group(base_path)
                rgrp["contig_start"] = int(contig_start)
                rgrp["contig_end"] = int(contig_end)
            self._regions.add(region)
            self._region_groups[region] = rgrp
        key = (region, str(chunk_id))
        if key in self._chunks:
            return False
        self._chunks.add(key)
        cg = h5g.create(rgrp.id, str(chunk_id).encode(), gcpl=self._gcpl)
        self._write_dataset(
            cg, b"position", np.ascontiguousarray(position, dtype=np.uint32)
        )
        self._write_dataset(cg, b"bases", np.ascontiguousarray(bases, dtype=np.uint8))
        self._write_dataset(cg, b"rles", np.ascontiguousarray(rles, dtype=np.uint8))
        if quals is not None:
            # optional per-column phred confidence (--qualities); an EXTRA
            # dataset inside the chunk group, invisible to schema-compatible
            # readers that only fetch position/bases/rles
            self._write_dataset(
                cg, b"quals", np.ascontiguousarray(quals, dtype=np.uint8)
            )
        return True

    def flush(self) -> None:
        self.file.flush()


def list_contigs(prediction_files: List[str]) -> List[str]:
    """Union of contigs across prediction files (reference StitchInterface.py:50-65)."""
    contigs: Set[str] = set()
    for path in prediction_files:
        with h5py.File(path, "r") as f:
            if PRED_ROOT not in f:
                raise ValueError(f"{path}: no '{PRED_ROOT}' group — not a prediction file")
            contigs.update(f[PRED_ROOT].keys())
    return sorted(contigs)


def _region_span_from_key(region_key: str, contig: str) -> "Optional[Tuple[int, int]]":
    """Parse (contig_start, contig_end) out of a region group NAME.

    Both this store and the reference DataStore name region groups
    ``{contig}-{contig_start}-{contig_end}`` (DataStore.py:108,
    write_prediction above), so the span is recoverable without opening the
    group's two scalar datasets — at genome scale those two h5py reads per
    region per shard were ~25% of single-process stitch time. Returns None
    (caller falls back to reading the datasets) for any name that doesn't
    match, e.g. a contig whose own name ends in ``-<digits>-<digits>``
    written by some third-party producer with a different convention."""
    prefix = contig + "-"
    if not region_key.startswith(prefix):
        return None
    parts = region_key[len(prefix):].split("-")
    if len(parts) != 2:
        return None
    # strict ASCII digits only: bare int() also accepts signs, whitespace
    # and underscore separators (int('1_0') == 10), so a third-party name
    # like 'chr1-1_0-2_0' would parse "successfully" to a WRONG span
    # instead of taking the documented dataset-read fallback. isascii()
    # first because Unicode digit-CLASS characters (e.g. superscripts)
    # pass isdigit() yet crash int().
    if not all(p.isascii() and p.isdigit() for p in parts):
        return None
    return int(parts[0]), int(parts[1])


def list_region_keys(
    prediction_files: List[str], contig: str
) -> List[Tuple[Tuple[str, ...], str, int, int]]:
    """All (files, region_key, start, end) tuples for a contig, with each
    region grouped across every prediction file that holds chunks of it
    (reference StitchInterface.py:82-95 — but cross-file: image-granular
    multi-host sharding can land different chunks of one region in different
    host shards, and the stitcher must merge them positionally, never join
    partial per-file sequences)."""
    regions: Dict[str, Tuple[List[str], int, int]] = {}
    for path in sorted(prediction_files):
        cgrp = _contig_group(path, contig)  # cached per-thread
        if cgrp is None:
            continue
        for region_key in sorted(cgrp.keys()):
            if region_key in regions:
                regions[region_key][0].append(path)
                continue
            span = _region_span_from_key(region_key, contig)
            if span is None:
                grp = cgrp[region_key]
                span = (int(grp["contig_start"][()]),
                        int(grp["contig_end"][()]))
            regions[region_key] = ([path], span[0], span[1])
    out = [
        (tuple(paths), region_key, start, end)
        for region_key, (paths, start, end) in regions.items()
    ]
    return sorted(out, key=lambda t: (t[2], t[3]))


def read_region_chunks(
    paths: Sequence[str], contig: str, region_key: str, with_quals: bool = False
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield (position, bases, rles) per image chunk of a region, merged
    across prediction files, in globally sorted chunk-NAME order — the
    lexicographic string sort is deliberate: the reference also sorts the
    HDF5 group-name strings (Stitch.py:209-211, ``sorted(smaller_chunks)``),
    so for regions with >= 10 chunks the first-write-wins winner on
    overlapping positions must follow string order ('10' < '2') to stitch
    identical sequences. A chunk present in several files (e.g. an
    overlapping resumed run) is taken from the first file in sorted-path
    order, matching the store's first-write-wins dedupe.

    ``with_quals=True`` yields 4-tuples whose last element is the chunk's
    per-column phred array, or None when the store has no ``quals`` dataset
    (written by ``--qualities`` runs only).

    Reads run through h5py's LOW-LEVEL API (h5g/h5d object ids, no
    high-level Group/Dataset wrappers): the store is thousands of tiny
    COMPACT datasets, so wrapper construction dominated read time —
    measured 434 -> 256 us per chunk (~1.7x), worth ~30% of single-process
    stitch wall."""
    from h5py import h5d, h5g, h5s

    def _read(gid, name: bytes, dtype=None):
        did = h5d.open(gid, name)
        arr = np.empty(did.shape, dtype=did.dtype)
        did.read(h5s.ALL, h5s.ALL, arr)
        # position must widen to int64 (uint32-wrapped padding rows
        # participate in sorting); bases/rles stay uint8 — rle_decode
        # consumes them at that width
        return arr.astype(dtype) if dtype is not None else arr

    per_file: List[Tuple[Dict[str, bytes], "h5g.GroupID"]] = []
    for path in sorted(paths):
        cgrp = _contig_group(path, contig)  # cached per-thread
        rgid = h5g.open(cgrp.id, region_key.encode())
        names = {}
        for i in range(rgid.get_num_objs()):
            bname = rgid.get_objname_by_idx(i)
            name = bname.decode()
            if name not in ("contig_start", "contig_end"):
                names[name] = bname
        per_file.append((names, rgid))
    all_names = sorted({name for names, _ in per_file for name in names})
    for name in all_names:
        for names, rgid in per_file:
            if name in names:
                cg = h5g.open(rgid, names[name])
                out = (
                    _read(cg, b"position", np.int64),
                    _read(cg, b"bases"),
                    _read(cg, b"rles"),
                )
                if with_quals:
                    try:
                        q = _read(cg, b"quals")
                    except KeyError:
                        q = None
                    out = out + (q,)
                yield out
                break


def read_prediction_regions(
    path: str, contig: str, region_key: str
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Single-file variant of read_region_chunks."""
    yield from read_region_chunks([path], contig, region_key)
