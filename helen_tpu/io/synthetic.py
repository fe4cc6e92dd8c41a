"""Synthetic MarginPolish-format data for tests and benchmarks.

MarginPolish itself is an external C program the pipeline consumes images
from (reference helen/modules/marginpolish.cmake:7-13). For hermetic tests we
generate files with the same schema from a known ground-truth sequence:

  * the truth sequence is run-length encoded (run length capped at the max RLE
    class, longer runs split across columns);
  * RLE columns are grouped into overlapping "regions" (the reference's
    ~1000-base MarginPolish regions, SEQ_OVERLAP=200 — Options.py:17);
  * each region is split into <=seq_length-column images with a chunk id and
    region-consistent position arrays, exactly the layout the consensus caller
    and stitch engine expect (reference dataloader_predict.py:61-88,
    Stitch.py:18-31);
  * image features deterministically encode (base, run-length) into the
    correct A/C/G/T x 11-RLE x 2-strand feature block (layout documented by
    the reference debug renderer, test_debug.py:144-151), with optional noise,
    so models can actually learn the mapping in training tests.

Also writes prediction-format files directly from truth labels, letting stitch
be tested in isolation.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np

from helen_tpu.config import IMAGE, ImageConfig
from helen_tpu.io.prediction_store import PredictionStore

_BASE_CODE = {"A": 1, "C": 2, "G": 3, "T": 4}


def rle_encode(seq: str, max_run: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Run-length encode a sequence; runs longer than max_run are split.

    Returns (bases, runs) as int arrays; bases use the 1..4 = A/C/G/T code.
    """
    bases: List[int] = []
    runs: List[int] = []
    i = 0
    n = len(seq)
    while i < n:
        ch = seq[i]
        j = i
        while j < n and seq[j] == ch:
            j += 1
        run = j - i
        code = _BASE_CODE[ch.upper()]
        while run > 0:
            take = min(run, max_run)
            bases.append(code)
            runs.append(take)
            run -= take
        i = j
    return np.array(bases, dtype=np.int64), np.array(runs, dtype=np.int64)


def encode_features(
    bases: np.ndarray,
    runs: np.ndarray,
    feature_dim: int = 90,
    weight: int = 24,
    noise: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Deterministically embed (base, run) labels into the pileup feature
    layout: base b in 1..4 and run r in 1..10 activate both strand slots of
    feature block (b-1)*22 + 2*(r-1); gap columns activate features 88-89."""
    cols = bases.shape[0]
    img = np.zeros((cols, feature_dim), dtype=np.float64)
    for i in range(cols):
        b, r = int(bases[i]), int(runs[i])
        if b == 0 or r == 0:
            img[i, 88] = weight
            img[i, 89] = weight
        else:
            off = (b - 1) * 22 + 2 * (min(r, 10) - 1)
            img[i, off] = weight
            img[i, off + 1] = weight
    if noise > 0:
        rng = rng or np.random.default_rng(0)
        img = img + rng.uniform(0, noise * weight, size=img.shape)
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


@dataclasses.dataclass
class SyntheticRegion:
    contig: str
    contig_start: int  # base-space start of the region in the draft
    contig_end: int  # base-space end
    col_start: int  # RLE-column start (absolute)
    bases: np.ndarray  # region RLE base labels
    runs: np.ndarray  # region RLE run-length labels


def partition_regions(
    bases: np.ndarray,
    runs: np.ndarray,
    contig: str,
    region_cols: int = 1000,
    overlap_cols: int = 80,
) -> List[SyntheticRegion]:
    """Group RLE columns into overlapping regions, mirroring how MarginPolish
    emits ~1000-base regions that overlap by SEQ_OVERLAP bases."""
    total = bases.shape[0]
    cum = np.concatenate([[0], np.cumsum(runs)])  # base offset of each column
    regions = []
    step = max(1, region_cols - overlap_cols)
    start = 0
    while start < total:
        end = min(start + region_cols, total)
        regions.append(
            SyntheticRegion(
                contig=contig,
                contig_start=int(cum[start]),
                contig_end=int(cum[end]),
                col_start=start,
                bases=bases[start:end],
                runs=runs[start:end],
            )
        )
        if end == total:
            break
        start += step
    return regions


def write_image_file(
    path: str,
    contig_seqs: Dict[str, str],
    image_config: ImageConfig = IMAGE,
    region_cols: int = 1000,
    overlap_cols: int = 80,
    noise: float = 0.0,
    with_labels: bool = True,
    seed: int = 0,
) -> int:
    """Write a MarginPolish-schema image HDF5 from truth sequences.

    Returns the number of images written.
    """
    rng = np.random.default_rng(seed)
    count = 0
    with h5py.File(path, "w") as f:
        for contig, seq in contig_seqs.items():
            bases, runs = rle_encode(seq, max_run=image_config.num_rle_classes - 1)
            for region in partition_regions(bases, runs, contig, region_cols, overlap_cols):
                ncols = region.bases.shape[0]
                img = encode_features(
                    region.bases, region.runs, image_config.feature_dim,
                    noise=noise, rng=rng,
                )
                # positions are region-consistent absolute RLE-column indices
                position = np.zeros((ncols, 3), dtype=np.int64)
                position[:, 0] = np.arange(region.col_start, region.col_start + ncols)
                for chunk_id, cstart in enumerate(range(0, ncols, image_config.seq_length)):
                    cend = min(cstart + image_config.seq_length, ncols)
                    name = f"{contig}_{region.contig_start}_{region.contig_end}_{chunk_id}"
                    grp = f.create_group(f"images/{name}")
                    grp["image"] = img[cstart:cend]
                    grp["position"] = position[cstart:cend]
                    grp["contig"] = np.array([contig.encode()], dtype="S64")
                    grp["contig_start"] = np.array([region.contig_start], dtype=np.int64)
                    grp["contig_end"] = np.array([region.contig_end], dtype=np.int64)
                    grp["feature_chunk_idx"] = np.array([chunk_id], dtype=np.int64)
                    if with_labels:
                        grp["label_base"] = region.bases[cstart:cend].astype(np.uint8)
                        grp["label_run_length"] = region.runs[cstart:cend].astype(np.uint8)
                    count += 1
    return count


def write_prediction_file(
    path: str,
    contig_seqs: Dict[str, str],
    image_config: ImageConfig = IMAGE,
    region_cols: int = 1000,
    overlap_cols: int = 80,
    qual: "int | None" = None,
) -> None:
    """Write a prediction-schema HDF5 directly from truth labels (oracle
    predictions) so stitch can be exercised without a model. ``qual`` also
    writes a constant per-column phred array (exercises the --fastq path)."""
    with PredictionStore(path, "w") as store:
        for contig, seq in contig_seqs.items():
            bases, runs = rle_encode(seq, max_run=image_config.num_rle_classes - 1)
            for region in partition_regions(bases, runs, contig, region_cols, overlap_cols):
                ncols = region.bases.shape[0]
                position = np.zeros((ncols, 3), dtype=np.int64)
                position[:, 0] = np.arange(region.col_start, region.col_start + ncols)
                for chunk_id, cstart in enumerate(range(0, ncols, image_config.seq_length)):
                    cend = min(cstart + image_config.seq_length, ncols)
                    store.write_prediction(
                        contig,
                        region.contig_start,
                        region.contig_end,
                        chunk_id,
                        position[cstart:cend],
                        region.bases[cstart:cend],
                        region.runs[cstart:cend],
                        quals=(np.full(cend - cstart, qual, dtype=np.uint8)
                               if qual is not None else None),
                    )


def random_sequence(length: int, seed: int = 0, homopolymer_bias: float = 0.3) -> str:
    """Random ACGT sequence with occasional homopolymer runs so RLE classes
    beyond 1 get exercised."""
    rng = np.random.default_rng(seed)
    out: List[str] = []
    alphabet = "ACGT"
    while len(out) < length:
        ch = alphabet[rng.integers(0, 4)]
        run = 1
        if rng.random() < homopolymer_bias:
            run = int(rng.integers(2, 13))
        out.extend(ch * min(run, length - len(out)))
    return "".join(out)
