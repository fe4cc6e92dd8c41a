"""IO layer tests: image reader, prediction store, synthetic generator, FASTA."""
import numpy as np
import pytest

from helen_tpu.config import IMAGE
from helen_tpu.io.fasta import read_fasta, write_fasta
from helen_tpu.io.images import MarginPolishDataset, batched_image_iterator, pad_image
from helen_tpu.io.prediction_store import (
    PredictionStore,
    list_contigs,
    list_region_keys,
    read_prediction_regions,
)
from helen_tpu.io.synthetic import (
    encode_features,
    random_sequence,
    rle_encode,
    write_image_file,
    write_prediction_file,
)


def test_rle_encode_roundtrip():
    seq = "AAACCGTTTTTTTTTTTTGG"  # 12 Ts must split into 10 + 2
    bases, runs = rle_encode(seq, max_run=10)
    decoded = "".join("_ACGT"[b] * r for b, r in zip(bases, runs))
    assert decoded == seq
    assert runs.max() <= 10


def test_rle_encode_long_run_split():
    bases, runs = rle_encode("A" * 25, max_run=10)
    assert list(runs) == [10, 10, 5]
    assert all(b == 1 for b in bases)


def test_encode_features_layout():
    bases = np.array([1, 4, 0])
    runs = np.array([1, 10, 0])
    img = encode_features(bases, runs)
    assert img.shape == (3, 90)
    assert img[0, 0] == 24 and img[0, 1] == 24  # A run 1 -> block 0
    assert img[1, 66 + 18] == 24  # T run 10 -> offset 3*22 + 2*9
    assert img[2, 88] == 24 and img[2, 89] == 24  # gap


def test_pad_image():
    img = np.ones((10, 90), dtype=np.uint8)
    pos = np.zeros((10, 3), dtype=np.int64)
    img2, pos2 = pad_image(img, pos, 1000)
    assert img2.shape == (1000, 90)
    assert pos2.shape == (1000, 3)
    assert (img2[10:] == 0).all()
    assert (pos2[10:] == -1).all()


def test_image_file_roundtrip(tmp_path):
    seq = random_sequence(5000, seed=7)
    path = str(tmp_path / "images.h5")
    n = write_image_file(path, {"ctg1": seq}, region_cols=900, overlap_cols=80)
    assert n > 0
    ds = MarginPolishDataset([path], with_labels=True)
    assert len(ds) == n
    rec = ds.load(0)
    assert rec.contig == "ctg1"
    assert rec.image.shape == (IMAGE.seq_length, IMAGE.feature_dim)
    assert rec.position.shape == (IMAGE.seq_length, 3)
    assert rec.label_base is not None and rec.label_base.shape == (IMAGE.seq_length,)
    # decoding the labels of all regions must reproduce the sequence prefix
    decoded = "".join(
        "_ACGT"[b] * r
        for b, r in zip(rec.label_base, rec.label_rle)
        if b > 0 and r > 0
    )
    assert seq.startswith(decoded[:100])


def test_batched_iterator_pads_final_batch(tmp_path):
    path = str(tmp_path / "images.h5")
    n = write_image_file(path, {"c": random_sequence(3000, seed=3)}, region_cols=700)
    ds = MarginPolishDataset([path])
    batches = list(batched_image_iterator(ds, batch_size=3, num_workers=2))
    total = sum(b.valid for b in batches)
    assert total == n
    for b in batches:
        assert b.images.shape[0] == 3  # static shape incl. padding
        assert b.images.dtype == np.uint8


def test_prediction_store_roundtrip(tmp_path):
    path = str(tmp_path / "pred_0.hdf")
    pos = np.zeros((5, 3), dtype=np.int64)
    pos[:, 0] = np.arange(5)
    with PredictionStore(path) as store:
        store.write_prediction("ctg", 0, 100, 0, pos, np.array([1, 2, 3, 4, 1]), np.array([1, 1, 2, 1, 3]))
        # duplicate write must be ignored (first-write-wins)
        store.write_prediction("ctg", 0, 100, 0, pos, np.array([4, 4, 4, 4, 4]), np.array([9, 9, 9, 9, 9]))
    assert list_contigs([path]) == ["ctg"]
    keys = list_region_keys([path], "ctg")
    assert keys == [((path,), "ctg-0-100", 0, 100)]
    chunks = list(read_prediction_regions(path, "ctg", "ctg-0-100"))
    assert len(chunks) == 1
    _, bases, rles = chunks[0]
    assert list(bases) == [1, 2, 3, 4, 1]
    assert list(rles) == [1, 1, 2, 1, 3]


def test_prediction_store_rejects_slash_contig(tmp_path):
    # '/' is the HDF5 group separator; writing such a contig would silently
    # nest groups and split the contig across bogus names at stitch
    path = str(tmp_path / "pred_0.hdf")
    pos = np.zeros((2, 3), dtype=np.int64)
    with PredictionStore(path) as store:
        with pytest.raises(ValueError, match="contains '/'"):
            store.write_prediction(
                "ctg/alt", 0, 10, 0, pos, np.array([1, 1]), np.array([1, 1])
            )


def test_prediction_store_resume(tmp_path):
    path = str(tmp_path / "pred_0.hdf")
    pos = np.zeros((2, 3), dtype=np.int64)
    with PredictionStore(path) as store:
        store.write_prediction("c", 0, 10, 0, pos, np.array([1, 1]), np.array([1, 1]))
    with PredictionStore(path, "a") as store:
        assert store.has_chunk("c", 0, 10, 0)
        assert not store.has_chunk("c", 0, 10, 1)
        store.write_prediction("c", 0, 10, 1, pos, np.array([2, 2]), np.array([1, 1]))
    chunks = list(read_prediction_regions(path, "c", "c-0-10"))
    assert len(chunks) == 2


def test_synthetic_prediction_file(tmp_path):
    path = str(tmp_path / "oracle.hdf")
    seq = random_sequence(2000, seed=5)
    write_prediction_file(path, {"x": seq}, region_cols=300, overlap_cols=40)
    assert list_contigs([path]) == ["x"]
    assert len(list_region_keys([path], "x")) > 1


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "out.fa")
    n = write_fasta(path, [("a", "ACGT"), ("empty", ""), ("b", "GGGG")])
    assert n == 2
    assert dict(read_fasta(path)) == {"a": "ACGT", "b": "GGGG"}


def test_prediction_store_metadata(tmp_path):
    path = str(tmp_path / "meta.hdf")
    with PredictionStore(path) as store:
        store.write_metadata({"run_info": {"model": "x.npz", "batch": 512},
                              "hosts": [0, 1]})
    import h5py

    with h5py.File(path, "r") as f:
        assert "run_info" in f
    store = PredictionStore(path, "r")
    meta = store.load_metadata()
    store.close()
    assert meta["run_info"]["batch"] == 512
    assert meta["hosts"] == [0, 1]


def test_padding_positions_wrap_like_reference(tmp_path):
    """Short images' (-1,-1,-1) padding rows wrap to uint32 max in the store
    (the reference writes uint32 too, DataStore.py:125-127); the region merge
    then dedupes the identical wrapped keys to ONE tail entry, exactly like
    the reference's position-dict insert. Pinned: "fixing" the dtype or the
    pos<0 mask would change polished output vs the reference."""
    from helen_tpu.stitch.engine import merge_region_chunks

    path = str(tmp_path / "p.hdf")
    pos = np.zeros((5, 3), dtype=np.int64)
    pos[:, 0] = np.arange(5)
    pos[3:] = -1  # two padding rows
    with PredictionStore(path) as store:
        store.write_prediction("c", 0, 10, 0, pos,
                               np.array([1, 2, 3, 2, 4]), np.array([1, 1, 1, 1, 2]))
    chunks = list(read_prediction_regions(path, "c", "c-0-10"))
    assert chunks[0][0][3, 0] == 2**32 - 1  # wrapped on readback, not negative
    # 3 real columns decode, then the single deduped padding entry ('C')
    assert merge_region_chunks(chunks) == "ACGC"


def test_prediction_store_survives_hard_exit(tmp_path):
    """A flushed store must be readable after a process dies without closing
    the file (preemption mid-run) so --resume can pick up from it."""
    import subprocess
    import sys

    path = str(tmp_path / "killed_0.hdf")
    script = f"""
import os, numpy as np
from helen_tpu.io.prediction_store import PredictionStore
store = PredictionStore({path!r}, "w")
pos = np.zeros((3, 3), dtype=np.int64); pos[:, 0] = np.arange(3)
store.write_prediction("c", 0, 10, 0, pos, np.array([1,2,3]), np.array([1,1,1]))
store.flush()
os._exit(0)  # hard exit: no close, like a preempted worker
"""
    env = dict(**__import__("os").environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-c", script], check=True, env=env)
    with PredictionStore(path, "a") as store:
        assert store.has_chunk("c", 0, 10, 0)
        pos = np.zeros((3, 3), dtype=np.int64)
        store.write_prediction("c", 0, 10, 1, pos, np.array([4,4,4]), np.array([1,1,1]))
    assert len(list(read_prediction_regions(path, "c", "c-0-10"))) == 2


def test_dataset_names_corrupt_file(tmp_path):
    bad = tmp_path / "trunc.h5"
    bad.write_bytes(b"\x89HDF\r\n" + b"x" * 100)
    with pytest.raises(OSError, match="trunc.h5"):
        MarginPolishDataset([str(bad)])


def test_dataset_rejects_wrong_feature_dim(tmp_path):
    import h5py

    path = str(tmp_path / "badfeat.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("images/img0")
        g["image"] = np.zeros((100, 100), np.uint8)  # 100 features, not 90
        g["position"] = np.zeros((100, 3), np.int64)
        g["contig"] = np.array([b"c"], dtype="S64")
        g["contig_start"] = np.array([0])
        g["contig_end"] = np.array([10])
        g["feature_chunk_idx"] = np.array([0])
    ds = MarginPolishDataset([path])
    with pytest.raises(ValueError, match="badfeat.h5.*img0.*100"):
        ds.load(0)


def test_dataset_names_incomplete_group(tmp_path):
    import h5py

    path = str(tmp_path / "missing.h5")
    with h5py.File(path, "w") as f:
        f.create_group("images/img0")["image"] = np.zeros((10, 90), np.uint8)
    ds = MarginPolishDataset([path])
    with pytest.raises(KeyError, match="missing.h5.*img0"):
        ds.load(0)


def test_region_span_from_key_strict_digits():
    """Only strict-ASCII-digit '{contig}-{start}-{end}' names parse; names
    that bare int() would 'successfully' misparse (underscores, signs,
    whitespace, unicode digit-class) must return None so the caller takes
    the dataset-read fallback (r4 advisor)."""
    from helen_tpu.io.prediction_store import _region_span_from_key

    assert _region_span_from_key("chr1-100-200", "chr1") == (100, 200)
    assert _region_span_from_key("chr1-0-0", "chr1") == (0, 0)
    # int('1_0') == 10 — must NOT parse to (10, 20)
    assert _region_span_from_key("chr1-1_0-2_0", "chr1") is None
    assert _region_span_from_key("chr1-+100-200", "chr1") is None
    assert _region_span_from_key("chr1--100-200", "chr1") is None
    assert _region_span_from_key("chr1- 100-200", "chr1") is None
    assert _region_span_from_key("chr1-²-3", "chr1") is None  # superscript 2
    assert _region_span_from_key("chr1-100", "chr1") is None
    assert _region_span_from_key("chr2-100-200", "chr1") is None
