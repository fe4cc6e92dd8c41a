"""Packed image cache tests."""
import os

import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.infer.consensus import call_consensus
from helen_tpu.io.images import MarginPolishDataset
from helen_tpu.io.packed import (
    PackedDataset,
    cache_is_fresh,
    pack_images,
    packed_batch_iterator,
)
from helen_tpu.io.prediction_store import list_region_keys, read_prediction_regions
from helen_tpu.io.synthetic import random_sequence, write_image_file

from tests.torch_reference import TorchTransducer


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    paths = []
    for i in range(2):
        p = str(d / f"img_{i}.h5")
        write_image_file(p, {f"c{i}": random_sequence(5000, seed=i)},
                         region_cols=800, overlap_cols=80, noise=0.1)
        paths.append(p)
    return paths


def test_pack_roundtrip(image_files, tmp_path):
    cache = str(tmp_path / "cache.h5")
    n = pack_images(image_files, cache, with_labels=True)
    ref = MarginPolishDataset(image_files, with_labels=True)
    assert n == len(ref)
    packed = PackedDataset(cache, with_labels=True)
    for i in (0, n // 2, n - 1):
        a = ref.load(i)
        batch = packed.read_batch(np.array([i]))
        b = batch.records[0]
        assert (a.contig, a.contig_start, a.contig_end, a.chunk_id) == (
            b.contig, b.contig_start, b.contig_end, b.chunk_id
        )
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.position, b.position)
        np.testing.assert_array_equal(a.label_base, b.label_base)


def test_cache_freshness(image_files, tmp_path):
    cache = str(tmp_path / "cache.h5")
    assert not cache_is_fresh(cache, image_files)
    pack_images(image_files, cache)
    assert cache_is_fresh(cache, image_files)
    # touching a source invalidates
    os.utime(image_files[0])
    assert not cache_is_fresh(cache, image_files)


def test_packed_iterator_pads(image_files, tmp_path):
    cache = str(tmp_path / "cache.h5")
    n = pack_images(image_files, cache)
    ds = PackedDataset(cache)
    batches = list(packed_batch_iterator(ds, 4))
    assert sum(b.valid for b in batches) == n
    assert all(b.images.shape[0] == 4 for b in batches)


def test_consensus_pack_matches_unpacked(image_files, tmp_path):
    torch.manual_seed(1)
    model = TorchTransducer()
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": model.state_dict(), "model_optimizer": {},
                "hidden_size": 128, "gru_layers": 1, "epochs": 0}, pkl)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    fa = call_consensus(image_files=image_files, model_path=pkl,
                        output_dir=out_a, batch_size=8, num_workers=2)[0]
    fb = call_consensus(image_files=image_files, model_path=pkl,
                        output_dir=out_b, batch_size=8, num_workers=2, pack=True)[0]
    for contig in ("c0", "c1"):
        ka = list_region_keys([fa], contig)
        kb = list_region_keys([fb], contig)
        assert [k[1:] for k in ka] == [k[1:] for k in kb]
        for (pa, ra, _, _), (pb, rb, _, _) in zip(ka, kb):
            for (posa, ba, rlea), (posb, bb, rleb) in zip(
                read_prediction_regions(pa[0], contig, ra),
                read_prediction_regions(pb[0], contig, rb),
            ):
                np.testing.assert_array_equal(ba, bb)
                np.testing.assert_array_equal(rlea, rleb)


def test_polish_pack_cache_reused_across_runs(tmp_path):
    """polish --pack must keep its image cache in the stable output dir so a
    second run reuses it instead of re-packing into the fresh timestamped
    predictions dir."""
    import torch

    from helen_tpu.infer.polish import polish
    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from tests.torch_reference import TorchTransducer

    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_image_file(str(image_dir / "img.h5"),
                     {"ctgC": random_sequence(3000, seed=3)},
                     region_cols=600, overlap_cols=60, noise=0.1)
    torch.manual_seed(0)
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": TorchTransducer().state_dict(),
                "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
                "epochs": 0}, pkl)
    out_dir = str(tmp_path / "out")
    polish(str(image_dir), pkl, out_dir, batch_size=4, num_workers=1,
           threads=1, pack=True)
    cache = os.path.join(out_dir, "images_cache.h5")
    assert os.path.exists(cache), sorted(os.listdir(out_dir))
    stamp = os.stat(cache).st_mtime_ns
    polish(str(image_dir), pkl, out_dir, batch_size=4, num_workers=1,
           threads=1, pack=True)
    assert os.stat(cache).st_mtime_ns == stamp, "cache was rebuilt"


def test_train_pack_matches_unpacked(tmp_path):
    """--pack training must be byte-identical to the unpacked path: same
    deterministic permutation, same padded batches, same params and losses
    after an epoch (VERDICT r1: packed cache was inference-only)."""
    import dataclasses

    import jax
    import numpy as np

    from helen_tpu.config import TRAIN
    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from helen_tpu.train.train_loop import Trainer
    from helen_tpu.utils.filesystem import list_image_files

    train_dir = tmp_path / "train"
    train_dir.mkdir()
    # ~11 images at batch 8: the final batch is zero-padded on both paths
    write_image_file(str(train_dir / "t.h5"),
                     {"c1": random_sequence(30000, seed=70)},
                     region_cols=1000, overlap_cols=0, noise=0.05)
    cfg = dataclasses.replace(TRAIN, batch_size=8, learning_rate=1e-3, seed=3)

    def run(pack, out):
        tr = Trainer(
            train_files=list_image_files(str(train_dir)),
            test_files=list_image_files(str(train_dir)),
            cfg=cfg,
            model_dir=str(tmp_path / out / "models"),
            stats_dir=str(tmp_path / out / "stats"),
            num_workers=2,
            pack=pack,
            cache_dir=str(tmp_path / "cache"),
            data_parallel=False,
        )
        if pack:
            assert len(tr.packed_train) == len(tr.dataset)
            assert len(tr.dataset) % 8 != 0  # the tail batch IS padded
        loss = tr.train_one_epoch(0)
        return loss, jax.tree_util.tree_map(np.asarray, tr.params)

    (tmp_path / "cache").mkdir()
    loss_u, params_u = run(False, "unpacked")
    loss_p, params_p = run(True, "packed")
    assert loss_u == loss_p
    flat_u = jax.tree_util.tree_leaves(params_u)
    flat_p = jax.tree_util.tree_leaves(params_p)
    for a, b in zip(flat_u, flat_p):
        assert (a == b).all()
    # the cache is reused, not rebuilt, on a second packed run
    cache = tmp_path / "cache" / "train_images_cache.h5"
    mtime = cache.stat().st_mtime
    loss_p2, _ = run(True, "packed2")
    assert cache.stat().st_mtime == mtime
    assert loss_p2 == loss_p


def test_cache_in_image_dir_not_listed_as_input(tmp_path):
    """A packed cache placed INSIDE the image directory (cache_dir pointed
    at it) must not be picked up as an input image file by the next
    listing (r5: bench.py did exactly this and consensus consumed the
    cache as a 5th image file)."""
    from helen_tpu.utils.filesystem import list_image_files

    (tmp_path / "real.h5").write_bytes(b"")
    (tmp_path / "images_cache.h5").write_bytes(b"")
    (tmp_path / "images_cache_3.h5").write_bytes(b"")
    (tmp_path / "train_images_cache.h5").write_bytes(b"")
    files = list_image_files(str(tmp_path))
    assert [os.path.basename(f) for f in files] == ["real.h5"]


def test_write_through_cache_bit_identical_to_upfront(image_files, tmp_path):
    """A cache built by the consensus write-through tee (cold pack=True run)
    must be bit-identical to a pack_images build — same padded records,
    metadata, and freshness signature — and the next run must slab-read it."""
    import h5py

    torch.manual_seed(3)
    model = TorchTransducer()
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": model.state_dict(), "model_optimizer": {},
                "hidden_size": 128, "gru_layers": 1, "epochs": 0}, pkl)
    out = str(tmp_path / "wt")
    f1 = call_consensus(image_files=image_files, model_path=pkl,
                        output_dir=out, batch_size=8, num_workers=2,
                        pack=True)[0]
    tee_cache = os.path.join(out, "images_cache.h5")
    assert cache_is_fresh(tee_cache, image_files)

    upfront = str(tmp_path / "upfront.h5")
    pack_images(image_files, upfront)
    with h5py.File(tee_cache) as a, h5py.File(upfront) as b:
        for name in ("images", "positions", "contig_ids", "contig_start",
                     "contig_end", "chunk_id", "source_mtimes",
                     "image_shape"):
            np.testing.assert_array_equal(a[f"packed/{name}"][()],
                                          b[f"packed/{name}"][()])
        assert list(a["packed/contigs"][()]) == list(b["packed/contigs"][()])
        assert list(a["packed/source_files"][()]) == \
            list(b["packed/source_files"][()])

    # second run consumes the teed cache via PackedDataset — identical store
    out2 = str(tmp_path / "wt2")
    f2 = call_consensus(image_files=image_files, model_path=pkl,
                        output_dir=out2, batch_size=8, num_workers=2,
                        pack=True, cache_dir=out)[0]
    for contig in ("c0", "c1"):
        for (pa, ra, _, _), (pb, rb, _, _) in zip(
            list_region_keys([f1], contig), list_region_keys([f2], contig)
        ):
            for (posa, ba, rlea), (posb, bb, rleb) in zip(
                read_prediction_regions(pa[0], contig, ra),
                read_prediction_regions(pb[0], contig, rb),
            ):
                np.testing.assert_array_equal(ba, bb)
                np.testing.assert_array_equal(rlea, rleb)


def test_pack_tee_incomplete_discards(image_files, tmp_path):
    """finalize() with fewer images than promised must not publish."""
    from helen_tpu.config import IMAGE
    from helen_tpu.io.images import batched_image_iterator
    from helen_tpu.io.packed import PackTee

    ds = MarginPolishDataset(image_files)
    assert len(ds) >= 2
    cache = str(tmp_path / "cache.h5")
    tee = PackTee(cache, len(ds), IMAGE, image_files)
    batch = next(iter(batched_image_iterator(ds, 1, num_workers=1)))
    tee.add_batch(batch)  # 1 < len(ds) images
    assert tee.finalize() is False
    assert not os.path.exists(cache)
    assert not os.path.exists(tee.tmp)


def test_pack_tee_abandon(image_files, tmp_path):
    from helen_tpu.config import IMAGE
    from helen_tpu.io.packed import PackTee

    ds = MarginPolishDataset(image_files)
    cache = str(tmp_path / "cache.h5")
    tee = PackTee(cache, len(ds), IMAGE, image_files)
    tee.abandon()
    assert not os.path.exists(cache)
    assert not os.path.exists(tee.tmp)
    tee.abandon()  # idempotent


def test_pack_tee_subset_indices(image_files, tmp_path):
    """The multi-host image-shard path: a tee over an index SUBSET must
    publish a cache equivalent to a pack_images subset build (same
    freshness contract cache_is_fresh(indices=...) checks)."""
    from helen_tpu.config import IMAGE
    from helen_tpu.io.images import batched_image_iterator
    from helen_tpu.io.packed import PackTee

    ds = MarginPolishDataset(image_files)
    subset = list(range(0, len(ds), 2))
    cache = str(tmp_path / "cache.h5")
    tee = PackTee(cache, len(subset), IMAGE, image_files, indices=subset)
    for batch in batched_image_iterator(ds, 2, num_workers=1,
                                        indices=subset):
        tee.add_batch(batch)
    assert tee.finalize() is True
    assert cache_is_fresh(cache, image_files, indices=subset)
    assert not cache_is_fresh(cache, image_files)  # full-set consumer: stale

    upfront = str(tmp_path / "upfront.h5")
    pack_images(image_files, upfront, indices=subset)
    import h5py

    with h5py.File(cache) as a, h5py.File(upfront) as b:
        for name in ("images", "positions", "contig_ids", "chunk_id",
                     "source_indices"):
            np.testing.assert_array_equal(a[f"packed/{name}"][()],
                                          b[f"packed/{name}"][()])
