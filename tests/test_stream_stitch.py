"""Streaming stitch (stitch.streaming): byte-identity with the classic
store-reading stitch stage, plan bookkeeping, and the degraded paths.

The streaming path recomputes nothing — it must produce the exact FASTA/FASTQ
bytes of the classic pipeline on the same predictions, including the store's
uint32 position wrap, str(chunk_id) merge order, and the hierarchical
group-join tree (see stitch/streaming.py module docstring for the
divergence-point inventory).
"""
import os

import numpy as np
import pytest

from helen_tpu.config import MODEL, STITCH
from helen_tpu.infer.polish import polish
from helen_tpu.io.checkpoint import save_checkpoint
from helen_tpu.io.images import MarginPolishDataset
from helen_tpu.io.synthetic import random_sequence, write_image_file
from helen_tpu.stitch.streaming import StreamingStitcher, build_stream_plan


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    root = tmp_path_factory.mktemp("stream")
    image_dir = root / "images"
    image_dir.mkdir()
    # 3 contigs across 2 files; small regions force many regions per contig
    # (several worker groups) and chunked regions exercise the per-region
    # chunk merge; noise makes overlap votes disagree across chunks
    write_image_file(
        str(image_dir / "img_0.h5"),
        {"ctgA": random_sequence(9000, seed=1),
         "ctgB": random_sequence(5000, seed=2)},
        region_cols=700, overlap_cols=80, noise=0.25,
    )
    write_image_file(
        str(image_dir / "img_1.h5"),
        {"ctgC": random_sequence(4000, seed=3)},
        region_cols=650, overlap_cols=80, noise=0.25,
    )
    params = init_model_params()
    model = str(root / "model.npz")
    save_checkpoint(model, params, {"epochs": 0})
    return {"root": root, "image_dir": str(image_dir), "model": model}


def init_model_params():
    import jax

    from helen_tpu.models.transducer import init_params

    return init_params(jax.random.PRNGKey(7), MODEL)


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_stream_polish_matches_classic(setup, tmp_path):
    f_classic = polish(setup["image_dir"], setup["model"],
                       str(tmp_path / "classic"), batch_size=8, threads=3,
                       stream_stitch=False)
    f_stream = polish(setup["image_dir"], setup["model"],
                      str(tmp_path / "stream"), batch_size=8, threads=3,
                      stream_stitch=True)
    assert _read(f_stream) == _read(f_classic)
    assert len(_read(f_stream)) > 100


def test_stream_polish_fastq_matches_classic(setup, tmp_path):
    f_classic = polish(setup["image_dir"], setup["model"],
                       str(tmp_path / "classic"), batch_size=8, threads=3,
                       fastq=True, stream_stitch=False)
    f_stream = polish(setup["image_dir"], setup["model"],
                      str(tmp_path / "stream"), batch_size=8, threads=3,
                      fastq=True, stream_stitch=True)
    assert _read(f_stream) == _read(f_classic)


def test_stream_polish_packed_and_writers(setup, tmp_path):
    """pack=True (PackedDataset metadata pre-scan) and a writer pool —
    the bench/production configuration."""
    f_classic = polish(setup["image_dir"], setup["model"],
                       str(tmp_path / "classic"), batch_size=8, threads=3,
                       stream_stitch=False)
    f_stream = polish(setup["image_dir"], setup["model"],
                      str(tmp_path / "stream"), batch_size=8, threads=3,
                      pack=True, num_writers=2, stream_stitch=True)
    assert _read(f_stream) == _read(f_classic)


def test_plan_matches_store_grouping(setup):
    """The pre-scan plan must reproduce Stitcher._plan's grouping exactly:
    same sorted contigs, same (start, end)-ordered region keys, same group
    boundaries."""
    from helen_tpu.stitch.engine import Stitcher

    files = sorted(
        os.path.join(setup["image_dir"], f)
        for f in os.listdir(setup["image_dir"]) if f.endswith(".h5")
    )
    ds = MarginPolishDataset(files)
    threads = 3
    plan = build_stream_plan(ds, None, threads, STITCH)
    assert plan.contigs == ["ctgA", "ctgB", "ctgC"]

    # build a prediction store from trivial labels to compare groupings
    import tempfile

    from helen_tpu.io.prediction_store import PredictionStore

    with tempfile.TemporaryDirectory() as d:
        store_path = os.path.join(d, "p_0.hdf")
        with PredictionStore(store_path, "w") as store:
            for i in range(len(ds)):
                rec = ds.load(i)
                store.write_prediction(
                    rec.contig, rec.contig_start, rec.contig_end,
                    rec.chunk_id, rec.position,
                    np.ones(rec.position.shape[0], np.uint8),
                    np.ones(rec.position.shape[0], np.uint8),
                )
        stitcher = Stitcher(STITCH, threads=threads)
        store_plan = stitcher._plan([store_path], plan.contigs)
    for contig, groups in store_plan:
        stream_groups = plan.contig_groups[contig]
        assert [g.keys for g in stream_groups] == \
            [[t[1] for t in grp] for grp in groups]
        # expected chunk counts cover every image exactly once
        total = sum(r.expected for g in stream_groups for r in g.regions)
        n_contig = sum(1 for i in range(len(ds))
                       if ds.image_meta(i)[0] == contig)
        assert total == n_contig


def test_stream_sink_worker_failure_falls_back_to_store(setup, tmp_path,
                                                        monkeypatch):
    """A worker that dies mid-stream must not lose output: finish_iter
    re-reads the failed group from the (complete) store."""
    import helen_tpu.stitch.streaming as streaming

    import concurrent.futures

    class _FakePool:
        """Every task dies — real Future API so done-callbacks and
        concurrent.futures.wait behave as with a live pool."""

        def __init__(self):
            self.n = 0

        def submit(self, *a, **k):
            self.n += 1
            f = concurrent.futures.Future()
            f.set_exception(RuntimeError("injected worker death"))
            return f

        def shutdown(self, **k):
            pass

    files = sorted(
        os.path.join(setup["image_dir"], f)
        for f in os.listdir(setup["image_dir"]) if f.endswith(".h5")
    )
    ds = MarginPolishDataset(files)
    plan = build_stream_plan(ds, None, 3, STITCH)
    sink = StreamingStitcher(plan, STITCH, executor=_FakePool())

    # run a real consensus into a store, feeding the sink like the driver
    import tempfile

    from helen_tpu.io.prediction_store import PredictionStore

    with tempfile.TemporaryDirectory() as d:
        store_path = os.path.join(d, "pred_0.hdf")
        rng = np.random.default_rng(0)
        with PredictionStore(store_path, "w") as store:
            for i in range(len(ds)):
                rec = ds.load(i)
                n = rec.position.shape[0]
                bases = rng.integers(0, 5, n).astype(np.uint8)
                rles = rng.integers(0, 11, n).astype(np.uint8)
                wrote = store.write_prediction(
                    rec.contig, rec.contig_start, rec.contig_end,
                    rec.chunk_id, rec.position, bases, rles)
                assert wrote
                sink.add(rec, bases, rles)
        assert sink.ready()
        rows = list(sink.finish_iter([store_path]))

        # classic stitch over the same store must match
        from helen_tpu.infer.polish import perform_stitch

        out = perform_stitch(d, d, "classic", threads=1)
        classic = _read(out).decode()
    got = "".join(f">{c}\n{s}\n" for c, s in rows)
    assert got == classic


def test_sub_batch_granularity_byte_identical(setup):
    """sub_batch_regions=1 forces one merge task per region plus the
    callback-chained level-2 joins — maximum machinery, identical bytes."""
    import concurrent.futures
    import tempfile

    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.prediction_store import PredictionStore

    class _InlinePool:
        """Executes submits synchronously with real Futures, so the
        done-callback join chain runs deterministically in-process."""

        def submit(self, fn, *a, **k):
            f = concurrent.futures.Future()
            try:
                f.set_result(fn(*a, **k))
            except Exception as exc:  # pragma: no cover
                f.set_exception(exc)
            return f

        def shutdown(self, **k):
            pass

    files = sorted(
        os.path.join(setup["image_dir"], f)
        for f in os.listdir(setup["image_dir"]) if f.endswith(".h5")
    )
    ds = MarginPolishDataset(files)
    plan = build_stream_plan(ds, None, 3, STITCH)
    sink = StreamingStitcher(plan, STITCH, executor=_InlinePool(),
                             sub_batch_regions=1)
    rng = np.random.default_rng(1)
    with tempfile.TemporaryDirectory() as d:
        store_path = os.path.join(d, "pred_0.hdf")
        with PredictionStore(store_path, "w") as store:
            for i in range(len(ds)):
                rec = ds.load(i)
                n = rec.position.shape[0]
                bases = rng.integers(0, 5, n).astype(np.uint8)
                rles = rng.integers(0, 11, n).astype(np.uint8)
                assert store.write_prediction(
                    rec.contig, rec.contig_start, rec.contig_end,
                    rec.chunk_id, rec.position, bases, rles)
                sink.add(rec, bases, rles)
        assert sink.ready()
        rows = list(sink.finish_iter([store_path]))
        out = perform_stitch(d, d, "classic", threads=1)
        classic = _read(out).decode()
    got = "".join(f">{c}\n{s}\n" for c, s in rows)
    assert got == classic


def test_stream_multi_sub_batch_real_pool(setup, tmp_path, monkeypatch):
    """Force several merge sub-batches per group through a REAL spawn pool
    so the async callback-chained joins (and the submit-window reservation,
    see _submit_merge) actually run concurrently with the feed — the
    production shape at genome scale, where tests' default fixtures fit one
    sub-batch per group."""
    import helen_tpu.stitch.streaming as streaming

    monkeypatch.setattr(streaming.StreamingStitcher, "SUB_BATCH_REGIONS", 2)
    f_classic = polish(setup["image_dir"], setup["model"],
                       str(tmp_path / "classic"), batch_size=8, threads=3,
                       stream_stitch=False)
    f_stream = polish(setup["image_dir"], setup["model"],
                      str(tmp_path / "stream"), batch_size=8, threads=3,
                      stream_stitch=True)
    assert _read(f_stream) == _read(f_classic)


def test_stream_out_of_order_feed(setup):
    """Region completion order must not matter: feeding the stream in
    reverse index order (regions seal interleaved across contigs) still
    matches the classic store stitch — merges sort chunks by str(chunk_id)
    regardless of arrival."""
    import concurrent.futures
    import tempfile

    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.prediction_store import PredictionStore

    class _InlinePool:
        def submit(self, fn, *a, **k):
            f = concurrent.futures.Future()
            f.set_result(fn(*a, **k))
            return f

        def shutdown(self, **k):
            pass

    files = sorted(
        os.path.join(setup["image_dir"], f)
        for f in os.listdir(setup["image_dir"]) if f.endswith(".h5")
    )
    ds = MarginPolishDataset(files)
    plan = build_stream_plan(ds, None, 3, STITCH)
    sink = StreamingStitcher(plan, STITCH, executor=_InlinePool())
    rng = np.random.default_rng(2)
    labels = {}
    for i in range(len(ds)):
        n = ds.load(i).position.shape[0]
        labels[i] = (rng.integers(0, 5, n).astype(np.uint8),
                     rng.integers(0, 11, n).astype(np.uint8))
    with tempfile.TemporaryDirectory() as d:
        store_path = os.path.join(d, "pred_0.hdf")
        with PredictionStore(store_path, "w") as store:
            for i in reversed(range(len(ds))):
                rec = ds.load(i)
                bases, rles = labels[i]
                assert store.write_prediction(
                    rec.contig, rec.contig_start, rec.contig_end,
                    rec.chunk_id, rec.position, bases, rles)
                sink.add(rec, bases, rles)
        assert sink.ready()
        rows = list(sink.finish_iter([store_path]))
        out = perform_stitch(d, d, "classic", threads=1)
        classic = _read(out).decode()
    got = "".join(f">{c}\n{s}\n" for c, s in rows)
    assert got == classic


def test_stream_disabled_on_resume(setup, tmp_path):
    """--resume runs take the classic path (in-memory view incomplete) and
    still produce identical output."""
    out = str(tmp_path / "o")
    f1 = polish(setup["image_dir"], setup["model"], out, batch_size=8,
                threads=3, stream_stitch=True)
    ref = _read(f1)
    # resume over the COMPLETE store: everything skips, classic stitch runs
    f2 = polish(setup["image_dir"], setup["model"], out, batch_size=8,
                threads=3, resume=True, stream_stitch=True)
    assert _read(f2) == ref


def test_stream_multichunk_regions_string_order(tmp_path):
    """Regions with >= 11 chunks force the lexicographic str(chunk_id)
    merge order ('10' sorts between '1' and '2') — the parity surface the
    store path inherits from HDF5 group-name sorting. Streamed merges must
    replay it from in-memory payloads."""
    import concurrent.futures
    import tempfile

    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.prediction_store import PredictionStore
    from helen_tpu.io.synthetic import random_sequence, write_image_file

    class _InlinePool:
        def submit(self, fn, *a, **k):
            f = concurrent.futures.Future()
            f.set_result(fn(*a, **k))
            return f

        def shutdown(self, **k):
            pass

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    # region_cols=12000 -> 12 chunk images per region (chunk_ids 0..11)
    write_image_file(str(img_dir / "img.h5"),
                     {"big": random_sequence(40000, seed=9)},
                     region_cols=12000, overlap_cols=80, noise=0.2)
    ds = MarginPolishDataset([str(img_dir / "img.h5")])
    per_region = {}
    for i in range(len(ds)):
        c, s, e, k = ds.image_meta(i)
        per_region.setdefault((s, e), set()).add(k)
    assert max(len(v) for v in per_region.values()) >= 11

    plan = build_stream_plan(ds, None, 3, STITCH)
    sink = StreamingStitcher(plan, STITCH, executor=_InlinePool())
    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as d:
        store_path = os.path.join(d, "pred_0.hdf")
        with PredictionStore(store_path, "w") as store:
            for i in range(len(ds)):
                rec = ds.load(i)
                n = rec.position.shape[0]
                bases = rng.integers(0, 5, n).astype(np.uint8)
                rles = rng.integers(0, 11, n).astype(np.uint8)
                assert store.write_prediction(
                    rec.contig, rec.contig_start, rec.contig_end,
                    rec.chunk_id, rec.position, bases, rles)
                sink.add(rec, bases, rles)
        assert sink.ready()
        rows = list(sink.finish_iter([store_path]))
        out = perform_stitch(d, d, "classic", threads=1)
        classic = _read(out).decode()
    got = "".join(f">{c}\n{s}\n" for c, s in rows)
    assert got == classic


def test_prescan_gate_disables_unpacked_streaming(setup, tmp_path,
                                                  monkeypatch, caplog):
    """Above PRESCAN_IMAGE_LIMIT without --pack, polish must skip the
    metadata pre-scan (startup-stall guard) and still produce identical
    output via the classic stage."""
    import helen_tpu.stitch.streaming as streaming

    monkeypatch.setattr(streaming, "PRESCAN_IMAGE_LIMIT", 1)
    f1 = polish(setup["image_dir"], setup["model"], str(tmp_path / "gated"),
                batch_size=8, threads=3, stream_stitch=True)
    f2 = polish(setup["image_dir"], setup["model"], str(tmp_path / "ref"),
                batch_size=8, threads=3, stream_stitch=False)
    assert _read(f1) == _read(f2)
    # packed datasets advertise CHEAP_META and stream at any scale
    f3 = polish(setup["image_dir"], setup["model"], str(tmp_path / "packed"),
                batch_size=8, threads=3, pack=True, stream_stitch=True)
    assert _read(f3) == _read(f2)


def test_plan_mismatch_marks_broken(setup):
    """A record the plan never predicted must break the stream (classic
    fallback), never mis-stitch."""
    files = sorted(
        os.path.join(setup["image_dir"], f)
        for f in os.listdir(setup["image_dir"]) if f.endswith(".h5")
    )
    ds = MarginPolishDataset(files)
    plan = build_stream_plan(ds, None, 2, STITCH)

    class _Pool:
        def submit(self, *a, **k):
            raise AssertionError("must not submit after break")

        def shutdown(self, **k):
            pass

    sink = StreamingStitcher(plan, STITCH, executor=_Pool())
    rec = ds.load(0)

    class _Alien:
        contig = "not-a-contig"
        contig_start = 0
        contig_end = 10
        chunk_id = 0
        position = rec.position

    sink.add(_Alien(), np.ones(5, np.uint8), np.ones(5, np.uint8))
    assert sink.broken and not sink.ready()
