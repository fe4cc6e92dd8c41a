"""Parity against the reference's OWN code (not replicas).

tests/torch_reference.py and tests/test_stitch.py validate helen_tpu against
hand-rewritten oracles; a transcription error there would let both sides be
wrong together. These tests import the actual reference implementation from
the read-only checkout at /root/reference and assert:

  * model + vote parity: labels from our consensus_labels equal a verbatim
    replay of predict_gpu.py:94-159 through the reference TransducerGRU
    class, loading the same .pkl through the reference ModelHandler;
  * stitch parity: the reference Stitch.small_chunk_stitch/alignment_stitch
    (Stitch.py:96-255) over a prediction file produce byte-identical contig
    sequences to our Stitcher;
  * end-to-end FASTA byte identity: our call_consensus + perform_stitch
    output equals a FASTA built entirely reference-side (their model loop,
    their DataStore, their Stitch, their StitchInterface write format).

Everything is skipped when the reference checkout is absent. Two
environment shims are required to RUN (not alter) the 2019-era reference
code on today's stack: ``np.int``/``np.str`` aliases (removed in numpy
1.24/2.0; Stitch.py:224-225, dataloader_predict.py:66-82) and a stand-in
``helen.build.HELEN`` module exposing our ctypes Aligner/Filter/Alignment —
which tests/test_ssw_oracle.py separately proves field-identical to the
reference's compiled ssw.c/ssw_cpp.cpp.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "helen")),
    reason="reference checkout not available",
)


def import_reference():
    """Import the reference package with the environment shims installed.

    Also used by tests/golden/make_golden.py to record the vendored golden
    outputs (tests/test_golden_model.py)."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    # numpy 2.x removed the np.int / np.str aliases the reference uses
    # (Stitch.py:224-225); restore them so its code runs unmodified.
    # (__dict__ check, not hasattr: numpy's __getattr__ warns on np.str)
    if "int" not in np.__dict__:
        np.int = int  # noqa: NPY001
    if "str" not in np.__dict__:
        np.str = str  # noqa: NPY001
    # Stitch.py does `from helen.build import HELEN` (its pybind11 module,
    # never built here). Provide the same Aligner/Filter/Alignment API from
    # our ctypes binding, which test_ssw_oracle.py proves identical to the
    # reference's compiled SSW.
    if "helen.build" not in sys.modules:
        import helen as ref_helen_pkg

        from helen_tpu.stitch import Aligner, Alignment, Filter

        build_mod = types.ModuleType("helen.build")
        build_mod.HELEN = types.SimpleNamespace(
            Aligner=Aligner, Filter=Filter, Alignment=Alignment
        )
        sys.modules["helen.build"] = build_mod
        ref_helen_pkg.build = build_mod

    from helen.modules.python.DataStore import DataStore
    from helen.modules.python.FileManager import FileManager
    from helen.modules.python.models.ModelHander import ModelHandler
    from helen.modules.python.Options import (
        ImageSizeOptions,
        StitchOptions,
        TrainOptions,
    )
    from helen.modules.python.Stitch import Stitch

    return types.SimpleNamespace(
        torch=torch,
        DataStore=DataStore,
        FileManager=FileManager,
        ModelHandler=ModelHandler,
        ImageSizeOptions=ImageSizeOptions,
        StitchOptions=StitchOptions,
        TrainOptions=TrainOptions,
        Stitch=Stitch,
    )


@pytest.fixture(scope="module")
def ref():
    pytest.importorskip("torch")
    return import_reference()


@pytest.fixture(scope="module")
def ref_model_pkl(ref, tmp_path_factory):
    """A checkpoint created BY the reference (ModelHandler.save_model) from a
    reference-class TransducerGRU instance."""
    torch = ref.torch
    torch.manual_seed(11)
    model = ref.ModelHandler.get_new_gru_model(
        input_channels=ref.ImageSizeOptions.IMAGE_CHANNELS,
        image_features=ref.ImageSizeOptions.IMAGE_HEIGHT,
        gru_layers=ref.TrainOptions.GRU_LAYERS,
        hidden_size=ref.TrainOptions.HIDDEN_SIZE,
        num_base_classes=ref.ImageSizeOptions.TOTAL_BASE_LABELS,
        num_rle_classes=ref.ImageSizeOptions.TOTAL_RLE_LABELS,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    path = str(tmp_path_factory.mktemp("ref_model") / "ref_model.pkl")
    ref.ModelHandler.save_model(model, opt, ref.TrainOptions.HIDDEN_SIZE,
                                ref.TrainOptions.GRU_LAYERS, 0, path)
    return path


def reference_predict_replay(ref, model, images_u8, gru_layers=None,
                             hidden_size=None):
    """Verbatim replay of the reference inference loop
    (predict_gpu.py:94-159) on CPU through the reference model object:
    float conversion, zero hidden, 19 windows of 100 at stride 50, softmax +
    ZeroPad2d + add voting, torch.max argmax. ``gru_layers``/``hidden_size``
    default to the flagship TrainOptions geometry; the generalized-geometry
    golden recorder (tests/golden/make_golden_geom.py) passes the model's
    own dimensions, mirroring how the reference rebuilds a model from
    checkpoint fields (ModelHander.py:50-63)."""
    torch = ref.torch
    nn = torch.nn
    if gru_layers is None:
        gru_layers = ref.TrainOptions.GRU_LAYERS
    if hidden_size is None:
        hidden_size = ref.TrainOptions.HIDDEN_SIZE
    images = torch.from_numpy(images_u8).type(torch.FloatTensor)
    hidden = torch.zeros(images.size(0), 2 * gru_layers, hidden_size)
    prediction_base_tensor = torch.zeros(
        (images.size(0), images.size(1), ref.ImageSizeOptions.TOTAL_BASE_LABELS))
    prediction_rle_tensor = torch.zeros(
        (images.size(0), images.size(1), ref.ImageSizeOptions.TOTAL_RLE_LABELS))
    with torch.no_grad():
        for i in range(0, ref.ImageSizeOptions.SEQ_LENGTH,
                       ref.TrainOptions.WINDOW_JUMP):
            if i + ref.TrainOptions.TRAIN_WINDOW > ref.ImageSizeOptions.SEQ_LENGTH:
                break
            chunk_start = i
            chunk_end = i + ref.TrainOptions.TRAIN_WINDOW
            image_chunk = images[:, chunk_start:chunk_end]
            output_base, output_rle, hidden = model(image_chunk, hidden)
            top_zeros = chunk_start
            bottom_zeros = ref.ImageSizeOptions.SEQ_LENGTH - chunk_end
            inference_layers = nn.Sequential(
                nn.Softmax(dim=2),
                nn.ZeroPad2d((0, 0, top_zeros, bottom_zeros)),
            )
            prediction_base_tensor = torch.add(
                prediction_base_tensor, inference_layers(output_base))
            prediction_rle_tensor = torch.add(
                prediction_rle_tensor, inference_layers(output_rle))
    _, base_labels = torch.max(prediction_base_tensor, 2)
    _, rle_labels = torch.max(prediction_rle_tensor, 2)
    return base_labels.numpy(), rle_labels.numpy()


def load_images_like_reference(ref, image_file):
    """Replicates the reference predict dataset's load + pad
    (dataloader_predict.py:61-88, minus the torchvision import its module
    drags in): uint8 image zero-padded to SEQ_LENGTH, position padded with
    (-1,-1,-1) rows. Returns records in the reference's enumeration order
    (h5py key order, dataloader_predict.py:40-46)."""
    import h5py

    records = []
    with h5py.File(image_file, "r") as f:
        for name in list(f["images"].keys()):
            g = f["images"][name]
            contig = g["contig"][()][0].decode()
            contig_start = int(g["contig_start"][()][0])
            contig_end = int(g["contig_end"][()][0])
            chunk_id = int(g["feature_chunk_idx"][()][0])
            image = g["image"][()].astype(np.uint8)
            position = g["position"][()].astype(np.int64)
            seq_len = ref.ImageSizeOptions.SEQ_LENGTH
            if image.shape[0] < seq_len:
                pad = seq_len - image.shape[0]
                image = np.append(
                    image,
                    np.zeros((pad, ref.ImageSizeOptions.IMAGE_HEIGHT)), 0
                ).astype(np.uint8)
                position = np.append(
                    position, np.array([[-1, -1, -1]] * pad), 0
                ).astype(np.int64)
            records.append((contig, contig_start, contig_end, chunk_id,
                            image, position))
    return records


def reference_stitch_contig(ref, prediction_files, contig, threads=2):
    """The reference stitch for one contig, executed through the reference's
    own code: chunk-key collection exactly as StitchInterface.perform_stitch
    (StitchInterface.py:82-95), then create_consensus_sequence's
    orchestration (Stitch.py:257-301) with small_chunk_stitch /
    alignment_stitch called in-process instead of through its
    ProcessPoolExecutor (identical result: the reference sorts worker
    outputs before the final join, Stitch.py:296)."""
    import h5py

    chunk_name_tuple = []
    for prediction_file in prediction_files:
        with h5py.File(prediction_file, "r") as hdf5_file:
            if contig not in list(hdf5_file["predictions"].keys()):
                continue
            for chunk_key in sorted(hdf5_file["predictions"][contig].keys()):
                st = hdf5_file["predictions"][contig][chunk_key]["contig_start"][()]
                en = hdf5_file["predictions"][contig][chunk_key]["contig_end"][()]
                chunk_name_tuple.append((prediction_file, chunk_key, st, en))

    stitch = ref.Stitch()
    keys = [(contig, f, ck, int(st), int(en))
            for f, ck, st, en in chunk_name_tuple]
    keys = sorted(keys, key=lambda e: (e[3], e[4]))
    groups = ref.FileManager.chunks(
        keys,
        max(ref.StitchOptions.MIN_SEQUENCE_REQUIRED_FOR_MULTITHREADING,
            int(len(keys) / threads) + 1),
    )
    sequence_chunks = [stitch.small_chunk_stitch(contig, g) for g in groups]
    sequence_chunks = sorted(sequence_chunks,
                             key=lambda element: (element[1], element[2]))
    _, _, _, sequence = stitch.alignment_stitch(sequence_chunks)
    return sequence


def test_vote_loop_parity_vs_reference_code(ref, ref_model_pkl, rng):
    """Our consensus labels == the reference model class + verbatim
    predict_gpu loop, both fed the SAME reference-saved .pkl."""
    import jax

    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.models.transducer import consensus_labels

    model, hidden_size, gru_layers, _ = ref.ModelHandler.load_simple_model(
        ref_model_pkl,
        input_channels=ref.ImageSizeOptions.IMAGE_CHANNELS,
        image_features=ref.ImageSizeOptions.IMAGE_HEIGHT,
        seq_len=ref.ImageSizeOptions.SEQ_LENGTH,
        num_base_classes=ref.ImageSizeOptions.TOTAL_BASE_LABELS,
        num_rle_classes=ref.ImageSizeOptions.TOTAL_RLE_LABELS,
    )
    model.eval()
    assert (hidden_size, gru_layers) == (128, 1)

    images = rng.integers(0, 40, size=(4, 1000, 90)).astype(np.uint8)
    want_base, want_rle = reference_predict_replay(ref, model, images)

    params, meta = load_model_any(ref_model_pkl)
    assert meta["hidden_size"] == 128 and meta["gru_layers"] == 1
    got_base, got_rle = consensus_labels(
        params, images.astype(np.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert (np.asarray(got_base) == want_base).all()
    assert (np.asarray(got_rle) == want_rle).all()


def test_stitch_parity_vs_reference_code(ref, tmp_path):
    """Reference Stitch.py over a prediction file == our Stitcher, byte for
    byte, including multi-chunk regions and the uint32-wrapped padding rows
    both pipelines carry (DataStore.py:125-127 / prediction_store)."""
    from helen_tpu.io.synthetic import random_sequence, write_prediction_file
    from helen_tpu.stitch.engine import Stitcher

    pred = str(tmp_path / "preds_0.hdf")
    contigs = {
        "ctgA": random_sequence(6000, seed=5),
        "ctgB": random_sequence(4000, seed=6),
    }
    # region_cols > seq_length so regions split into multiple chunks (the
    # final short chunk exercises store-side padding semantics)
    write_prediction_file(pred, contigs, region_cols=1500, overlap_cols=120)

    ours = Stitcher(threads=2)
    for contig in contigs:
        want = reference_stitch_contig(ref, [pred], contig, threads=2)
        got = ours.stitch([pred], contig)
        assert got == want, (
            f"{contig}: ours {len(got)}bp != reference {len(want)}bp"
        )


# ---------------------------------------------------------------------------
# randomized-geometry stitch fuzz against the reference's OWN Stitch
# (the property test in tests/test_stitch.py targets _StringStitch, a
# hand-rewritten replica; these run the same adversarial geometries through
# the actual Stitch.py code so a shared transcription error cannot hide)
# ---------------------------------------------------------------------------


def _write_region_store(path, contig, regions, rng=None):
    """Write hand-crafted (start, end, seq) regions in the prediction-store
    schema; each region optionally split into 1-3 contiguous chunks (the
    store layout real inference produces when region_cols > seq_length)."""
    from helen_tpu.io.prediction_store import PredictionStore
    from helen_tpu.io.synthetic import rle_encode

    with PredictionStore(path, "w") as store:
        for start, end, seq in regions:
            if seq:
                bases, runs = rle_encode(seq, max_run=10)
            else:
                # a region that decodes to "" (empty MarginPolish region):
                # gap labels with run 0 — label_decoder[0] * 0 == "". Needs
                # >= 2 positions: the reference's dict_fetch (Stitch.py:242)
                # is operator.itemgetter(*pos_list), which returns a scalar
                # (not a tuple) for a single position and crashes list().
                bases = np.zeros(4, dtype=np.int64)
                runs = np.zeros(4, dtype=np.int64)
            n = len(bases)
            position = np.zeros((n, 3), dtype=np.int64)
            position[:, 0] = np.arange(n)
            if rng is not None and n > 3:
                cuts = sorted({0, n} | {int(rng.integers(1, n))
                                        for _ in range(int(rng.integers(0, 3)))})
            else:
                cuts = [0, n]
            for cid, (a, b) in enumerate(zip(cuts[:-1], cuts[1:])):
                store.write_prediction(contig, start, end, cid,
                                       position[a:b], bases[a:b], runs[a:b])


def _fuzz_regions(rng):
    """Random region geometries biased to force every alignment_stitch
    branch of Stitch.py:137-188: anchored joins, mutated overlaps, zero-score
    overlaps (garbage), unanchorable short overlaps, and coordinate gaps."""

    def body(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    seq = body(int(rng.integers(200, 700)))
    regions = [[0, len(seq), seq]]
    for _ in range(int(rng.integers(4, 10))):
        prev_start, prev_end, prev_seq = regions[-1]
        t = ["clean", "clean", "clean", "noanchor", "garbage", "gap"][
            int(rng.integers(0, 6))]
        b = body(int(rng.integers(120, 600)))
        if t == "clean":
            ov = min(int(rng.integers(20, 120)), len(prev_seq) - 1)
            prefix = list(prev_seq[-ov:])
            for _ in range(int(rng.integers(0, 3))):
                prefix[int(rng.integers(0, ov))] = \
                    "ACGT"[int(rng.integers(0, 4))]
            seq, start = "".join(prefix) + b, prev_end - ov
        elif t == "noanchor":
            # 5-base exact overlap: positive score, grouped M run 5 < 8
            seq, start = prev_seq[-5:] + b, prev_end - 5
        elif t == "garbage":
            # retrofit the previous tail to poly-A and lead with poly-C:
            # an all-mismatch overlap has local-alignment score 0
            ov = int(rng.integers(12, 40))
            regions[-1][2] = prev_seq[:-ov] + "A" * ov
            seq, start = "C" * ov + b, prev_end - ov
        else:  # gap: this_start >= running_end
            seq, start = b, prev_end + int(rng.integers(1, 80))
        regions.append([start, start + len(seq), seq])
    return [tuple(r) for r in regions]


@pytest.mark.parametrize("seed", range(20))
def test_stitch_fuzz_random_geometry_vs_reference(ref, tmp_path, seed):
    """>=20 random region/overlap/chunk/noise geometries, byte-compared
    against the reference's own Stitch (VERDICT r2 item 3)."""
    from helen_tpu.stitch.engine import Stitcher

    rng = np.random.default_rng(7000 + seed)
    regions = _fuzz_regions(rng)
    pred = str(tmp_path / "fuzz_0.hdf")
    _write_region_store(pred, "ctgF", regions, rng=rng)
    # same thread count on both sides: the reference's key-grouping changes
    # which junctions meet inside a group vs at the group join, and for
    # fallback-heavy layouts the output legitimately depends on it (verified:
    # the reference itself returns different bytes at threads=2 vs 1/3 for
    # some geometries; our engine tracks it exactly at every count).
    threads = int(rng.integers(1, 4))
    want = reference_stitch_contig(ref, [pred], "ctgF", threads=threads)
    got = Stitcher(threads=threads).stitch([pred], "ctgF")
    assert got == want, (seed, threads, len(got), len(want))


def test_stitch_fallback_branches_match_reference(ref, tmp_path, capfd):
    """One geometry that provably walks EVERY fallback branch of the
    reference alignment_stitch (Stitch.py:137-188): zero-score overlap
    (join and drop sub-branches, including an empty region), unanchorable
    overlap (join and drop), and coordinate gap (join and drop). Branch
    execution is proven by the reference's own stderr warnings; the final
    sequence must still byte-match our engine."""
    from helen_tpu.io.synthetic import random_sequence
    from helen_tpu.stitch.engine import Stitcher

    b0 = random_sequence(300, seed=81)
    b2 = random_sequence(280, seed=82)
    b3 = random_sequence(250, seed=83)
    b6 = random_sequence(200, seed=84)
    r0 = (0, 315, b0[:300] + "A" * 15)                  # tail A^15
    e0 = r0[1]
    # zero-score overlap, len(right_overlap)=15 > 10 -> N-join of the
    # overlap head only (the reference discards the region body here)
    r1 = (e0 - 15, e0 - 15 + 215, "C" * 15 + b2[:200])
    e1 = r1[1]
    # zero-score overlap, ov=8 <= 10 -> whole region dropped, running_end
    # stays e1 (running tail is the C^15 junction-1 appended)
    r2 = (e1 - 8, e1 - 8 + 288, "A" * 8 + b2)
    # unanchorable 5-base exact overlap ('CCCCC' vs the C^15 tail),
    # len > 10 -> N-join of the whole region
    r3 = (e1 - 5, e1 - 5 + 255, "CCCCC" + b3)
    e3 = r3[1]
    # empty region decoding to "": zero-score, len 0 -> dropped
    r4 = (e3 - 20, e3 - 20, "")
    # unanchorable 5-base exact overlap with a tiny region (len 8 <= 10)
    # -> dropped
    r5 = (e3 - 5, e3 - 5 + 8, b3[-5:] + "GCA")
    # coordinate gap, len > 10 -> N-join
    r6 = (e3 + 25, e3 + 25 + 200, b6)
    e6 = r6[1]
    # coordinate gap with a tiny region -> dropped
    r7 = (e6 + 10, e6 + 10 + 8, "ACGTACGT")

    regions = [r0, r1, r2, r3, r4, r5, r6, r7]
    pred = str(tmp_path / "branches_0.hdf")
    _write_region_store(pred, "ctgB", regions)

    capfd.readouterr()  # drain
    want = reference_stitch_contig(ref, [pred], "ctgB", threads=1)
    err = capfd.readouterr().err
    assert err.count("NO ALIGNMENT FOUND") >= 3, err      # r1, r2, r4
    assert err.count("NO OVERLAPS IN ALIGNMENT") >= 2, err  # r3, r5
    assert err.count("NO OVERLAP IN CHUNKS") >= 2, err      # r6, r7
    got = Stitcher(threads=1).stitch([pred], "ctgB")
    assert got == want
    # the joins that survive: r0, N, C^15, (r3 anchor-fail join), N, r6
    assert want.count("N" * 10) >= 3
    assert b2 not in want  # r2 dropped; junction-1 kept only the C^15 head


def fasta_byte_identity_check(ref, model_pkl, tmp_path):
    """Shared oracle body: our call_consensus + perform_stitch FASTA ==
    a FASTA produced entirely by reference code (their model/loop writing
    through their DataStore, their Stitch merge + SSW joins, their
    StitchInterface write format, StitchInterface.py:104-106). Used both
    with a reference-saved fresh pkl (below) and with a REAL released
    checkpoint (tests/test_released_model.py)."""
    import torch

    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.synthetic import random_sequence, write_image_file

    image_file = str(tmp_path / "images.h5")
    contigs = {
        "ctgA": random_sequence(4500, seed=21),
        "ctgB": random_sequence(3000, seed=22),
    }
    write_image_file(image_file, contigs, region_cols=1500, overlap_cols=120,
                     noise=0.15, with_labels=False)

    # ---- reference side: replayed loop -> their DataStore -> their Stitch
    model, _, _, _ = ref.ModelHandler.load_simple_model(
        model_pkl,
        input_channels=ref.ImageSizeOptions.IMAGE_CHANNELS,
        image_features=ref.ImageSizeOptions.IMAGE_HEIGHT,
        seq_len=ref.ImageSizeOptions.SEQ_LENGTH,
        num_base_classes=ref.ImageSizeOptions.TOTAL_BASE_LABELS,
        num_rle_classes=ref.ImageSizeOptions.TOTAL_RLE_LABELS,
    )
    model.eval()
    records = load_images_like_reference(ref, image_file)
    images = np.stack([r[4] for r in records])
    base_labels, rle_labels = reference_predict_replay(ref, model, images)

    ref_pred = str(tmp_path / "ref_predictions_0.hdf")
    store = ref.DataStore(ref_pred, mode="w")
    for j, (contig, cs, ce, cid, _, position) in enumerate(records):
        # the reference loop hands DataStore torch tensors (it calls .item();
        # predict_gpu.py:176-179)
        store.write_prediction(
            contig, torch.tensor(cs), torch.tensor(ce), torch.tensor(cid),
            torch.from_numpy(position),
            base_labels[j], rle_labels[j], image_file,
        )
    store.file_handler.close()

    ref_fasta = str(tmp_path / "reference.fa")
    with open(ref_fasta, "w") as f:
        for contig in sorted(contigs):  # StitchInterface.py:77
            seq = reference_stitch_contig(ref, [ref_pred], contig, threads=2)
            if seq is not None and len(seq) > 0:
                f.write(">" + contig + "\n")
                f.write(seq + "\n")

    # ---- our side: the production pipeline over the same images + model
    out_dir = str(tmp_path / "ours")
    call_consensus(
        image_files=[image_file], model_path=model_pkl,
        output_dir=out_dir, batch_size=4, num_workers=2,
    )
    our_fasta = perform_stitch(out_dir, out_dir, "ours", threads=1)

    with open(ref_fasta, "rb") as f:
        want = f.read()
    with open(our_fasta, "rb") as f:
        got = f.read()
    assert got == want, (
        f"FASTA bytes differ: ours {len(got)}B vs reference {len(want)}B"
    )
    assert len(want) > 0


def test_end_to_end_fasta_byte_identity_vs_reference_code(
    ref, ref_model_pkl, tmp_path
):
    fasta_byte_identity_check(ref, ref_model_pkl, tmp_path)
