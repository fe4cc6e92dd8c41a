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


def reference_predict_replay(ref, model, images_u8):
    """Verbatim replay of the reference inference loop
    (predict_gpu.py:94-159) on CPU through the reference model object:
    float conversion, zero hidden, 19 windows of 100 at stride 50, softmax +
    ZeroPad2d + add voting, torch.max argmax."""
    torch = ref.torch
    nn = torch.nn
    images = torch.from_numpy(images_u8).type(torch.FloatTensor)
    hidden = torch.zeros(images.size(0), 2 * ref.TrainOptions.GRU_LAYERS,
                         ref.TrainOptions.HIDDEN_SIZE)
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


def test_end_to_end_fasta_byte_identity_vs_reference_code(
    ref, ref_model_pkl, tmp_path
):
    """Full-pipeline oracle: our call_consensus + perform_stitch FASTA ==
    a FASTA produced entirely by reference code (their model/loop writing
    through their DataStore, their Stitch merge + SSW joins, their
    StitchInterface write format, StitchInterface.py:104-106)."""
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
        ref_model_pkl,
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
        image_files=[image_file], model_path=ref_model_pkl,
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
