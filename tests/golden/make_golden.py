"""Record the vendored golden fixture for tests/test_golden_model.py.

Run from the repo root WITH the reference checkout present:

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/make_golden.py

Produces, in tests/golden/:
  * ``golden_model.pkl``   — a reference-format checkpoint created BY the
    reference's own ModelHandler.save_model from a seeded TransducerGRU
    (stands in for a published release pkl: same format, same pipeline —
    the real manifest needs network access this environment doesn't have,
    io/download.py holds the real URL);
  * ``golden.fa``          — the polished FASTA for the deterministic
    synthetic image set of tests/test_golden_model.py, produced ENTIRELY by
    reference code (predict_gpu.py loop replay through the reference model
    class, the reference DataStore, the reference Stitch merge + SSW joins);
  * ``golden_labels.npz``  — the reference vote-loop labels per image.

tests/test_golden_model.py then asserts our pipeline reproduces these bytes
WITHOUT needing /root/reference — recorded-output regression protection.
"""
import hashlib
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from tests.test_golden_model import GOLDEN_IMAGE_SPEC  # noqa: E402
from tests.test_reference_oracle import (  # noqa: E402
    import_reference,
    load_images_like_reference,
    reference_predict_replay,
    reference_stitch_contig,
)


def main() -> None:
    import torch

    ref = import_reference()

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
    pkl = os.path.join(HERE, "golden_model.pkl")
    ref.ModelHandler.save_model(model, opt, ref.TrainOptions.HIDDEN_SIZE,
                                ref.TrainOptions.GRU_LAYERS, 0, pkl)

    import gzip
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        # ALWAYS regenerate from GOLDEN_IMAGE_SPEC — never reuse the vendored
        # gz (which stage_golden_images prefers): re-recording must track the
        # spec, otherwise editing the spec and re-running this script would
        # silently record goldens on the OLD image bytes and the two drift.
        from helen_tpu.io.synthetic import random_sequence, write_image_file

        image_file = os.path.join(tmp, "golden_images.h5")
        contigs = {name: random_sequence(n, seed=seed)
                   for name, (n, seed) in GOLDEN_IMAGE_SPEC.items()}
        write_image_file(image_file, contigs, region_cols=1500,
                         overlap_cols=120, noise=0.15, with_labels=False,
                         seed=9)
        # re-vendor the staged images alongside the outputs they produced:
        # the byte-identity tests must see THESE bytes, not a future numpy
        # Generator's re-rolled ones (distribution methods carry no stream
        # guarantee)
        with open(image_file, "rb") as src, gzip.open(
                os.path.join(HERE, "golden_images.h5.gz"), "wb",
                compresslevel=9) as dst:
            dst.write(src.read())
        model, _, _, _ = ref.ModelHandler.load_simple_model(
            pkl,
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

        labels = {}
        for j, (contig, cs, ce, cid, _, _) in enumerate(records):
            key = f"{contig}-{cs}-{ce}-{cid}"
            labels[f"base/{key}"] = base_labels[j].astype(np.uint8)
            labels[f"rle/{key}"] = rle_labels[j].astype(np.uint8)
        np.savez_compressed(os.path.join(HERE, "golden_labels.npz"), **labels)

        ref_pred = os.path.join(tmp, "ref_predictions_0.hdf")
        store = ref.DataStore(ref_pred, mode="w")
        for j, (contig, cs, ce, cid, _, position) in enumerate(records):
            store.write_prediction(
                contig, torch.tensor(cs), torch.tensor(ce), torch.tensor(cid),
                torch.from_numpy(position), base_labels[j], rle_labels[j],
                image_file,
            )
        store.file_handler.close()

        fasta = os.path.join(HERE, "golden.fa")
        with open(fasta, "w") as f:
            for contig in sorted(GOLDEN_IMAGE_SPEC):
                seq = reference_stitch_contig(ref, [ref_pred], contig, threads=2)
                if seq:
                    f.write(">" + contig + "\n")
                    f.write(seq + "\n")

    with open(fasta, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    print("golden.fa sha256:", digest)
    print("images:", len(records), "| labels keys:", len(labels))


if __name__ == "__main__":
    main()
