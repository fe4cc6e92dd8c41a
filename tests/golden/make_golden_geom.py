"""Record the GENERALIZED-GEOMETRY golden fixtures (VERDICT r3 item 4).

The flagship fixture (make_golden.py) pins only the 1-layer H=128 geometry;
the stacked-layer and hidden-size generality of models/transducer.py was
otherwise parity-tested only through live torch, which a future environment
may lack. This script records, with the REFERENCE'S OWN code (its
TransducerGRU model class, its predict-loop replay, its DataStore, its
Stitch merge), the consensus labels and polished FASTA for:

  * ``l2_h128`` — 2 stacked bidirectional GRU layers, H=128 (the stacked
    checkpoint layout: deeper layers under "l1" sibling keys);
  * ``h160``    — 1 layer, H=160: NOT a lane-width multiple, so
    resolve_backend must fall back to the xla scan path end-to-end.

Run from the repo root WITH the reference checkout present:

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/make_golden_geom.py

Produces tests/golden/golden_<name>.pkl / _labels.npz / .fa, reusing the
vendored golden image set (golden_images.h5.gz) so no new image fixture is
needed. tests/test_golden_geom.py then asserts byte-identity WITHOUT torch
or /root/reference at test time.
"""
import hashlib
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from tests.test_golden_model import stage_golden_images  # noqa: E402
from tests.test_reference_oracle import (  # noqa: E402
    import_reference,
    load_images_like_reference,
    reference_predict_replay,
    reference_stitch_contig,
)

# name -> (gru_layers, hidden_size, torch seed)
GEOMETRIES = {
    "l2_h128": (2, 128, 21),
    "h160": (1, 160, 22),
}


def main() -> None:
    import gzip  # noqa: F401  (stage_golden_images needs the vendored gz)
    import tempfile

    import torch

    ref = import_reference()

    with tempfile.TemporaryDirectory() as tmp:
        image_file = stage_golden_images(tmp)
        records = load_images_like_reference(ref, image_file)
        images = np.stack([r[4] for r in records])
        contigs = sorted({r[0] for r in records})

        for name, (layers, hidden, seed) in GEOMETRIES.items():
            torch.manual_seed(seed)
            model = ref.ModelHandler.get_new_gru_model(
                input_channels=ref.ImageSizeOptions.IMAGE_CHANNELS,
                image_features=ref.ImageSizeOptions.IMAGE_HEIGHT,
                gru_layers=layers,
                hidden_size=hidden,
                num_base_classes=ref.ImageSizeOptions.TOTAL_BASE_LABELS,
                num_rle_classes=ref.ImageSizeOptions.TOTAL_RLE_LABELS,
            )
            opt = torch.optim.Adam(model.parameters(), lr=1e-4)
            pkl = os.path.join(HERE, f"golden_{name}.pkl")
            ref.ModelHandler.save_model(model, opt, hidden, layers, 0, pkl)
            # also vendor the CONVERTED native checkpoint: the byte-identity
            # tests must run in torch-less environments (loading a pkl needs
            # torch; the npz doesn't), which is the whole point of recording
            # these fixtures
            from helen_tpu.io.checkpoint import load_model_any, save_checkpoint

            params, meta = load_model_any(pkl)
            save_checkpoint(os.path.join(HERE, f"golden_{name}.npz"), params,
                            meta=meta)

            # reload through the reference's own loader (it rebuilds the
            # model from the checkpoint's hidden_size/gru_layers fields,
            # ModelHander.py:50-63) so the recorded outputs prove the pkl
            # round-trips through reference code too
            model, _, _, _ = ref.ModelHandler.load_simple_model(
                pkl,
                input_channels=ref.ImageSizeOptions.IMAGE_CHANNELS,
                image_features=ref.ImageSizeOptions.IMAGE_HEIGHT,
                seq_len=ref.ImageSizeOptions.SEQ_LENGTH,
                num_base_classes=ref.ImageSizeOptions.TOTAL_BASE_LABELS,
                num_rle_classes=ref.ImageSizeOptions.TOTAL_RLE_LABELS,
            )
            model.eval()
            base_labels, rle_labels = reference_predict_replay(
                ref, model, images, gru_layers=layers, hidden_size=hidden)

            labels = {}
            for j, (contig, cs, ce, cid, _, _) in enumerate(records):
                key = f"{contig}-{cs}-{ce}-{cid}"
                labels[f"base/{key}"] = base_labels[j].astype(np.uint8)
                labels[f"rle/{key}"] = rle_labels[j].astype(np.uint8)
            np.savez_compressed(
                os.path.join(HERE, f"golden_{name}_labels.npz"), **labels)

            ref_pred = os.path.join(tmp, f"ref_predictions_{name}.hdf")
            store = ref.DataStore(ref_pred, mode="w")
            for j, (contig, cs, ce, cid, _, position) in enumerate(records):
                store.write_prediction(
                    contig, torch.tensor(cs), torch.tensor(ce),
                    torch.tensor(cid), torch.from_numpy(position),
                    base_labels[j], rle_labels[j], image_file,
                )
            store.file_handler.close()

            fasta = os.path.join(HERE, f"golden_{name}.fa")
            with open(fasta, "w") as f:
                for contig in contigs:
                    seq = reference_stitch_contig(ref, [ref_pred], contig,
                                                  threads=2)
                    if seq:
                        f.write(">" + contig + "\n")
                        f.write(seq + "\n")
            with open(fasta, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()
            print(f"{name}: golden_{name}.fa sha256 {digest} | "
                  f"{len(labels) // 2} images")


if __name__ == "__main__":
    main()
