"""Eval interface + polish-resume behavior tests."""
import os

import pytest
torch = pytest.importorskip("torch")

from helen_tpu.cli import main
from helen_tpu.infer.polish import polish
from helen_tpu.io.synthetic import random_sequence, write_image_file

from tests.torch_reference import TorchTransducer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    d = root / "imgs"
    d.mkdir()
    write_image_file(str(d / "i.h5"), {"c": random_sequence(5000, seed=2)},
                     region_cols=800, overlap_cols=80, noise=0.1)
    torch.manual_seed(9)
    m = TorchTransducer()
    pkl = str(root / "m.pkl")
    torch.save({"model_state_dict": m.state_dict(), "model_optimizer": {},
                "hidden_size": 128, "gru_layers": 1, "epochs": 0}, pkl)
    return {"images": str(d), "pkl": pkl, "root": root}


def test_test_cli_writes_artifacts(setup, tmp_path):
    out = str(tmp_path / "t")
    rc = main([
        "test", "--test_image_dir", setup["images"], "-m", setup["pkl"],
        "-b", "8", "-w", "2", "-o", out, "--debug_mismatches",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "confusion_matrix.txt"))
    assert os.path.exists(os.path.join(out, "mismatches.txt"))
    text = open(os.path.join(out, "confusion_matrix.txt")).read()
    assert "base confusion matrix" in text


def test_polish_resume_reuses_predictions_dir(setup, tmp_path):
    out = str(tmp_path / "p")
    polish(setup["images"], setup["pkl"], out, batch_size=8, num_workers=2, threads=1)
    dirs1 = [d for d in os.listdir(out) if d.startswith("predictions_")]
    assert len(dirs1) == 1
    polish(setup["images"], setup["pkl"], out, batch_size=8, num_workers=2,
           threads=1, resume=True)
    dirs2 = [d for d in os.listdir(out) if d.startswith("predictions_")]
    assert dirs2 == dirs1  # no new timestamped dir on resume
