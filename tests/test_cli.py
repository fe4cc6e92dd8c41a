"""CLI tests driven through the real argv surface."""
import os
import subprocess
import sys

import pytest
torch = pytest.importorskip("torch")

from helen_tpu.cli import main
from helen_tpu.io.download import download_models
from helen_tpu.io.fasta import read_fasta
from helen_tpu.io.synthetic import random_sequence, write_image_file

from tests.torch_reference import TorchTransducer


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    image_dir = root / "images"
    image_dir.mkdir()
    write_image_file(
        str(image_dir / "img.h5"),
        {"ctg": random_sequence(6000, seed=8)},
        region_cols=800, overlap_cols=80, noise=0.2,
    )
    torch.manual_seed(5)
    model = TorchTransducer()
    pkl = str(root / "model.pkl")
    torch.save(
        {"model_state_dict": model.state_dict(), "model_optimizer": {},
         "hidden_size": 128, "gru_layers": 1, "epochs": 0},
        pkl,
    )
    return {"root": root, "image_dir": str(image_dir), "pkl": pkl}


def test_version(capsys):
    assert main(["version"]) == 0
    assert "helen_tpu" in capsys.readouterr().out


def test_devices(capsys):
    assert main(["devices"]) == 0
    out = capsys.readouterr().out
    assert "jax" in out and "local devices" in out


def test_no_command_prints_help(capsys):
    assert main([]) == 1
    assert "polish" in capsys.readouterr().out


def test_polish_cli(cli_setup, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = main([
        "polish",
        "-i", cli_setup["image_dir"],
        "-m", cli_setup["pkl"],
        "-o", out_dir,
        "-b", "8",
        "-w", "2",
        "-t", "1",
    ])
    assert rc == 0
    fasta = capsys.readouterr().out.strip().splitlines()[-1]
    names = [n for n, _ in read_fasta(fasta)]
    assert names == ["ctg"]


def test_consensus_then_stitch_cli(cli_setup, tmp_path, capsys):
    pred_dir = str(tmp_path / "preds")
    assert main([
        "call_consensus",
        "-i", cli_setup["image_dir"],
        "-m", cli_setup["pkl"],
        "-o", pred_dir,
        "-b", "8", "-w", "2",
    ]) == 0
    capsys.readouterr()
    out_dir = str(tmp_path / "stitched")
    assert main([
        "stitch", "-i", pred_dir, "-o", out_dir, "-t", "1", "-p", "final",
    ]) == 0
    fasta = capsys.readouterr().out.strip().splitlines()[-1]
    assert os.path.basename(fasta) == "final.fa"
    assert os.path.exists(fasta)


def test_missing_required_arg_exits_2(cli_setup):
    with pytest.raises(SystemExit) as exc:
        main(["polish", "-i", cli_setup["image_dir"]])
    assert exc.value.code == 2


def test_download_models_file_url(tmp_path):
    # mirror layout: manifest CSV (name,url) + model files, over file://
    src = tmp_path / "mirror"
    src.mkdir()
    (src / "model_a.pkl").write_bytes(b"fake model a")
    manifest = src / "manifest.csv"
    (src / "r941_flip235.pkl").write_bytes(b"fake model b")
    manifest = src / "manifest.csv"
    manifest.write_text(
        f"model_a.pkl,file://{src}/model_a.pkl\n# comment line\n"
        # bare model id, like the reference's published description CSV —
        # saved under the URL's real filename (reference keeps wget's name)
        f"r941_flip235,file://{src}/r941_flip235.pkl\n"
    )
    out = tmp_path / "models"
    paths = download_models(str(out), f"file://{manifest}")
    assert len(paths) == 2
    assert open(paths[0], "rb").read() == b"fake model a"
    assert os.path.basename(paths[1]) == "r941_flip235.pkl"
    # second call keeps existing files
    assert download_models(str(out), f"file://{manifest}") == paths


def test_module_invocation():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "helen_tpu", "version"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert proc.returncode == 0
    assert "helen_tpu" in proc.stdout


def test_cli_assess(tmp_path, capsys):
    from helen_tpu.cli import main
    from helen_tpu.io.synthetic import random_sequence

    seq = random_sequence(5000, seed=3)
    truth = tmp_path / "t.fa"
    truth.write_text(f">c\n{seq}\n")
    pol = tmp_path / "p.fa"
    pol.write_text(f">c\n{seq}\n")
    assert main(["assess", "-t", str(truth), "-p", str(pol)]) == 0
    out = capsys.readouterr().out
    assert "TOTAL\t5000\t0 edits" in out
