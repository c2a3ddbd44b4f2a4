"""CLI surface (python -m vmrframe_tpu): the reference main.py contract —
train -> best checkpoint -> eval-only reproduces the saved metric ->
--save-results export.  In-process (same interpreter, CPU platform from
conftest), tiny config, synthetic data."""

import json
import os

import numpy as np
import pytest

from vmrframe_tpu.cli import main

CFG = os.path.join(os.path.dirname(__file__), "configs", "charades_seqpan.yaml")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    result = main(["--config", CFG, "--synthetic", "--epochs", "2",
                   "--suffix", "clitest"])
    assert result is not None and "best_miou" in result
    return result


def test_train_saves_best_checkpoint(trained):
    assert os.path.isdir(trained["best_path"])
    assert np.isfinite(trained["best_miou"])


def test_eval_only_reproduces_saved_metric(trained):
    out = main(["--config", CFG, "--synthetic", "--eval",
                "--checkpoint", trained["best_path"], "--suffix", "clitest"])
    assert out["miou"] == pytest.approx(trained["best_miou"], abs=1e-2)


def test_eval_save_results_exports_predictions(trained, tmp_path):
    dest = str(tmp_path / "preds.json")
    main(["--config", CFG, "--synthetic", "--eval",
          "--checkpoint", trained["best_path"], "--suffix", "clitest",
          "--save-results", dest])
    with open(dest, encoding="utf8") as f:
        preds = json.load(f)
    assert len(preds) > 0
    for p in preds[:4]:
        assert set(p) >= {"vid", "sentence", "pred_time", "gt_time", "iou"}
        s, e = p["pred_time"]
        assert 0.0 <= s <= e + 1e-6
        assert 0.0 <= p["iou"] <= 1.0


def test_epochs_override_and_seed_determinism():
    r1 = main(["--config", CFG, "--synthetic", "--epochs", "1",
               "--suffix", "clidet", "--seed", "7"])
    r2 = main(["--config", CFG, "--synthetic", "--epochs", "1",
               "--suffix", "clidet", "--seed", "7"])
    assert r1["best_miou"] == pytest.approx(r2["best_miou"], abs=1e-4)


def test_train_save_results_exports_history(tmp_path):
    out = tmp_path / "history.json"
    result = main(["--config", CFG, "--synthetic", "--epochs", "2",
                   "--suffix", "clihist", "--save-results", str(out)])
    data = json.loads(out.read_text())
    assert data["best_miou"] == pytest.approx(result["best_miou"])
    assert len(data["history"]) == 2
    assert {"epoch", "r1i3", "r1i5", "r1i7", "miou"} <= set(data["history"][0])


def test_bf16_flag_trains(tmp_path):
    result = main(["--config", CFG, "--synthetic", "--epochs", "1",
                   "--suffix", "clibf16", "--bf16"])
    assert np.isfinite(result["best_miou"])
