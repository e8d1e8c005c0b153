"""End-to-end CLI smoke test: the local_test.sh recipe on synthetic data.

Exercises the full user path — argparse -> config -> datasets -> loaders ->
trainer -> evaluator -> checkpoints -> results.json — like the reference's
scripts/local_test.sh, on the tiny config.
"""

import json
import os

import numpy as np
import pytest

pytestmark = [pytest.mark.slow]


@pytest.fixture(scope="module")
def data_home(tmp_path_factory):
    """Synthetic ~/datasets/da-vinci tree."""
    from PIL import Image

    home = tmp_path_factory.mktemp("home")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("test", 4)):
        for side in ("image_0", "image_1"):
            d = home / "datasets" / "da-vinci" / split / side
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, (48, 96, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i:03}.png")
    return str(home)


class TestCLI:
    def test_local_test_recipe(self, data_home, tmp_path):
        from uncertainty_model_tpu.cli.main import build_parser, main

        args = build_parser().parse_args([
            "configs/tiny.yml", "da-vinci",
            "--epochs", "2",
            "--batch-size", "8",
            "--training-size", "8",
            "--validation-size", "4",
            "--workers", "2",
            "--image-size", "32", "64",
            "--save-model-every", "1",
            "--evaluate-every", "1",
            "--save-model-to", str(tmp_path / "trained"),
            "--save-results-to", str(tmp_path / "results"),
            "--no-pbar",
            "--home", data_home,
        ])
        main(args)

        model_runs = os.listdir(tmp_path / "trained")
        assert len(model_runs) == 1
        contents = os.listdir(tmp_path / "trained" / model_runs[0])
        assert "final" in contents
        assert "epoch_001" in contents and "epoch_002" in contents

        results_runs = os.listdir(tmp_path / "results")
        results_file = tmp_path / "results" / results_runs[0] / "results.json"
        with open(results_file) as f:
            results = json.load(f)
        assert len(results["losses"]["training"]["disparity"]) == 2
        assert len(results["losses"]["validation"]["ssim"]["left"]) == 2
        assert np.isfinite(results["losses"]["training"]["disparity"][0])
        assert (tmp_path / "results" / results_runs[0]
                / "epoch_001" / "uncertainty.png").exists()

    def test_finetune_from_checkpoint(self, data_home, tmp_path):
        from uncertainty_model_tpu.cli.main import build_parser, main

        # train 1 epoch and save
        args = build_parser().parse_args([
            "configs/tiny.yml", "da-vinci",
            "--epochs", "1", "--batch-size", "8",
            "--training-size", "8", "--validation-size", "4",
            "--workers", "2", "--image-size", "32", "64",
            "--save-model-every", "1", "--evaluate-every", "10",
            "--save-model-to", str(tmp_path / "trained"),
            "--no-pbar", "--home", data_home,
        ])
        main(args)
        run = os.listdir(tmp_path / "trained")[0]
        ckpt = str(tmp_path / "trained" / run / "final")

        args = build_parser().parse_args([
            "configs/tiny.yml", "da-vinci",
            "--epochs", "1", "--batch-size", "8",
            "--training-size", "8", "--validation-size", "4",
            "--workers", "2", "--image-size", "32", "64",
            "--evaluate-every", "10",
            "--finetune-from", ckpt,
            "--no-pbar", "--home", data_home,
        ])
        main(args)  # must not raise

    def test_bayesian_loss_config(self, data_home, tmp_path):
        """BASELINE config #2: error_loss_config.loss_type=bayesian."""
        import yaml

        from uncertainty_model_tpu.cli.main import build_parser, main

        with open("configs/tiny.yml") as f:
            cfg = yaml.safe_load(f)
        cfg["loss"]["error_loss_config"]["loss_type"] = "bayesian"
        cfg_path = tmp_path / "bayesian.yml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)

        args = build_parser().parse_args([
            str(cfg_path), "da-vinci",
            "--epochs", "1", "--batch-size", "8",
            "--training-size", "8", "--validation-size", "4",
            "--workers", "2", "--image-size", "32", "64",
            "--evaluate-every", "10",
            "--no-pbar", "--home", data_home,
        ])
        main(args)  # must train without NaNs/exceptions
