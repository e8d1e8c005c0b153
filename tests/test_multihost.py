"""Real multi-process (multi-host) data-parallel training.

Launches TWO OS processes that rendezvous through
``jax.distributed.initialize`` (the env:// analogue of reference
parallel_main.py:86-87) and run ``cli/parallel_main.py`` end-to-end: each
process owns 2 virtual CPU devices (4-device global mesh), loads its own
shard of the data (the DistributedSampler analogue) and contributes its
shard of every global batch via ``jax.make_array_from_process_local_data``
(parallel/mesh.py).  This strictly exceeds the reference's world-size-1
NCCL smoke trick (scripts/parallel_test.sh:5-10) — the reference never
tests an actual multi-process world.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_home(tmp_path_factory):
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


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_world(data_home, tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        # 2 local virtual devices per process -> 4-device global mesh
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", ""
            ).strip() + " --xla_force_host_platform_device_count=2"
        ).strip()
        cmd = [
            sys.executable, "-m", "uncertainty_model_tpu.cli.parallel_main",
            "configs/tiny.yml", "da-vinci",
            "--platform", "cpu",
            "--coordinator-address", f"localhost:{port}",
            "--num-processes", "2",
            "--process-id", str(rank),
            "--epochs", "1",
            "--batch-size", "8",
            "--training-size", "8",
            "--validation-size", "4",
            "--workers", "1",
            "--image-size", "32", "64",
            "--save-model-every", "1",
            "--evaluate-every", "1",
            "--save-model-to", str(tmp_path / "trained"),
            "--save-results-to", str(tmp_path / "results"),
            "--no-pbar",
            "--home", data_home,
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # both ranks saw the 4-device global mesh
    assert "over 4 device(s)" in outputs[0]
    assert "over 4 device(s)" in outputs[1]

    # rank 0 (and only rank 0) wrote checkpoints + results
    run = os.listdir(tmp_path / "trained")
    assert len(run) == 1
    assert "final" in os.listdir(tmp_path / "trained" / run[0])
    results_run = os.listdir(tmp_path / "results")[0]
    with open(tmp_path / "results" / results_run / "results.json") as f:
        results = json.load(f)
    losses = results["losses"]["training"]["disparity"]
    assert len(losses) == 1 and np.isfinite(losses[0])
