"""Native C++ loader tests: PIL-parity of decode+resize, loader integration."""

import numpy as np
import pytest

from uncertainty_model_tpu.data import (
    DaVinciDataset,
    DataLoader,
    default_augment_transform,
    default_eval_transform,
)

native = pytest.importorskip("uncertainty_model_tpu.data.native")

if not native.native_available():
    pytest.skip("native loader could not be built", allow_module_level=True)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (96, 192, 3), np.uint8)
        p = d / f"{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def davinci_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("davinci")
    rng = np.random.default_rng(1)
    for side in ("image_0", "image_1"):
        d = root / "train" / side
        d.mkdir(parents=True)
        for i in range(6):
            arr = rng.integers(0, 255, (48, 96, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i:03}.png")
    return str(root)


class TestNativeDecode:
    @pytest.mark.parametrize("size", [(48, 96), (96, 192), (64, 100)])
    def test_matches_pil_bilinear(self, pngs, size):
        from PIL import Image

        h, w = size
        got = native.decode_resize_batch(pngs, h, w, num_threads=3)
        expected = np.stack([
            np.asarray(Image.open(p).resize((w, h), Image.BILINEAR), np.float32) / 255.0
            for p in pngs
        ])
        # PIL rounds to uint8 between the two passes; we keep float.
        assert np.abs(got - expected).max() <= (1.0 / 255.0) + 1e-6

    def test_missing_file_raises(self, pngs):
        with pytest.raises(IOError):
            native.decode_resize_batch([pngs[0], "/nonexistent.png"], 16, 16)


class TestNativeLoader:
    def test_matches_pil_loader_with_augment(self, davinci_root):
        """Same seeds -> identical flips/augments on both backends; images
        themselves agree within PIL's 1-LSB intermediate rounding."""
        t = default_augment_transform((32, 64))
        ds = DaVinciDataset(davinci_root, "train", t)

        pil = DataLoader(ds, 3, shuffle=True, seed=5, backend="pil")
        nat = DataLoader(ds, 3, shuffle=True, seed=5, backend="native")
        assert nat._native_size == (32, 64)

        for b_pil, b_nat in zip(pil, nat):
            assert b_pil["left"].shape == b_nat["left"].shape
            assert np.abs(b_pil["left"] - b_nat["left"]).max() < 0.05
            assert np.abs(b_pil["right"] - b_nat["right"]).max() < 0.05

    def test_eval_transform_parity(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train", default_eval_transform((32, 64)))
        pil = DataLoader(ds, 6, backend="pil")
        nat = DataLoader(ds, 6, backend="native")
        a = next(iter(pil))
        b = next(iter(nat))
        assert np.abs(a["left"] - b["left"]).max() <= (1.0 / 255.0) + 1e-6
