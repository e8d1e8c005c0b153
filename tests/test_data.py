"""Data pipeline tests on synthetic PNG fixtures."""

import numpy as np
import pytest

from uncertainty_model_tpu.data import (
    Compose,
    DaVinciDataset,
    DataLoader,
    RandomAugment,
    RandomFlip,
    ResizeImage,
    SCAREDDataset,
    ToArray,
    default_augment_transform,
    default_eval_transform,
)


@pytest.fixture(scope="module")
def davinci_root(tmp_path_factory):
    """Synthetic da Vinci layout: {split}/image_0|image_1/NNN.png."""
    from PIL import Image

    root = tmp_path_factory.mktemp("davinci")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("test", 4)):
        for side in ("image_0", "image_1"):
            d = root / split / side
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, (48, 96, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i:03}.png")
    # one unmatched file in train/image_0
    Image.fromarray(np.zeros((48, 96, 3), np.uint8)).save(
        root / "train" / "image_0" / "999.png"
    )
    return str(root)


@pytest.fixture(scope="module")
def scared_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("scared")
    rng = np.random.default_rng(1)
    for split in ("train", "test"):
        for ds in ("dataset_1",):
            for kf in ("keyframe_1", "keyframe_2"):
                for side in ("left", "right"):
                    d = root / split / ds / kf / side
                    d.mkdir(parents=True)
                    for i in range(2):
                        arr = rng.integers(0, 255, (32, 64, 3), np.uint8)
                        Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


class TestDatasets:
    def test_davinci_pairs_and_drops_unmatched(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train", default_eval_transform((32, 64)))
        assert len(ds) == 6  # 999.png dropped
        for l, r in zip(ds.lefts, ds.rights):
            assert l.split("/")[-1] == r.split("/")[-1]

    def test_davinci_limit_after_sort(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "test", None, limit=2)
        assert len(ds) == 2
        assert ds.lefts == sorted(ds.lefts)

    def test_invalid_split_raises(self, davinci_root):
        with pytest.raises(ValueError):
            DaVinciDataset(davinci_root, "validation")

    def test_scared_layout(self, scared_root):
        ds = SCAREDDataset(scared_root, "train", default_eval_transform((32, 64)))
        assert len(ds) == 4  # 1 dataset x 2 keyframes x 2 frames

    def test_getitem_applies_transform(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "test", default_eval_transform((32, 64)))
        pair = ds[0]
        assert pair["left"].shape == (32, 64, 3)
        assert pair["left"].dtype == np.float32
        assert 0.0 <= pair["left"].min() and pair["left"].max() <= 1.0


class TestTransforms:
    def test_flip_applies_to_both_views(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "test", None)
        from PIL import Image

        left = Image.open(ds.lefts[0]).convert("RGB")
        right = Image.open(ds.rights[0]).convert("RGB")
        t = Compose([ResizeImage((32, 64)), RandomFlip(1.0), ToArray()])
        flipped = t({"left": left, "right": right}, np.random.default_rng(0))
        t_noflip = Compose([ResizeImage((32, 64)), ToArray()])
        plain = t_noflip({"left": left, "right": right}, np.random.default_rng(0))
        np.testing.assert_allclose(flipped["left"], plain["left"][:, ::-1], atol=1e-6)
        np.testing.assert_allclose(flipped["right"], plain["right"][:, ::-1], atol=1e-6)

    def test_augment_is_shared_between_views_and_clipped(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        aug = RandomAugment(1.0, gamma=(0.8, 1.2), brightness=(0.5, 2.0),
                            colour=(0.8, 1.2))
        out = aug({"left": x.copy(), "right": x.copy()}, np.random.default_rng(7))
        np.testing.assert_array_equal(out["left"], out["right"])
        assert out["left"].max() <= 1.0 and out["left"].min() >= 0.0

    def test_augment_deterministic_given_rng(self):
        x = np.full((8, 8, 3), 0.5, np.float32)
        aug = RandomAugment(1.0, (0.8, 1.2), (0.5, 2.0), (0.8, 1.2))
        a = aug({"left": x, "right": x}, np.random.default_rng(11))
        b = aug({"left": x, "right": x}, np.random.default_rng(11))
        np.testing.assert_array_equal(a["left"], b["left"])


class TestDataLoader:
    def test_batching_and_shapes(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train",
                            default_augment_transform((32, 64)))
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2  # 6 samples / 4 -> 4 + 2
        assert batches[0]["left"].shape == (4, 32, 64, 3)
        assert batches[1]["left"].shape == (2, 32, 64, 3)

    def test_drop_last(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train", default_eval_transform((32, 64)))
        loader = DataLoader(ds, batch_size=4, drop_last=True)
        assert len(list(loader)) == 1

    def test_sharding_partitions_data(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train", default_eval_transform((32, 64)))
        seen = []
        for shard in range(2):
            loader = DataLoader(ds, batch_size=3, shard_index=shard, num_shards=2)
            for batch in loader:
                seen.append(batch["left"].shape[0])
        assert sum(seen) == 6

    def test_epoch_reshuffles(self, davinci_root):
        ds = DaVinciDataset(davinci_root, "train", default_eval_transform((32, 64)))
        loader = DataLoader(ds, batch_size=6, shuffle=True, seed=0)
        loader.set_epoch(0)
        a = next(iter(loader))["left"]
        loader.set_epoch(1)
        b = next(iter(loader))["left"]
        assert not np.array_equal(a, b)
