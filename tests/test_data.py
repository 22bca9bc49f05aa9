"""Data-layer tests: datasets over synthetic files, loader sharding/collate,
latent shard round-trip, CFG dropout, text encoding."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stablediffusion_pytorch_tpu.data import (
    CelebDataset,
    DataLoader,
    MnistDataset,
    load_latents,
    save_latent_shards,
)
from stablediffusion_pytorch_tpu.data.text import (
    CLIPTextEncoder,
    HashTokenizer,
    get_text_representation,
    get_tokenizer_and_model,
)
from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
    drop_class_condition,
    drop_image_condition,
    drop_text_condition,
)
from flax import nnx


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mnist") / "train"
    for cls in range(3):
        d = root / str(cls)
        d.mkdir(parents=True)
        for i in range(4):
            arr = np.full((28, 28), 40 * cls + i, np.uint8)
            Image.fromarray(arr, "L").save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def celeb_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeb")
    (root / "CelebA-HQ-img").mkdir()
    (root / "celeba-caption").mkdir()
    (root / "CelebAMask-HQ-mask").mkdir()
    for i in range(6):
        rgb = np.random.default_rng(i).integers(0, 255, (64, 48, 3), np.uint8)
        Image.fromarray(rgb).save(root / "CelebA-HQ-img" / f"{i}.jpg")
        (root / "celeba-caption" / f"{i}.txt").write_text(
            f"a face number {i}\nanother caption {i}\n")
        mask = np.random.default_rng(100 + i).integers(0, 19, (32, 32), np.uint8)
        Image.fromarray(mask, "L").save(root / "CelebAMask-HQ-mask" / f"{i}.png")
    return str(root)


CELEB_COND = {
    "condition_types": ["text", "image"],
    "text_condition_config": {"text_embed_dim": 512, "cond_drop_prob": 0.1},
    "image_condition_config": {
        "image_condition_input_channels": 18,
        "image_condition_output_channels": 3,
        "image_condition_h": 64,
        "image_condition_w": 64,
        "cond_drop_prob": 0.1,
    },
}


class TestMnistDataset:
    def test_uncond_item(self, mnist_dir):
        ds = MnistDataset("train", mnist_dir)
        assert len(ds) == 12
        im = ds[0]
        assert im.shape == (28, 28, 1)
        assert -1.0 <= im.min() and im.max() <= 1.0

    def test_class_cond_item(self, mnist_dir):
        ds = MnistDataset("train", mnist_dir,
                          condition_config={"condition_types": ["class"]})
        im, cond = ds[5]
        assert cond["class"] in (0, 1, 2)


class TestCelebDataset:
    def test_resize_center_crop(self, celeb_dir):
        ds = CelebDataset("train", celeb_dir, im_size=32)
        im = ds[0]
        assert im.shape == (32, 32, 3)

    def test_text_and_mask_conditions(self, celeb_dir):
        ds = CelebDataset("train", celeb_dir, im_size=32,
                          condition_config=CELEB_COND)
        im, cond = ds[1]
        assert isinstance(cond["text"], str) and "caption" in cond["text"] or "face" in cond["text"]
        assert cond["image"].shape == (64, 64, 18)
        # one-hot minus background: each pixel sums to 0 or 1
        sums = cond["image"].sum(-1)
        assert set(np.unique(sums)).issubset({0.0, 1.0})

    def test_mask_hw_hint_produces_latent_res_one_hot(self, celeb_dir):
        # one-hot commutes with nearest resize: the hinted dataset must
        # return a valid one-hot at the hinted resolution whose per-channel
        # coverage tracks the full-res mask's (the hint exists to remove
        # the 512^2 host one-hot from the train-step critical path)
        full = CelebDataset("train", celeb_dir, im_size=32,
                            condition_config=CELEB_COND)
        hinted = CelebDataset("train", celeb_dir, im_size=32,
                              condition_config=CELEB_COND, mask_hw=(16, 16))
        _, cond = hinted[2]
        assert cond["image"].shape == (16, 16, 18)
        sums = cond["image"].sum(-1)
        assert set(np.unique(sums)).issubset({0.0, 1.0})
        cov_full = full.get_mask(2).mean(axis=(0, 1))
        cov_hint = hinted.get_mask(2).mean(axis=(0, 1))
        assert np.abs(cov_full - cov_hint).max() < 0.15

    def test_latent_mode(self, celeb_dir, tmp_path):
        latent_dir = str(tmp_path / "latents")
        ds0 = CelebDataset("train", celeb_dir, im_size=32)
        items = [(p, np.random.default_rng(i).normal(size=(8, 8, 4)).astype(np.float32))
                 for i, p in enumerate(ds0.images)]
        n = save_latent_shards(latent_dir, items)
        assert n == 6
        ds = CelebDataset("train", celeb_dir, im_size=32, use_latents=True,
                          latent_path=latent_dir)
        assert ds.use_latents
        lat = ds[2]
        np.testing.assert_allclose(lat, items[2][1])


class TestLatentShards:
    def test_shard_files_and_roundtrip(self, tmp_path):
        d = str(tmp_path / "lat")
        items = [(f"img_{i}.jpg", np.ones((4, 4, 2), np.float32) * i)
                 for i in range(2500)]
        save_latent_shards(d, items)
        files = sorted(os.listdir(d))
        assert files == ["0.pkl", "1.pkl", "2.pkl"]  # 1000-image shards
        maps = load_latents(d)
        assert len(maps) == 2500
        np.testing.assert_allclose(maps["img_7.jpg"], items[7][1])


class TestDataLoader:
    def test_batching_and_shuffle(self, mnist_dir):
        ds = MnistDataset("train", mnist_dir)
        dl = DataLoader(ds, batch_size=4, seed=1, num_shards=1, shard_index=0)
        batches = list(dl.epoch(0))
        assert len(batches) == 3
        assert batches[0].shape == (4, 28, 28, 1)
        b2 = list(dl.epoch(1))
        assert not np.allclose(batches[0], b2[0])  # reshuffled

    def test_sharding_partitions(self, mnist_dir):
        ds = MnistDataset("train", mnist_dir)
        seen = []
        for shard in range(2):
            dl = DataLoader(ds, batch_size=2, shuffle=False, num_shards=2,
                            shard_index=shard)
            for b in dl.epoch(0):
                seen.append(np.asarray(b))
        total = np.concatenate(seen).reshape(-1)
        assert len(np.concatenate(seen)) == 12  # all samples covered once

    def test_default_shards_follow_jax_process_topology(self, mnist_dir,
                                                        monkeypatch):
        """Multi-host contract (VERDICT W7): with no explicit shard args the
        loader derives its shard from jax.process_index()/process_count(),
        so each host of a multi-process mesh reads a distinct slice."""
        import stablediffusion_pytorch_tpu.data.loader as loader_mod

        monkeypatch.setattr(loader_mod.jax, "process_count", lambda: 3)
        monkeypatch.setattr(loader_mod.jax, "process_index", lambda: 2)
        ds = MnistDataset("train", mnist_dir)
        dl = DataLoader(ds, batch_size=2)
        assert dl.num_shards == 3
        assert dl.shard_index == 2

    def test_shards_disjoint_and_cover_with_shared_seed(self):
        """Same seed on every process => same permutation => the strided
        shard slices are DISJOINT and jointly cover the dataset (the
        correctness condition for multi-host training epochs)."""
        class IndexDataset:
            def __len__(self):
                return 23

            def __getitem__(self, i):
                return np.asarray([i], np.int64)

        seen = []
        for shard in range(2):
            dl = DataLoader(IndexDataset(), batch_size=2, shuffle=True,
                            seed=7, num_shards=2, shard_index=shard)
            shard_ids = [int(x) for b in dl.epoch(3) for x in
                         np.asarray(b).ravel()]
            seen.append(set(shard_ids))
        assert seen[0].isdisjoint(seen[1])
        # equal truncated length per shard (drop-remainder semantics)
        assert len(seen[0]) == len(seen[1])
        assert len(seen[0] | seen[1]) >= 20  # covers all but the remainder

    def test_cond_collate(self, celeb_dir):
        ds = CelebDataset("train", celeb_dir, im_size=32,
                          condition_config=CELEB_COND)
        dl = DataLoader(ds, batch_size=3, num_shards=1, shard_index=0)
        im, cond = next(iter(dl.epoch(0)))
        assert im.shape == (3, 32, 32, 3)
        assert isinstance(cond["text"], list) and len(cond["text"]) == 3
        assert cond["image"].shape == (3, 64, 64, 18)


class TestCfgDropout:
    def test_text_drop_replaces_with_empty(self):
        emb = jnp.ones((8, 7, 16))
        empty = jnp.zeros((1, 7, 16))
        out = drop_text_condition(emb, jax.random.PRNGKey(0), empty, 0.99)
        assert float(out.sum()) < float(emb.sum())

    def test_image_drop_zeroes_whole_samples(self):
        m = jnp.ones((16, 4, 4, 2))
        out = drop_image_condition(m, jax.random.PRNGKey(0), 0.5)
        per_sample = np.asarray(out).reshape(16, -1).sum(-1)
        assert set(np.unique(per_sample)).issubset({0.0, 32.0})

    def test_class_drop(self):
        c = jax.nn.one_hot(jnp.arange(8) % 3, 3)
        out = drop_class_condition(c, jax.random.PRNGKey(1), 0.5)
        rowsums = np.asarray(out).sum(-1)
        assert set(np.unique(rowsums)).issubset({0.0, 1.0})

    def test_zero_prob_identity(self):
        m = jnp.ones((4, 2, 2, 1))
        assert drop_image_condition(m, jax.random.PRNGKey(0), 0) is m


class TestTextEncoder:
    def test_hash_tokenizer_shape_and_determinism(self):
        tok = HashTokenizer()
        ids = tok(["hello world", "hello world"])
        assert ids.shape == (2, 77)
        np.testing.assert_array_equal(ids[0], ids[1])
        assert ids[0, 0] == tok.bos_id

    def test_encoder_last_hidden_state(self):
        tok, model = get_tokenizer_and_model("clip")
        out = get_text_representation(["a face", "another one"], tok, model)
        assert out.shape == (2, 77, 512)
        assert np.isfinite(np.asarray(out)).all()

    def test_different_texts_different_embeddings(self):
        tok, model = get_tokenizer_and_model("clip")
        a = get_text_representation("smiling woman with hat", tok, model)
        b = get_text_representation("old man with beard", tok, model)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_causal_mask(self):
        # changing a later token must not affect earlier positions
        model = CLIPTextEncoder(layers=2, rngs=nnx.Rngs(0))
        ids1 = jnp.array([[1, 2, 3, 4]])
        ids2 = jnp.array([[1, 2, 9, 4]])
        o1, o2 = model(ids1), model(ids2)
        np.testing.assert_allclose(o1[0, :2], o2[0, :2], atol=1e-5)
        assert not np.allclose(o1[0, 2], o2[0, 2])
