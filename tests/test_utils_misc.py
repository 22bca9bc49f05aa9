"""Tests: mask merging, webdataset shards, housekeeping, run artifacts."""

import csv
import os
import tarfile

import numpy as np
from PIL import Image

from stablediffusion_pytorch_tpu.data.webdataset import (
    iter_samples, list_shards, summarize_shards,
)
from stablediffusion_pytorch_tpu.tools.housekeeping import (
    concat_csv, delete_checkpoints,
)
from stablediffusion_pytorch_tpu.tools.resize_images import resize_dir
from stablediffusion_pytorch_tpu.utils.create_celeb_mask import (
    PARTS, build_mask,
)
from stablediffusion_pytorch_tpu.utils.train_utils import (
    create_run_artifacts, persist_loss_history, save_config_snapshot_json,
)


class TestCreateCelebMask:
    def test_merge_parts(self, tmp_path):
        anno = tmp_path / "anno" / "0"
        anno.mkdir(parents=True)
        # skin everywhere, hair on top half (hair=label 13 overwrites skin)
        skin = np.full((512, 512), 255, np.uint8)
        hair = np.zeros((512, 512), np.uint8)
        hair[:256] = 255
        Image.fromarray(skin).save(anno / "00003_skin.png")
        Image.fromarray(hair).save(anno / "00003_hair.png")
        label = build_mask(str(tmp_path / "anno"), 3)
        assert label[400, 100] == PARTS.index("skin") + 1
        assert label[100, 100] == PARTS.index("hair") + 1


class TestWebdataset:
    def _make_shard(self, path, n, offset=0):
        with tarfile.open(path, "w") as tf:
            for i in range(n):
                img = Image.fromarray(
                    np.full((16, 16, 3), 10 * (i + offset), np.uint8))
                import io

                buf = io.BytesIO()
                img.save(buf, "PNG")

                def add(name, data):
                    ti = tarfile.TarInfo(name)
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))

                add(f"{i + offset:05d}.png", buf.getvalue())
                add(f"{i + offset:05d}.txt",
                    f"caption {i + offset}".encode())

    def test_stream_and_summary(self, tmp_path):
        self._make_shard(str(tmp_path / "data_000.tar"), 3)
        self._make_shard(str(tmp_path / "data_001.tar"), 2, offset=3)
        shards = list_shards(str(tmp_path))
        assert len(shards) == 2
        samples = list(iter_samples(shards, im_size=8))
        assert len(samples) == 5
        im, cap = samples[0]
        assert im.shape == (8, 8, 3) and -1 <= im.min() and im.max() <= 1
        assert cap == "caption 0"
        summary = summarize_shards(str(tmp_path))
        assert summary["total_samples"] == 5

    def test_sharded_workers_partition(self, tmp_path):
        self._make_shard(str(tmp_path / "data_000.tar"), 2)
        self._make_shard(str(tmp_path / "data_001.tar"), 2, offset=2)
        shards = list_shards(str(tmp_path))
        a = list(iter_samples(shards, shard_index=0, num_shards=2))
        b = list(iter_samples(shards, shard_index=1, num_shards=2))
        assert len(a) + len(b) == 4


class TestHousekeeping:
    def test_delete_checkpoints_dry_run(self, tmp_path):
        ck = tmp_path / "run1" / "checkpoints"
        ck.mkdir(parents=True)
        (ck / "x").write_text("x")
        targets = delete_checkpoints(str(tmp_path), apply=False)
        assert targets and ck.exists()  # dry run doesn't delete
        delete_checkpoints(str(tmp_path), apply=True)
        assert not ck.exists()

    def test_concat_csv(self, tmp_path):
        for stage, losses in [("a", [3, 2]), ("b", [1.5, 1.0, 0.5])]:
            d = tmp_path / stage
            d.mkdir()
            with open(d / "losses.csv", "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["step", "loss"])
                for i, v in enumerate(losses):
                    w.writerow([i, v])
        out = str(tmp_path / "global.csv")
        stages = concat_csv(str(tmp_path), out,
                            plot=str(tmp_path / "plot.png"))
        assert len(stages) == 2
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5
        assert os.path.exists(tmp_path / "plot.png")


class TestResizeAndArtifacts:
    def test_resize_dir(self, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        src.mkdir()
        Image.fromarray(np.zeros((64, 48, 3), np.uint8)).save(src / "a.jpg")
        assert resize_dir(str(src), str(dst), 32) == 1
        with Image.open(dst / "a.jpg") as im:
            assert im.size == (32, 32)

    def test_run_artifacts_and_losses(self, tmp_path):
        arts = create_run_artifacts(str(tmp_path), "task")
        assert os.path.isdir(arts["ckpt_dir"])
        save_config_snapshot_json(arts["run_dir"],
                                  {"a": 1, "nested": {"b": [1, 2]}})
        assert os.path.exists(os.path.join(arts["run_dir"],
                                           "config_snapshot.json"))
        persist_loss_history(arts["run_dir"], [3.0, 2.0, 1.0], [2])
        assert os.path.exists(os.path.join(arts["run_dir"], "losses.csv"))


class TestXlaCacheDirs:
    """utils/xla_cache: CPU cache dirs are host-fingerprinted (XLA:CPU AOT
    entries from a differently-shaped VM can SIGILL — see module docstring),
    TPU dir is shared."""

    def test_kinds_distinct_and_stable(self):
        from stablediffusion_pytorch_tpu.utils import xla_cache

        cpu1, cpu2 = xla_cache.cache_dir("cpu"), xla_cache.cache_dir("cpu")
        assert cpu1 == cpu2  # fingerprint is deterministic per host
        assert xla_cache.host_cpu_fingerprint() in cpu1
        assert xla_cache.cache_dir("tpu") != cpu1
        assert "xla_cache_tpu" in xla_cache.cache_dir("tpu")
        import pytest

        with pytest.raises(ValueError):
            xla_cache.cache_dir("gpu")

    def test_configure_points_jax_at_dir(self):
        import jax

        from stablediffusion_pytorch_tpu.utils import xla_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            assert xla_cache.configure_persistent_cache(jax, "cpu")
            assert (jax.config.jax_compilation_cache_dir
                    == xla_cache.cache_dir("cpu"))
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
