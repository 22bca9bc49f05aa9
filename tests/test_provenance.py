"""Substitution-provenance stamping (VERDICT W6 / next-round #10).

Every artifact produced with fallback encoders (hash tokenizer, random-conv
FID extractor, random-feature LPIPS) must carry a stamp saying so.
"""

import json

import pytest

import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.utils.provenance import (
    build_stamp, fid_extractor_stamp, lpips_stamp, text_stack_stamp,
    write_sidecar,
)


class TestStamps:
    def test_default_stamp_reports_all_fallbacks(self):
        stamp = build_stamp()
        assert stamp == {"text_encoder": "hash-fallback",
                         "fid_extractor": "random-conv",
                         "lpips": "absent"}

    def test_hash_tokenizer_stamps_fallback(self):
        from stablediffusion_pytorch_tpu.data.text import HashTokenizer

        assert text_stack_stamp(HashTokenizer()) == "hash-fallback"

    def test_clip_bpe_random_init_visible(self):
        class FakeBpe:
            kind = "clip-bpe"

        class FakeModel:
            pretrained = False

        assert text_stack_stamp(FakeBpe(), FakeModel()) == \
            "clip-bpe+random-init"
        FakeModel.pretrained = True
        assert text_stack_stamp(FakeBpe(), FakeModel()) == \
            "clip-bpe+pretrained"

    def test_fid_extractor_stamp(self):
        from stablediffusion_pytorch_tpu.analysis.fid import (
            RandomConvExtractor,
        )

        assert fid_extractor_stamp(RandomConvExtractor()) == "random-conv"

        class TorchInceptionExtractor:  # name is what's inspected
            pass

        assert fid_extractor_stamp(TorchInceptionExtractor()) == \
            "inception-v3"

    def test_lpips_stamp_tracks_pretrained_flag(self):
        from stablediffusion_pytorch_tpu.models.lpips import LPIPS

        model = LPIPS(rngs=nnx.Rngs(0))
        assert lpips_stamp(model) == "random-features"
        model._pretrained = True
        assert lpips_stamp(model) == "vgg16-pretrained"
        assert lpips_stamp(None) == "absent"

    def test_sidecar_written_next_to_artifact(self, tmp_path):
        art = tmp_path / "grid.png"
        art.write_bytes(b"png")
        path = write_sidecar(str(art), build_stamp(), sampler="ddim",
                             steps=50)
        with open(path) as f:
            payload = json.load(f)
        assert payload["provenance"]["fid_extractor"] == "random-conv"
        assert payload["steps"] == 50
        assert path == str(art) + ".provenance.json"


class TestSnapshotEmbedding:
    def test_config_snapshot_contains_provenance(self, tmp_path):
        from stablediffusion_pytorch_tpu.utils.train_utils import (
            save_config_snapshot_json,
        )

        path = save_config_snapshot_json(
            str(tmp_path), {"train_params": {"seed": 1}})
        with open(path) as f:
            snap = json.load(f)
        assert snap["provenance"]["text_encoder"] == "hash-fallback"
        assert snap["train_params"]["seed"] == 1

    @pytest.mark.slow
    def test_fid_cli_output_is_stamped_json(self, tmp_path, capsys):
        from PIL import Image

        from stablediffusion_pytorch_tpu.tools.fid_evaluation import evaluate

        rng = np.random.default_rng(0)
        for d in ("real", "fake"):
            (tmp_path / d).mkdir()
            for i in range(4):
                Image.fromarray(
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                ).save(tmp_path / d / f"{i}.png")

        class Args:
            real_dir = str(tmp_path / "real")
            fake_dir = str(tmp_path / "fake")
            stats_cache = None
            inception_weights = None
            image_size = 16
            batch_size = 4
            limit = None

        evaluate(Args())
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["provenance"]["fid_extractor"] == "random-conv"
        assert out["reference_comparable"] is False
        assert np.isfinite(out["fid"])
