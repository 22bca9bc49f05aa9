"""Analyzers, exporter, profiling, and GUI-core tests (headless)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from stablediffusion_pytorch_tpu.gui.mask_painter import (
    LABELS, PALETTE, MaskPainterCore,
)


class TestMaskPainterCore:
    def test_paint_and_preview(self):
        core = MaskPainterCore(canvas_size=64, mask_size=128)
        core.select_label(13)  # hair
        core.paint(32, 32)
        assert (core.label_map == 13).sum() > 0
        rgb = core.rgb_preview()
        assert tuple(rgb[32, 32]) == PALETTE[12]

    def test_one_hot_mask_shape_and_background_drop(self):
        core = MaskPainterCore(canvas_size=64, mask_size=128)
        core.select_label(1)
        core.paint(10, 10)
        m = core.one_hot_mask()
        assert m.shape == (128, 128, 18)
        sums = m.sum(-1)
        assert set(np.unique(sums)).issubset({0.0, 1.0})
        assert m.sum() > 0

    def test_clear(self):
        core = MaskPainterCore(canvas_size=32)
        core.paint(5, 5)
        core.clear()
        assert core.label_map.sum() == 0

    def test_generate_headless_tiny(self, tmp_path):
        """Full generate() path with a tiny config (no display needed)."""
        import yaml

        cfg = {
            "dataset_params": {"im_path": str(tmp_path), "im_channels": 3,
                               "im_size": 32, "name": "celebhq"},
            "diffusion_params": {"num_timesteps": 10, "beta_start": 0.0015,
                                 "beta_end": 0.0195},
            "ldm_params": {
                "down_channels": [8, 16, 16, 24], "mid_channels": [24, 24, 16],
                "down_sample": [True, False, False],
                "attn_down": [False, False, False], "time_emb_dim": 16,
                "norm_channels": 4, "num_heads": 2, "conv_out_channels": 16,
                "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
                "condition_config": {
                    "condition_types": ["image"],
                    "image_condition_config": {
                        "image_condition_input_channels": 18,
                        "image_condition_output_channels": 3,
                        "image_condition_h": 64, "image_condition_w": 64,
                        "cond_drop_prob": 0.1}},
            },
            "autoencoder_params": {
                "z_channels": 4, "codebook_size": 16,
                "down_channels": [8, 16], "mid_channels": [16, 16],
                "down_sample": [True], "attn_down": [False],
                "norm_channels": 4, "num_heads": 2, "num_down_layers": 1,
                "num_mid_layers": 1, "num_up_layers": 1},
            "train_params": {"seed": 1, "task_name": "t"},
        }
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(cfg))
        core = MaskPainterCore(config=str(p), mask_size=64, canvas_size=32)
        core.select_label(1)
        core.paint(16, 16)
        img = core.generate("a face", cf_scale=2.0, steps=3)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    def test_labels_match_dataset(self):
        from stablediffusion_pytorch_tpu.data.datasets import (
            CELEB_MASK_LABELS,
        )

        assert LABELS == CELEB_MASK_LABELS
        assert len(PALETTE) == len(LABELS)


class TestAnalyzers:
    def _tiny_dit(self):
        from stablediffusion_pytorch_tpu.models import DIT

        cfg = {"hidden_size": 16, "patch_size": 2, "timestep_emb_dim": 8,
               "num_layers": 1, "num_heads": 2, "head_dim": 8}
        return DIT(4, cfg, rngs=nnx.Rngs(0))

    def test_size_analyzer(self):
        from stablediffusion_pytorch_tpu.tools.size_analyzer import analyze

        report = analyze(self._tiny_dit())
        assert report["total_params"] > 0
        assert any("qkv_proj" in r["layer"] for r in report["layers"])

    def test_ops_analyzer(self):
        from stablediffusion_pytorch_tpu.tools.ops_analyzer import analyze

        model = self._tiny_dit()
        report = analyze(model, jnp.zeros((1, 8, 8, 4)),
                         jnp.zeros((1,), jnp.int32), seq_len=16)
        assert report["total_layer_ops"] > 0
        assert report["total_attention_muls"] == 2 * 2 * 16 * 16 * 8
        assert report["total_acim_energy_j"] > 0

    def test_plot_fid_comparison(self, tmp_path):
        from stablediffusion_pytorch_tpu.tools.plot_fid_comparison import (
            REFERENCE_FID, plot,
        )

        assert REFERENCE_FID["DiT-12L"]["ideal"] == 11.7593
        out = str(tmp_path / "fid.png")
        plot(dict(REFERENCE_FID, ours={"ideal": 11.0}), out)
        import os

        assert os.path.exists(out)

    def test_stablehlo_export(self):
        from stablediffusion_pytorch_tpu.tools.inspect_model import (
            export_stablehlo,
        )

        data = export_stablehlo(lambda x: x * 2 + 1, jnp.ones((4, 4)))
        assert isinstance(data, (bytes, bytearray)) and len(data) > 100

    def test_profiling_flops_and_memory(self):
        from stablediffusion_pytorch_tpu.analysis.profiling import (
            MemoryMonitor, compiled_flops,
        )

        flops = compiled_flops(lambda a, b: a @ b, jnp.ones((64, 64)),
                               jnp.ones((64, 64)))
        if flops is not None:
            assert flops >= 2 * 64**3 * 0.9
        mm = MemoryMonitor()
        info = mm.mark("step")
        assert info["peak_rss_mb"] > 0
