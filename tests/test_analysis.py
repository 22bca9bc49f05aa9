"""Tests: FID math, runtime simulator, QAT pipeline smoke."""

import numpy as np
import pytest

from stablediffusion_pytorch_tpu.analysis.fid import (
    RandomConvExtractor,
    calculate_frechet_distance,
    compute_fid,
    compute_statistics,
    load_statistics,
    save_statistics,
)
from stablediffusion_pytorch_tpu.cim.runtime_sim import (
    adc_auto_adjust,
    conv2d_sim,
    feature_map_to_input,
    input_multi_bits_shift_expansion,
    linear_sim,
    mvm_calculate,
    pooling,
    restore_shift_expansion_output,
)


class TestFrechetDistance:
    def test_identical_distributions_zero(self):
        mu = np.zeros(4)
        sigma = np.eye(4)
        assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-8

    def test_mean_shift(self):
        mu1, mu2 = np.zeros(3), np.ones(3) * 2
        sigma = np.eye(3)
        # FID = |mu1-mu2|^2 when covariances equal
        np.testing.assert_allclose(
            calculate_frechet_distance(mu1, sigma, mu2, sigma), 12.0,
            rtol=1e-6)

    def test_gaussian_samples(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (2000, 8))
        b = rng.normal(0, 1, (2000, 8))
        c = rng.normal(3, 1, (2000, 8))
        mu_a, s_a = compute_statistics(a)
        mu_b, s_b = compute_statistics(b)
        mu_c, s_c = compute_statistics(c)
        near = calculate_frechet_distance(mu_a, s_a, mu_b, s_b)
        far = calculate_frechet_distance(mu_a, s_a, mu_c, s_c)
        assert near < 0.5 and far > 50

    def test_stats_cache_roundtrip(self, tmp_path):
        mu, sigma = np.arange(3.0), np.eye(3) * 2
        p = str(tmp_path / "stats.npz")
        save_statistics(p, mu, sigma)
        mu2, sigma2 = load_statistics(p)
        np.testing.assert_allclose(mu, mu2)
        np.testing.assert_allclose(sigma, sigma2)


@pytest.mark.slow
class TestFidPipeline:
    def test_compute_fid_discriminates(self, tmp_path):
        # 16 images x batch 8: the extractor runs its full 299^2 protocol,
        # which is ~1 s/image of conv compute on this 1-CPU host — keep the
        # sets just big enough that the uniform vs uniform^4 gap dominates
        # the estimator noise (was 48/set = 60 s of suite budget)
        rng = np.random.default_rng(0)
        ext = RandomConvExtractor()
        real = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                for _ in range(16)]
        similar = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                   for _ in range(16)]
        different = [np.clip(rng.uniform(0, 1, (32, 32, 3)) ** 4, 0, 1
                             ).astype(np.float32) for _ in range(16)]
        cache = str(tmp_path / "real.npz")
        fid_same = compute_fid(real, similar, extractor=ext,
                               stats_cache=cache, batch_size=8)
        # cached stats reused
        fid_diff = compute_fid(real, different, extractor=ext,
                               stats_cache=cache, batch_size=8)
        assert fid_diff > fid_same


class TestRuntimeSim:
    def test_im2col_matches_direct_conv(self):
        rng = np.random.default_rng(0)
        fm = rng.normal(size=(2, 6, 6))
        w = rng.normal(size=(2 * 3 * 3, 4))  # k=3, cout=4
        cols = feature_map_to_input(fm, kernel_size=3, stride=1, padding=1)
        out = (cols.T @ w).T.reshape(4, 6, 6)
        # direct conv check at one spatial position
        patch = np.pad(fm, ((0, 0), (1, 1), (1, 1)))[:, 0:3, 0:3].reshape(-1)
        np.testing.assert_allclose(out[:, 0, 0], patch @ w, rtol=1e-10)

    def test_shift_expansion_roundtrip(self):
        # identity-weight MVM recovers the inputs exactly (split+restore)
        x = np.arange(0, 128).reshape(8, 16).astype(float)
        out, _, _ = mvm_calculate(x, np.eye(8), it_time=1, dac_bits=2,
                                  adc_bits=24, adc_scale=1.0,
                                  noise_scale=0.0)
        np.testing.assert_allclose(out, x.T)

    def test_expansion_slice_values(self):
        x = np.array([[13.0]])  # 0b1101, dac 2 -> slices [1, 3, 0, ...]
        exp, bitlen = input_multi_bits_shift_expansion(x, dac_bits=2)
        assert exp[0, 0] == 1 and exp[0, 1] == 3  # low slice first

    def test_mvm_noiseless_high_adc_matches_matmul(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 8, (6, 5)).astype(float)
        w = rng.integers(-3, 4, (6, 4)).astype(float)
        out, _, scale = mvm_calculate(x, w, it_time=1, dac_bits=2,
                                      adc_bits=24, adc_scale=1.0,
                                      noise_scale=0.0)
        np.testing.assert_allclose(out, x.T @ w, rtol=1e-6)

    def test_conv2d_sim_shapes(self):
        fm = np.random.default_rng(0).normal(size=(3, 8, 8))
        w2d = np.random.default_rng(1).normal(size=(27, 5))
        out = conv2d_sim(fm, w2d, stride=1, kernel_size=3, padding=1,
                         input_quant=True, noise_scale=0.0, adc_bits=16)
        assert out.shape == (5, 8, 8)

    def test_linear_sim(self):
        x = np.arange(4.0)
        w = np.eye(4) * 2
        out = linear_sim(x, w, noise_scale=0.0, adc_bits=16)
        assert out.shape == (4,)

    def test_pooling(self):
        fm = np.arange(16.0).reshape(1, 4, 4)
        out = pooling(fm, 2)
        np.testing.assert_allclose(out[0], [[5, 7], [13, 15]])

    def test_adc_auto_adjust_converges(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 8, (8, 20)).astype(float)
        w = rng.normal(size=(8, 6))
        gain, frac = adc_auto_adjust(x, w, target_percent=(0.01, 0.3),
                                     adc_bits=6)
        assert 0 <= frac <= 1.0
        assert gain > 0


class TestQatPipelineSmoke:
    def test_tiny_pipeline_lsq_stage(self, tmp_path):
        import argparse

        from stablediffusion_pytorch_tpu.tools.train_qat import (
            MODEL_PRESETS, _synthetic_data_iter, run_pipeline,
        )

        cfg = MODEL_PRESETS["dit_12l"]()
        cfg["dit_model_config"].update(hidden_size=16, num_layers=1,
                                       num_heads=2, head_dim=8,
                                       timestep_emb_dim=8)
        cfg["condition_config"]["image_condition_config"].update(
            image_condition_h=64, image_condition_w=64)
        args = argparse.Namespace(
            model="dit_12l", stages="LSQ", cycles=2, epochs_per_cycle=1,
            batch_size=2, enhance_ops_factor=0.2, array_size=[64, 64],
            array_device="sim", resume=None,
            output_root=str(tmp_path / "runs"))
        trainer, arts = run_pipeline(
            args, _synthetic_data_iter(cfg, 2, n_batches=1), cfg)
        assert len(trainer.customized_layers()) > 0
        # stage checkpoint written
        lsq_dir = [d for d in
                   (tmp_path / "runs").rglob("LSQ")]
        assert lsq_dir


class TestQatAddaResume:
    """--adda-resume: extension runs rebuild the full quantized tree and
    restore a finished pipeline's final LSQ_ADDA state without repaying the
    earlier stages (reference analogue: the 250-epoch-per-cycle ADDA budget
    of Model_DiT_9L_train.py:593 applied to a saved state)."""

    @staticmethod
    def _tiny_cfg():
        from stablediffusion_pytorch_tpu.tools.train_qat import MODEL_PRESETS

        cfg = MODEL_PRESETS["dit_12l"]()
        cfg["dit_model_config"].update(hidden_size=16, num_layers=1,
                                       num_heads=2, head_dim=8,
                                       timestep_emb_dim=8)
        cfg["condition_config"]["image_condition_config"].update(
            image_condition_h=64, image_condition_w=64)
        return cfg

    @staticmethod
    def _args(tmp_path, **kw):
        import argparse

        base = dict(model="dit_12l", stages="LSQ,LSQ_AnDi,LSQ_ADDA",
                    cycles=2, epochs_per_cycle=1, batch_size=2,
                    enhance_ops_factor=0.2, array_size=[64, 64],
                    array_device="sim", resume=None,
                    output_root=str(tmp_path / "runs"))
        base.update(kw)
        return argparse.Namespace(**base)

    def _read_trajectory(self, root):
        import csv

        rows = []
        for p in root.rglob("qat_trajectory.csv"):
            with open(p) as f:
                rows.extend(csv.DictReader(f))
        return rows

    @pytest.mark.slow
    def test_adda_resume_restores_final_cycle_state(self, tmp_path):
        from stablediffusion_pytorch_tpu.config import andi_config
        from stablediffusion_pytorch_tpu.tools.train_qat import (
            _synthetic_data_iter, run_pipeline,
        )

        cfg = self._tiny_cfg()
        run_pipeline(self._args(tmp_path),
                     _synthetic_data_iter(cfg, 2, n_batches=1), cfg)
        ckpts = sorted((tmp_path / "runs").rglob("LSQ_ADDA/*/ddpm_ckpt"))
        assert ckpts, "full pipeline wrote no ADDA stage checkpoint"
        rows1 = [r for r in self._read_trajectory(tmp_path / "runs")
                 if r["stage"] == "LSQ_ADDA"]
        assert [int(r["cycle"]) for r in rows1] == [0, 1]
        final1 = rows1[-1]

        # resume into a FRESH process-equivalent: new model, rebuilt tree.
        # A zero-batch iterator means no optimizer step runs, so the
        # recorded step sizes must be EXACTLY the restored final state.
        args2 = self._args(tmp_path, stages="LSQ_ADDA",
                           adda_resume=str(ckpts[-1]),
                           epochs_per_cycle=2, save_every_epoch=True,
                           output_root=str(tmp_path / "runs2"))
        trainer2, _ = run_pipeline(args2, lambda: iter(()), self._tiny_cfg())

        rows2 = [r for r in self._read_trajectory(tmp_path / "runs2")
                 if r["stage"] == "LSQ_ADDA"]
        # start_cycle jumped straight to the final cycle
        assert [int(r["cycle"]) for r in rows2] == [1]
        assert int(rows2[0]["input_bit"]) == andi_config.adda_input_bit_range[1]
        # restored step sizes match the donor run's final recorded state
        assert float(rows2[0]["mean_step_size_weight"]) == pytest.approx(
            float(final1["mean_step_size_weight"]), abs=2e-6)
        assert float(rows2[0]["mean_step_size_input"]) == pytest.approx(
            float(final1["mean_step_size_input"]), abs=2e-6)
        # rebuilt tree carries the enhance adapters of the donor pipeline
        names = [n for n, _ in trainer2.customized_layers()]
        assert len(names) > 0
        # per-epoch trajectory + checkpoints (save_every_epoch)
        ep_csv = list((tmp_path / "runs2").rglob("qat_epochs.csv"))
        assert ep_csv, "per-epoch CSV missing"
        with open(ep_csv[0]) as f:
            assert sum(1 for _ in f) == 3  # header + 2 epochs


class TestQatAndiResume:
    """--andi-resume: a wall-clock-killed LSQ_AnDi stage resumes
    mid-interpolation from its newest cycle-end checkpoint instead of
    forfeiting the completed cycles (the reference schedule is 50 cycles /
    multi-hour; round-4's full-schedule run measured ~4.3 min per AnDi
    cycle against a fixed timeout)."""

    _tiny_cfg = staticmethod(TestQatAddaResume._tiny_cfg)
    _args = staticmethod(TestQatAddaResume._args)

    def _read_trajectory(self, root):
        import csv

        rows = []
        for p in root.rglob("qat_trajectory.csv"):
            with open(p) as f:
                rows.extend(csv.DictReader(f))
        return rows

    @pytest.mark.slow
    def test_andi_resume_continues_interpolation(self, tmp_path):
        from stablediffusion_pytorch_tpu.config import andi_config
        from stablediffusion_pytorch_tpu.tools.train_qat import (
            _synthetic_data_iter, run_pipeline,
        )

        cfg = self._tiny_cfg()
        run_pipeline(self._args(tmp_path, stages="LSQ,LSQ_AnDi"),
                     _synthetic_data_iter(cfg, 2, n_batches=1), cfg)
        ckpts = sorted((tmp_path / "runs").rglob("LSQ_AnDi/*/ddpm_ckpt"))
        assert ckpts, "pipeline wrote no AnDi stage checkpoints"
        rows1 = [r for r in self._read_trajectory(tmp_path / "runs")
                 if r["stage"] == "LSQ_AnDi"]
        assert [int(r["cycle"]) for r in rows1] == [0, 1]
        # cycle-0 checkpoint = the lowest-noise dir (noise interpolates up)
        first_ckpt = ckpts[0]

        # resume from cycle 0's state at start_cycle=1 in a fresh
        # process-equivalent; zero batches -> restored state must pass
        # through to the recorded trajectory unchanged
        args2 = self._args(tmp_path, stages="LSQ_AnDi",
                           andi_resume=str(first_ckpt), andi_start_cycle=1,
                           output_root=str(tmp_path / "runs2"))
        trainer2, _ = run_pipeline(args2, lambda: iter(()), self._tiny_cfg())

        rows2 = [r for r in self._read_trajectory(tmp_path / "runs2")
                 if r["stage"] == "LSQ_AnDi"]
        assert [int(r["cycle"]) for r in rows2] == [1]
        # cycle-1 params are the END of the qna interpolation (cycles=2)
        assert float(rows2[0]["noise_scale"]) == pytest.approx(
            andi_config.qna_noise_range[1])
        # restored step sizes match the donor's cycle-0 recorded state
        assert float(rows2[0]["mean_step_size_weight"]) == pytest.approx(
            float(rows1[0]["mean_step_size_weight"]), abs=2e-6)
        assert float(rows2[0]["mean_step_size_input"]) == pytest.approx(
            float(rows1[0]["mean_step_size_input"]), abs=2e-6)
        # the rebuilt tree carries the enhance adapters
        assert len(trainer2.customized_layers()) > 0
