"""Scheduler golden-value tests: coefficient tables and step math pinned to
the reference formulas (scheduler/linear_noise_scheduler.py), cross-checked
against an independent torch-CPU computation of the same closed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_pytorch_tpu.schedulers import (
    make_compvis_linear_schedule,
    make_linear_schedule,
    add_noise,
    sample_prev_timestep,
    ddim_timesteps,
    ddpm_sample,
    ddim_sample,
    cfg_blend,
)


def _np_compvis_tables(T, b0, b1):
    betas = np.linspace(b0**0.5, b1**0.5, T, dtype=np.float32) ** 2
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return betas, alphas, acp


class TestScheduleTables:
    def test_compvis_schedule_values(self):
        T, b0, b1 = 1000, 0.0015, 0.0195
        sched = make_compvis_linear_schedule(T, b0, b1)
        betas, alphas, acp = _np_compvis_tables(T, b0, b1)
        np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
        np.testing.assert_allclose(sched.alphas, alphas, rtol=1e-6)
        np.testing.assert_allclose(sched.alpha_cum_prod, acp, rtol=1e-5)
        np.testing.assert_allclose(sched.sqrt_alpha_cum_prod, np.sqrt(acp), rtol=1e-5)
        np.testing.assert_allclose(sched.betas[0], 0.0015, rtol=1e-6)
        np.testing.assert_allclose(sched.betas[-1], 0.0195, rtol=1e-6)

    def test_sd_style_schedule(self):
        sched = make_compvis_linear_schedule(1000, 0.00085, 0.012)
        assert abs(float(sched.betas[0]) - 0.00085) < 1e-9
        assert abs(float(sched.betas[-1]) - 0.012) < 1e-8

    def test_plain_linear_schedule(self):
        sched = make_linear_schedule(10, 0.1, 1.0)
        np.testing.assert_allclose(sched.betas, np.linspace(0.1, 1.0, 10), rtol=1e-6)


class TestAddNoise:
    def test_forward_process_formula(self):
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 3, 8, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8, 8))
        t = jnp.array([0, 10, 50, 99])
        noisy = add_noise(sched, x0, eps, t)
        acp = np.asarray(sched.alpha_cum_prod)
        for b, tb in enumerate([0, 10, 50, 99]):
            expected = np.sqrt(acp[tb]) * np.asarray(x0[b]) + np.sqrt(
                1 - acp[tb]
            ) * np.asarray(eps[b])
            np.testing.assert_allclose(noisy[b], expected, rtol=1e-5)


class TestReverseStep:
    def test_posterior_mean_and_x0(self):
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        xt = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4)) * 0.5
        eps = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4)) * 0.1
        t = 50
        prev, x0 = sample_prev_timestep(sched, xt, eps, t, jax.random.PRNGKey(4))

        acp = np.asarray(sched.alpha_cum_prod)
        betas = np.asarray(sched.betas)
        alphas = np.asarray(sched.alphas)
        x0_exp = (np.asarray(xt) - np.sqrt(1 - acp[t]) * np.asarray(eps)) / np.sqrt(acp[t])
        x0_exp = np.clip(x0_exp, -1, 1)
        np.testing.assert_allclose(x0, x0_exp, rtol=1e-5)

        mean = (np.asarray(xt) - betas[t] * np.asarray(eps) / np.sqrt(1 - acp[t])) / np.sqrt(alphas[t])
        var = (1 - acp[t - 1]) / (1 - acp[t]) * betas[t]
        resid = np.asarray(prev) - mean
        # prev = mean + sigma * z with z ~ N(0,1)
        assert abs(resid.std() - np.sqrt(var)) < 0.3 * np.sqrt(var)

    def test_t0_is_deterministic_mean(self):
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        xt = jnp.ones((1, 2, 2, 2)) * 0.3
        eps = jnp.ones((1, 2, 2, 2)) * 0.1
        prev1, _ = sample_prev_timestep(sched, xt, eps, 0, jax.random.PRNGKey(0))
        prev2, _ = sample_prev_timestep(sched, xt, eps, 0, jax.random.PRNGKey(99))
        np.testing.assert_allclose(prev1, prev2)

    def test_jit_with_traced_t(self):
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        f = jax.jit(lambda x, e, t, k: sample_prev_timestep(sched, x, e, t, k))
        xt = jnp.ones((1, 2, 2, 2))
        out, x0 = f(xt, xt * 0.1, jnp.asarray(5), jax.random.PRNGKey(0))
        assert out.shape == xt.shape


class TestDDIMTimesteps:
    def test_linear_subsequence(self):
        ts, prev = ddim_timesteps(1000, 100, "linear")
        np.testing.assert_array_equal(ts, np.arange(0, 1000, 10) + 1)
        np.testing.assert_array_equal(prev[1:], ts[:-1])
        assert prev[0] == 0

    def test_quadratic_subsequence(self):
        ts, prev = ddim_timesteps(1000, 100, "quadratic")
        expected = (np.linspace(0, np.sqrt(800), 100) ** 2).astype(np.int32) + 1
        np.testing.assert_array_equal(ts, expected)
        assert ts[-1] <= 999

    def test_unknown_method_raises(self):
        import pytest

        with pytest.raises(NotImplementedError):
            ddim_timesteps(1000, 10, "cubic")


class TestSamplers:
    """End-to-end sampler sanity with a trivial analytic denoiser."""

    def _zero_model(self, xt, t, cond=None):
        return jnp.zeros_like(xt)

    def test_ddpm_sample_runs_and_shrinks(self):
        sched = make_compvis_linear_schedule(50, 0.0015, 0.0195)
        xt = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        out = jax.jit(
            lambda x, k: ddpm_sample(self._zero_model, sched, x, k)
        )(xt, jax.random.PRNGKey(1))
        assert out.shape == xt.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_deterministic_when_eta0(self):
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        xt = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
        o1 = ddim_sample(self._zero_model, sched, xt, jax.random.PRNGKey(1), steps=10)
        o2 = ddim_sample(self._zero_model, sched, xt, jax.random.PRNGKey(2), steps=10)
        np.testing.assert_allclose(o1, o2, rtol=1e-6)

    def test_ddim_eps0_model_recovers_scaled_x(self):
        # with eps=0, each DDIM step multiplies by sqrt(a_prev/a_t); the
        # product telescopes to sqrt(acp[t_first_prev]/acp[t_last])
        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        xt = jnp.ones((1, 1, 2, 2))
        out = ddim_sample(self._zero_model, sched, xt, jax.random.PRNGKey(0), steps=5, method="linear")
        ts, ts_prev = ddim_timesteps(100, 5, "linear")
        acp = np.asarray(sched.alpha_cum_prod)
        expected = np.sqrt(acp[ts_prev[0]] / acp[ts[-1]])
        np.testing.assert_allclose(out, expected * np.ones_like(out), rtol=1e-4)

    def test_dpm_solver_oracle_eps_recovers_x0(self):
        """With the exact forward-process eps (oracle), every step's x0
        prediction equals the true x0, so the ODE solver must land on
        (almost exactly) x0 regardless of step count."""
        from stablediffusion_pytorch_tpu.schedulers import dpm_solver_sample
        from stablediffusion_pytorch_tpu.schedulers.linear import add_noise

        sched = make_compvis_linear_schedule(1000, 0.0015, 0.0195)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        acp = sched.alpha_cum_prod

        def oracle(xt, t, cond=None):
            a = jnp.sqrt(acp[t])[:, None, None, None]
            s = jnp.sqrt(1.0 - acp[t])[:, None, None, None]
            return (xt - a * x0) / s

        ts, _ = ddim_timesteps(1000, 12, "linear")
        t_hi = jnp.full((2,), int(ts[-1]), jnp.int32)  # solver's first node
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        xt = add_noise(sched, x0, eps, t_hi)
        out = jax.jit(lambda x: dpm_solver_sample(oracle, sched, x,
                                                  steps=12))(xt)
        # the exact ODE preserves x = a_t x0 + s_t eps-hat along the whole
        # trajectory; it lands at t=0's (small) noise level acp[0] ~= 0.9985
        a0 = float(np.sqrt(np.asarray(acp)[0]))
        s0 = float(np.sqrt(1.0 - np.asarray(acp)[0]))
        want = a0 * np.asarray(x0) + s0 * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2,
                                   atol=2e-2)

    def test_dpm_solver_matches_ddim_at_many_steps(self):
        """Both integrate the same probability-flow ODE: with a smooth
        model and many steps the trajectories converge to each other."""
        from stablediffusion_pytorch_tpu.schedulers import dpm_solver_sample

        sched = make_compvis_linear_schedule(1000, 0.0015, 0.0195)
        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3)) * 0.1

        def linear_model(xt, t, cond=None):
            return jnp.einsum("bhwc,cd->bhwd", xt, w) * 0.3

        xt = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 3))
        dd = ddim_sample(linear_model, sched, xt, jax.random.PRNGKey(5),
                         steps=200, method="linear", eta=0.0)
        dp = dpm_solver_sample(linear_model, sched, xt, steps=200,
                               method="linear")
        # the stiff toy model amplifies to |x| ~ 250; compare in norm
        diff = float(np.max(np.abs(np.asarray(dp) - np.asarray(dd))))
        assert diff < 0.02 * float(np.max(np.abs(np.asarray(dd))))

    def test_dpm_solver_quadratic_duplicate_timesteps_finite(self):
        """Regression (ADVICE r2): quadratic spacing at high step counts
        yields repeated timesteps (t == t_prev -> h = 0); the solver must
        deduplicate the subsequence instead of producing NaNs via
        r = h_prev / h."""
        from stablediffusion_pytorch_tpu.schedulers import dpm_solver_sample

        sched = make_compvis_linear_schedule(1000, 0.0015, 0.0195)
        # the sample_ddpm CLI default config that used to NaN
        ts, _ = ddim_timesteps(1000, 100, "quadratic")
        assert len(np.unique(ts)) < len(ts)  # precondition: dups exist

        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3)) * 0.1

        def linear_model(xt, t, cond=None):
            return jnp.einsum("bhwc,cd->bhwd", xt, w) * 0.3

        xt = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 3))
        out = dpm_solver_sample(linear_model, sched, xt, steps=100,
                                method="quadratic")
        assert np.isfinite(np.asarray(out)).all()

    def test_dpm_solver_cfg_batched(self):
        from stablediffusion_pytorch_tpu.schedulers import dpm_solver_sample

        sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
        calls = []

        def spy(xt, t, cond=None):
            calls.append(xt.shape[0])
            return jnp.zeros_like(xt)

        xt = jnp.ones((2, 2, 2, 1))
        dpm_solver_sample(spy, sched, xt, steps=4, cond={"c": jnp.ones((2,))},
                          uncond={"c": jnp.zeros((2,))}, guidance_scale=2.0)
        assert all(b == 4 for b in calls)  # 2B batched CFG calls

    def test_cfg_blend(self):
        c = jnp.ones((2, 2)) * 3.0
        u = jnp.ones((2, 2)) * 1.0
        np.testing.assert_allclose(cfg_blend(c, u, 2.0), 5.0 * np.ones((2, 2)))

    def test_cfg_batched_model_called_with_2b(self):
        sched = make_compvis_linear_schedule(10, 0.0015, 0.0195)
        seen = []

        def model(x, t, cond):
            seen.append(x.shape[0])
            return jnp.zeros_like(x)

        xt = jnp.ones((3, 2, 4, 4))
        cond = {"text": jnp.ones((3, 5))}
        uncond = {"text": jnp.zeros((3, 5))}
        ddim_sample(
            model, sched, xt, jax.random.PRNGKey(0), steps=2, method="linear",
            cond=cond, uncond=uncond, guidance_scale=1.5,
        )
        assert all(b == 6 for b in seen)


class TestBf16Sampling:
    def test_ddim_and_ddpm_accept_bf16_latents(self):
        """f32 coefficient tables must not change the scan carry dtype
        (regression: bf16 sampling raised a scan carry TypeError)."""
        sched = make_compvis_linear_schedule(20, 0.0015, 0.0195)

        def model(x, t, c=None):
            return jnp.zeros_like(x)

        xt = jnp.ones((2, 8, 8, 4), jnp.bfloat16)
        out = jax.jit(lambda x, k: ddim_sample(model, sched, x, k, steps=5,
                                               method="linear"))(xt, jax.random.PRNGKey(0))
        assert out.dtype == jnp.bfloat16
        out2 = jax.jit(lambda x, k: ddpm_sample(model, sched, x, k))(
            xt, jax.random.PRNGKey(1))
        assert out2.dtype == jnp.bfloat16
