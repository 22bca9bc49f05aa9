"""Native C++ bitsplit extension and Pallas CIM kernel (interpret mode)
against the jnp numerics oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_pytorch_tpu.ops.bit_ops import (
    bit_concat as jnp_bit_concat,
    bit_len_for,
    bit_split as jnp_bit_split,
)


class TestNativeBitsplit:
    @pytest.fixture(scope="class")
    def native(self):
        from stablediffusion_pytorch_tpu.ops import native

        if not native.native_available():
            pytest.skip("g++ toolchain unavailable")
        return native

    def test_matches_jnp_oracle(self, native):
        rng = np.random.default_rng(0)
        x = rng.integers(-127, 128, (16, 8)).astype(np.float32)
        for x_bit, sb in [(8, 4), (8, 2), (5, 2)]:
            ours = native.bit_split(x, x_bit, sb)
            oracle = np.asarray(jnp_bit_split(jnp.asarray(x), x_bit, sb))
            np.testing.assert_allclose(ours, oracle)

    def test_concat_roundtrip(self, native):
        x = np.arange(-127, 128, dtype=np.float32).reshape(-1, 1)
        s = native.bit_split(x, 8, 2)
        back = native.bit_concat(s, 8, 2)
        np.testing.assert_allclose(back, x)

    def test_bit_len(self, native):
        lib = native.load_library()
        assert lib.bit_len_for(8, 4) == bit_len_for(8, 4) == 2
        assert lib.bit_len_for(8, 2) == bit_len_for(8, 2) == 4
        assert lib.bit_len_for(5, 2) == bit_len_for(5, 2) == 2


class TestPallasCimKernel:
    def _ref(self, x, w, adc_scale, x_bit, sb, adc_range):
        bl = bit_len_for(x_bit, sb)
        sl = jnp_bit_split(x, x_bit, sb).reshape(bl, x.shape[0], -1)
        out = 0.0
        for i in range(bl):
            p = sl[i] @ w
            a = jnp.round(jnp.clip(p * adc_scale, -adc_range - 1, adc_range))
            out = out + a * 2.0 ** (i * sb)
        return out

    @pytest.mark.parametrize("x_bit,dac_bit", [(8, 5), (8, 3), (5, 5)])
    def test_interpret_parity(self, x_bit, dac_bit):
        from stablediffusion_pytorch_tpu.ops.pallas.cim_mvm import (
            fused_adda_mvm,
        )

        sb = dac_bit - 1
        bl = bit_len_for(x_bit, sb)
        rng = np.random.default_rng(1)
        half = 2 ** (x_bit - 1) - 1
        x = jnp.asarray(rng.integers(-half, half + 1, (24, 20)).astype(
            np.float32))
        w = jnp.asarray(rng.integers(-7, 8, (20, 12)).astype(np.float32))
        got = fused_adda_mvm(x, w, jnp.float32(0.04), x_bit=x_bit,
                             bit_len=bl, slice_bit=sb, adc_range=127.0,
                             block_m=128, block_n=128, interpret=True)
        ref = self._ref(x, w, 0.04, x_bit, sb, 127.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("x_bit,dac_bit", [(8, 5), (8, 3), (5, 5)])
    def test_int8_kernel_interpret_parity(self, x_bit, dac_bit):
        """int8-operand kernel (VERDICT #9) is bit-exact vs the oracle —
        integer sign/abs shifts reproduce trunc-toward-zero exactly."""
        from stablediffusion_pytorch_tpu.ops.pallas.cim_mvm import (
            fused_adda_mvm_int8,
        )

        sb = dac_bit - 1
        bl = bit_len_for(x_bit, sb)
        rng = np.random.default_rng(3)
        half = 2 ** (x_bit - 1) - 1
        x = jnp.asarray(rng.integers(-half, half + 1, (24, 20)).astype(
            np.float32))
        w = jnp.asarray(rng.integers(-7, 8, (20, 12)).astype(np.float32))
        got = fused_adda_mvm_int8(x, w, jnp.float32(0.04), x_bit=x_bit,
                                  bit_len=bl, slice_bit=sb, adc_range=127.0,
                                  block_m=128, block_n=128, interpret=True)
        ref = self._ref(x, w, 0.04, x_bit, sb, 127.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    def test_adda_mvm_dispatch_and_gradients(self):
        """custom_vjp wrapper: forward on this backend, grads flow to x, w,
        and adc_scale via the STE formulation."""
        from stablediffusion_pytorch_tpu.cim.layers import adda_mvm

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(-7, 8, (6, 10)).astype(np.float32))
        w = jnp.asarray(rng.integers(-7, 8, (10, 4)).astype(np.float32))

        def f(x, w, s):
            return jnp.sum(adda_mvm(x, w, s, 4, 4, 127.0))

        g = jax.grad(f, argnums=(0, 1, 2))(x, w, jnp.float32(0.1))
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(g[1]).max()) > 0  # weight grads nonzero


class TestFusedAdalnMlp:
    def test_interpret_matches_oracle(self):
        from stablediffusion_pytorch_tpu.ops.pallas.dit_block import (
            adaln_mlp_reference, fused_adaln_mlp,
        )

        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 8)
        B, N, H, F = 2, 16, 40, 96  # deliberately unaligned dims
        x = jax.random.normal(ks[0], (B, N, H))
        shift = jax.random.normal(ks[1], (B, H)) * 0.1
        scale = jax.random.normal(ks[2], (B, H)) * 0.1
        gate = jax.random.normal(ks[3], (B, H)) * 0.1
        w1 = jax.random.normal(ks[4], (H, F)) * 0.05
        b1 = jax.random.normal(ks[5], (F,)) * 0.01
        w2 = jax.random.normal(ks[6], (F, H)) * 0.05
        b2 = jax.random.normal(ks[7], (H,)) * 0.01
        got = fused_adaln_mlp(x, shift, scale, gate, w1, b1, w2, b2,
                              interpret=True)
        ref = adaln_mlp_reference(x, shift, scale, gate, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
