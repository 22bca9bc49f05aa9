"""Tests for enhance adapters, custom optimizers, and the weight mapper."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from stablediffusion_pytorch_tpu.cim import ProgressiveTrain
from stablediffusion_pytorch_tpu.cim.enhance import (
    EnhanceBranchConvLoR,
    EnhanceBranchLinearLoR,
    EnhanceLayerConv,
    EnhanceLayerLinear,
    GroupedLinear,
    analyze_enhance_conv_ops,
    analyze_lora_conv_ops,
    set_blend_factors,
)
from stablediffusion_pytorch_tpu.cim.optimizers import (
    DdfpScheduler,
    adam_int,
    percent_adam,
    sgd_momentum,
)
from stablediffusion_pytorch_tpu.cim.registry import nn_layers
from stablediffusion_pytorch_tpu.cim.weight_mapper import (
    gen_weight_split_dict,
    generate_weight_est,
    map_blocks_to_boxes,
    map_weight_for_model,
)


class TestOpsBudget:
    def test_enhance_conv_groups_meet_budget(self):
        cfg = analyze_enhance_conv_ops(64, 64, 3, 3, 0.05)
        assert 64 % cfg["group"] == 0
        assert cfg["estimated_ops_factor"] <= 0.05

    def test_lora_conv_cfg(self):
        cfg = analyze_lora_conv_ops(64, 128, 3, 3, 0.05)
        assert 64 % cfg["group1"] == 0 or cfg["hidden_channels"] % cfg["group1"] == 0
        assert cfg["estimated_ops_factor"] < 0.2


class TestGroupedLinear:
    def test_identity_init_is_noop(self):
        gl = GroupedLinear(16, 16, 4, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        np.testing.assert_allclose(np.asarray(gl(x)), np.asarray(x),
                                   rtol=1e-6)

    def test_block_diagonal_structure(self):
        gl = GroupedLinear(8, 8, 2, rngs=nnx.Rngs(0), identity_init=False)
        # zero out group 1, check first half of output depends only on
        # first half of input
        x1 = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 4))], -1)
        x2 = jnp.concatenate([jnp.ones((1, 4)), jnp.ones((1, 4)) * 9], -1)
        o1, o2 = gl(x1), gl(x2)
        np.testing.assert_allclose(np.asarray(o1[:, :4]),
                                   np.asarray(o2[:, :4]), rtol=1e-6)


class TestEnhanceAdapters:
    def test_serial_conv_identity_at_init(self):
        conv = nnx.Conv(8, 16, kernel_size=(3, 3), padding="SAME",
                        rngs=nnx.Rngs(0))
        enh = EnhanceLayerConv(conv, ops_factor=0.2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
        np.testing.assert_allclose(np.asarray(enh(x)), np.asarray(conv(x)),
                                   rtol=1e-5, atol=1e-6)

    def test_serial_linear_identity_at_init(self):
        lin = nnx.Linear(8, 16, rngs=nnx.Rngs(0))
        enh = EnhanceLayerLinear(lin, ops_factor=0.5)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
        np.testing.assert_allclose(np.asarray(enh(x)), np.asarray(lin(x)),
                                   rtol=1e-5, atol=1e-6)

    def test_lor_branch_near_identity_at_init(self):
        conv = nnx.Conv(8, 16, kernel_size=(3, 3), padding="SAME",
                        rngs=nnx.Rngs(0))
        br = EnhanceBranchConvLoR(conv, ops_factor=0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
        base = np.asarray(conv(x))
        out = np.asarray(br(x))
        # sigmoid(-6.9068) ~ 1e-3 -> output within ~0.2% of original
        assert np.abs(out - base).max() < 0.05 * np.abs(base).max() + 1e-3

    def test_lor_branch_strided_conv_shapes(self):
        conv = nnx.Conv(8, 16, kernel_size=(4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], rngs=nnx.Rngs(0))
        br = EnhanceBranchConvLoR(conv, ops_factor=0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
        assert br(x).shape == conv(x).shape

    def test_set_blend_factors(self):
        lin = nnx.Linear(8, 8, rngs=nnx.Rngs(0))
        br = EnhanceBranchLinearLoR(lin, ops_factor=0.2)

        class M(nnx.Module):
            def __init__(self, b):
                self.b = b

        m = M(br)
        assert set_blend_factors(m, 0.0) == 1
        assert float(br.blend_factor[...]) == 0.0

    def test_harness_insertion_and_skip_on_convert(self):
        class Net(nnx.Module):
            def __init__(self):
                self.conv = nnx.Conv(4, 8, kernel_size=(3, 3),
                                     padding="SAME", rngs=nnx.Rngs(0))
                self.fc = nnx.Linear(8, 8, rngs=nnx.Rngs(1))

            def __call__(self, x):
                h = self.conv(x)
                return self.fc(h.reshape(h.shape[0], -1, 8))

        net = Net()
        pt = ProgressiveTrain(net)
        x = jnp.ones((1, 8, 8, 4))
        y0 = net(x)
        # reference pipeline order: quantize -> add LoR -> add serial enhance
        assert pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                                    weight_bit=8, input_bit=0,
                                    output_bit=0) == 2
        assert pt.add_enhance_branch_LoR(0.2) == 2
        assert pt.add_enhance_layers(0.2) == 2
        y1 = net(x)
        assert y1.shape == y0.shape
        # converting again must not touch adapter internals (branch1/2, fc1)
        n2 = pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                                  weight_bit=8, input_bit=0, output_bit=0)
        assert n2 == 0  # original layers already quantized; adapters skipped


class TestPercentAdam:
    def test_update_magnitude_relative_to_weight(self):
        params = {"w": jnp.ones((4,)) * 2.0}
        grads = {"w": jnp.array([1.0, 0.5, -0.25, 0.1])}
        tx = percent_adam(lr=0.01)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        # max |update| == lr * max|w| = 0.02
        np.testing.assert_allclose(np.abs(np.asarray(updates["w"])).max(),
                                   0.02, rtol=1e-4)

    def test_converges_on_quadratic(self):
        params = {"w": jnp.asarray(5.0)}
        tx = percent_adam(lr=0.05)
        state = tx.init(params)
        for _ in range(200):
            grads = jax.grad(lambda p: (p["w"] - 1.0) ** 2)(params)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert abs(float(params["w"]) - 1.0) < 0.1


class TestAdamInt:
    def test_integer_updates(self):
        params = {"w": jnp.asarray([100.0, -50.0])}
        grads = {"w": jnp.asarray([30.0, -12.0])}
        tx = adam_int(lr_bit=3)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        u = np.asarray(updates["w"])
        np.testing.assert_allclose(u, np.trunc(u))  # integer steps


class TestSgdMomentum:
    def test_descends(self):
        params = {"w": jnp.asarray(3.0)}
        tx = sgd_momentum(lr=0.1, momentum=0.9)
        state = tx.init(params)
        for _ in range(50):
            grads = jax.grad(lambda p: p["w"] ** 2)(params)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert abs(float(params["w"])) < 0.5


class TestDdfpScheduler:
    def test_integer_bit_reduction(self):
        s = DdfpScheduler(lr_bit=8, factor=2, patience=1, min_lr=2)
        s.step(1.0)
        s.step(2.0)
        assert s.step(2.0) == 6  # bad > patience -> 8-2
        for _ in range(10):
            s.step(3.0)
        assert s.lr_bit >= 2  # floor

    def test_invalid_factor(self):
        with pytest.raises(ValueError):
            DdfpScheduler(lr_bit=8, factor=0)


class TestWeightMapper:
    def test_split_dict_tiles_with_remainders(self):
        lin = nnx.Linear(100, 70, rngs=nnx.Rngs(0))
        info = gen_weight_split_dict(lin, (64, 32))
        # rows 100 -> 64+36; cols 70 -> 32+32+6
        assert info["0_0"] == {"start_row": 0, "start_col": 0,
                               "row_num": 64, "col_num": 32}
        assert info["1_2"]["row_num"] == 36 and info["1_2"]["col_num"] == 6
        total = sum(i["row_num"] * i["col_num"] for i in info.values())
        assert total == 100 * 70  # exact cover

    def test_skyline_packing_fits_and_no_overlap(self):
        blocks = {f"b{i}": (32, 40 - i) for i in range(10)}
        mapping = map_blocks_to_boxes(blocks, (64, 64))
        # reconstruct occupancy and assert no overlap
        arrays = {}
        for key, place in mapping.items():
            occ = arrays.setdefault(place["array_idx"],
                                    np.zeros((64, 64), bool))
            r, c = place["weight_addr"]
            br, bc = blocks[key]
            assert r + br <= 64 and c + bc <= 64
            assert not occ[r:r + br, c:c + bc].any(), "overlap!"
            occ[r:r + br, c:c + bc] = True

    def test_oversized_block_raises(self):
        with pytest.raises(ValueError):
            map_blocks_to_boxes({"big": (100, 10)}, (64, 64))

    def test_map_weight_for_model_writes_back(self):
        from stablediffusion_pytorch_tpu.cim.layers import LinearLsqAddaCim

        class Net(nnx.Module):
            def __init__(self):
                lin = nnx.Linear(80, 48, rngs=nnx.Rngs(0))
                self.fc = LinearLsqAddaCim(lin, array_size=(64, 64))

            def __call__(self, x):
                return self.fc(x)

        net = Net()
        mapping = map_weight_for_model(net, array_size=(64, 64),
                                       array_device_name="TC05")
        assert "fc" in mapping
        for mi in net.fc.weight_mapping_info.values():
            assert "weight_addr" in mi and "array_idx" in mi
            assert mi["array_size"] == (64, 64)
        assert net.fc.array_device == "TC05"

    def test_weight_drift_statistics(self):
        w = jnp.ones((1000,)) * 4.0
        std_tar = {0.0: 0.1, 4.0: 0.1}
        est, std_est = generate_weight_est(w, std_tar,
                                           jax.random.PRNGKey(0))
        resid = np.log(np.abs(np.asarray(est))) - np.log(4.0)
        assert abs(resid.std() - 0.1) < 0.02
        assert (np.asarray(est) > 0).all()  # sign preserved
