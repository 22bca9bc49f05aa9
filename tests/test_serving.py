"""Serving subsystem: batched inference engine + HTTP front-end.

Covers the TPU serving contract on CPU with a tiny text+image LDM:
one compiled fixed-shape program behind every request, padding, per-seed
determinism, per-request guidance, request coalescing in the batcher, and
the HTTP surface (PNG + JSON responses, healthz provenance, stats,
error paths). Replaces the reference's GUI samplers for production
(SURVEY.md §2.6)."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def engine():
    import jax.numpy as jnp

    from stablediffusion_pytorch_tpu.data.text import (
        get_tokenizer_and_model,
    )
    from stablediffusion_pytorch_tpu.serving import InferenceEngine
    from stablediffusion_pytorch_tpu.tools.common import (
        build_denoiser, build_vqvae, load_config,
    )

    cfg = {
        "dataset_params": {"im_path": "unused", "im_channels": 3,
                           "im_size": 16, "name": "celebhq"},
        "diffusion_params": {"num_timesteps": 20, "beta_start": 0.0015,
                             "beta_end": 0.0195},
        "ldm_params": {
            "down_channels": [8, 16, 16, 24], "mid_channels": [24, 24, 16],
            "down_sample": [True, False, False],
            "attn_down": [True, True, True], "time_emb_dim": 16,
            "norm_channels": 4, "num_heads": 2, "conv_out_channels": 16,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
            "condition_config": {
                "condition_types": ["text", "image"],
                "text_condition_config": {
                    "text_embed_model": "clip",
                    "train_text_embed_model": False,
                    "text_embed_dim": 512, "cond_drop_prob": 0.1},
                "image_condition_config": {
                    "image_condition_input_channels": 18,
                    "image_condition_output_channels": 3,
                    "image_condition_h": 32, "image_condition_w": 32,
                    "cond_drop_prob": 0.1},
            },
        },
        "autoencoder_params": {
            "z_channels": 2, "codebook_size": 8,
            "down_channels": [8, 16], "mid_channels": [16, 16],
            "down_sample": [True], "attn_down": [False],
            "norm_channels": 4, "num_heads": 2, "num_down_layers": 1,
            "num_mid_layers": 1, "num_up_layers": 1,
        },
        "train_params": {"seed": 7, "task_name": "tiny_serve"},
    }
    import tempfile, os  # noqa: E401

    d = tempfile.mkdtemp(prefix="sdtpu_serve_")
    cfg_path = os.path.join(d, "tiny_serve.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    loaded = load_config(cfg_path)
    tok, tm = get_tokenizer_and_model("clip")
    eng = InferenceEngine(loaded, build_denoiser(loaded),
                          build_vqvae(loaded), tok, tm,
                          max_batch=4, steps=3, guidance=2.0)
    eng.warmup()
    return eng


def test_engine_batch_pad_and_determinism(engine):
    from stablediffusion_pytorch_tpu.serving import GenerateRequest

    reqs = [GenerateRequest(prompt="blond hair", seed=1),
            GenerateRequest(prompt="black hair", seed=2, guidance=5.0)]
    imgs = engine.generate(reqs)  # padded 2 -> 4 internally
    assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8

    again = engine.generate(reqs)
    np.testing.assert_array_equal(imgs, again)  # same seeds -> same images

    other = engine.generate([GenerateRequest(prompt="blond hair", seed=9)])
    assert not np.array_equal(imgs[0], other[0])  # seed changes the image


def test_engine_mask_path_and_validation(engine):
    from stablediffusion_pytorch_tpu.serving import GenerateRequest

    mask = np.zeros((32, 32, 18), np.float32)
    mask[:16, :, 3] = 1.0
    out = engine.generate([GenerateRequest(prompt="x", seed=3, mask=mask)])
    assert out.shape == (1, 16, 16, 3)

    with pytest.raises(ValueError, match="mask must be"):
        engine.generate([GenerateRequest(mask=np.zeros((32, 32, 2)))])
    with pytest.raises(ValueError, match="need 1..4"):
        engine.generate([])


def test_batcher_coalesces(engine):
    from stablediffusion_pytorch_tpu.serving import (
        GenerateRequest, RequestBatcher,
    )

    b = RequestBatcher(engine, window_s=2.0)
    try:
        futs = [b.submit(GenerateRequest(prompt=f"p{i}", seed=i))
                for i in range(3)]
        imgs = [f.result(timeout=120) for f in futs]
        assert all(i.shape == (16, 16, 3) for i in imgs)
        s = b.stats()
        assert s["requests"] == 3
        # all three were queued before the 2 s window closed -> one batch
        assert s["batches"] == 1 and s["mean_batch_size"] == 3.0
    finally:
        b.close()


@pytest.fixture(scope="module")
def server(engine):
    from stablediffusion_pytorch_tpu.serving import make_server

    srv = make_server(engine, "127.0.0.1", 0, window_s=0.05)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.batcher.close()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=120)
    conn.request(method, path,
                 body=None if body is None else json.dumps(body))
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_http_generate_png_and_json(server):
    status, ctype, data = _request(server, "POST", "/generate",
                                   {"prompt": "a face", "seed": 4})
    assert status == 200 and ctype == "image/png"
    assert data[:8] == b"\x89PNG\r\n\x1a\n"

    status, ctype, data = _request(
        server, "POST", "/generate",
        {"prompt": "a face", "seed": 4, "response": "json"})
    assert status == 200 and ctype == "application/json"
    payload = json.loads(data)
    assert payload["shape"] == [16, 16, 3]
    png = base64.b64decode(payload["image_b64"])
    from PIL import Image

    arr = np.asarray(Image.open(io.BytesIO(png)))
    assert arr.shape == (16, 16, 3)


def test_http_health_stats_and_errors(server):
    status, _, data = _request(server, "GET", "/healthz")
    info = json.loads(data)
    assert status == 200 and info["status"] == "ok"
    assert info["max_batch"] == 4 and "provenance" in info
    assert info["condition_types"] == ["text", "image"]

    status, _, data = _request(server, "GET", "/stats")
    assert status == 200 and json.loads(data)["requests"] >= 1

    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404
    status, _, data = _request(server, "POST", "/generate",
                               {"seed": "not-an-int"})
    assert status == 400 and "bad request" in json.loads(data)["error"]


def test_bench_serving_helpers(engine):
    """tools/bench_serving measures the engine it claims to (CPU, tiny)."""
    from stablediffusion_pytorch_tpu.tools.bench_serving import (
        _requests, bench_engine,
    )

    mask_shape = (32, 32, 18)
    reqs = _requests(3, mask_shape, base_seed=42)
    assert [r.seed for r in reqs] == [42, 43, 44]
    assert len({r.prompt for r in reqs}) == 3
    assert all(r.mask.shape == mask_shape for r in reqs)
    # no image-condition config -> no masks
    assert all(r.mask is None for r in _requests(2, None, base_seed=0))

    t_full = bench_engine(engine, reps=2, mask_shape=mask_shape)
    assert t_full > 0
    # padded single-request call goes through the same program
    t_one = bench_engine(engine, reps=1, mask_shape=mask_shape,
                         n_requests=1)
    assert t_one > 0


def test_engine_mesh_data_parallel_matches_single(engine):
    """mesh= serves the same program data-parallel: weights replicate,
    request batches shard on the leading axis, outputs match the
    single-device engine (same seeds => same images up to uint8 rounding
    of cross-device reduction-free math — exact here)."""
    import numpy as np

    from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
    from stablediffusion_pytorch_tpu.serving import (
        GenerateRequest, InferenceEngine,
    )
    from stablediffusion_pytorch_tpu.tools.common import (
        build_denoiser, build_vqvae,
    )

    mesh = make_mesh(4)
    meshed = InferenceEngine(
        engine.cfg, build_denoiser(engine.cfg), build_vqvae(engine.cfg),
        engine.tokenizer, engine.text_model,
        max_batch=4, steps=3, guidance=2.0, mesh=mesh)
    assert meshed.info()["mesh_devices"] == 4

    rng = np.random.default_rng(5)
    reqs = [GenerateRequest(prompt=p, seed=s,
                            mask=rng.random((32, 32, 18), dtype=np.float32))
            for s, p in enumerate(["a face", "blond hair", "glasses"])]
    ref = engine.generate(reqs)
    got = meshed.generate(reqs)
    assert got.shape == ref.shape and got.dtype == np.uint8
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    with pytest.raises(ValueError, match="divisible"):
        InferenceEngine(engine.cfg, build_denoiser(engine.cfg),
                        build_vqvae(engine.cfg), engine.tokenizer,
                        engine.text_model, max_batch=3, steps=3, mesh=mesh)
