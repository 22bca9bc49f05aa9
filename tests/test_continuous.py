"""Chunked continuous batching (serving/continuous.py): per-request output
parity with the fixed-shape InferenceEngine (same seed => same image, no
matter what shares the slots), queue oversubscription, mid-flight admission
at chunk boundaries, and the background scheduler thread."""

import numpy as np
import pytest

from tests.test_serving import engine  # noqa: F401 (module-scoped fixture)


@pytest.fixture(scope="module")
def slot_engine(engine):  # noqa: F811
    from stablediffusion_pytorch_tpu.serving import SlotEngine
    from stablediffusion_pytorch_tpu.tools.common import (
        build_denoiser, build_vqvae,
    )

    se = SlotEngine(engine.cfg, build_denoiser(engine.cfg),
                    build_vqvae(engine.cfg), engine.tokenizer,
                    engine.text_model, slots=4, steps=4, chunk=2,
                    guidance=2.0)
    return se


def _reqs(n, seed0=0):
    from stablediffusion_pytorch_tpu.serving import GenerateRequest

    rng = np.random.default_rng(7)
    return [GenerateRequest(prompt=f"face {i}", seed=seed0 + i,
                            mask=rng.random((32, 32, 18), dtype=np.float32))
            for i in range(n)]


class TestSlotEngineParity:
    def test_matches_fixed_engine_per_request(self, engine, slot_engine):  # noqa: F811
        """Each request's image equals the fixed engine's for the same
        seed/prompt/mask — slot composition and admission order don't
        leak into the output (the continuous-batching correctness
        contract)."""
        reqs = _reqs(3)
        # a fixed engine at the slot engine's step count, same weights
        from stablediffusion_pytorch_tpu.serving import InferenceEngine
        from stablediffusion_pytorch_tpu.tools.common import (
            build_denoiser, build_vqvae,
        )

        fixed = InferenceEngine(engine.cfg, build_denoiser(engine.cfg),
                                build_vqvae(engine.cfg), engine.tokenizer,
                                engine.text_model, max_batch=4,
                                steps=slot_engine.steps, guidance=2.0)
        ref = fixed.generate(reqs)
        got = slot_engine.generate(reqs)
        assert got.shape == ref.shape and got.dtype == np.uint8
        # eta=0 DDIM is deterministic; uint8 rounding tolerates the
        # program-fusion difference between the two executables
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    def test_oversubscription_drains_in_slot_waves(self, slot_engine):
        """9 requests through 4 slots: all futures resolve, every output
        matches its own seed's solo run (admission waves are invisible)."""
        reqs = _reqs(9, seed0=100)
        imgs = slot_engine.generate(reqs)
        assert imgs.shape[0] == 9
        solo = slot_engine.generate([reqs[5]])
        np.testing.assert_array_equal(imgs[5], solo[0])

    def test_mid_flight_admission(self, slot_engine):
        """A request submitted while others are mid-denoise joins at the
        next chunk boundary and still reproduces its solo image."""
        first = slot_engine.submit(_reqs(1, seed0=40)[0])
        slot_engine._tick_once()          # first is now mid-flight
        late = slot_engine.submit(_reqs(1, seed0=41)[0])
        slot_engine.run_until_idle()
        assert first.result().dtype == np.uint8
        late_img = late.result()
        solo = slot_engine.generate([_reqs(1, seed0=41)[0]])
        np.testing.assert_array_equal(late_img, solo[0])

    def test_background_worker(self, slot_engine):
        """start()/stop(): the daemon thread drains submissions."""
        slot_engine.start()
        try:
            futs = [slot_engine.submit(r) for r in _reqs(5, seed0=60)]
            imgs = [f.result(timeout=120) for f in futs]
        finally:
            slot_engine.stop()
        assert all(im.dtype == np.uint8 for im in imgs)

    def test_heterogeneous_steps_per_request(self, engine):  # noqa: F811
        """Requests with different step counts co-tenant in one engine;
        each image equals the fixed engine compiled at ITS OWN step count
        (the structural regime where continuous batching beats fixed
        batching: a short request frees its slot early). Bad step counts
        are rejected at the submit edge."""
        from stablediffusion_pytorch_tpu.serving import (
            GenerateRequest, InferenceEngine, SlotEngine,
        )
        from stablediffusion_pytorch_tpu.tools.common import (
            build_denoiser, build_vqvae,
        )

        den, vq = build_denoiser(engine.cfg), build_vqvae(engine.cfg)
        se = SlotEngine(engine.cfg, den, vq, engine.tokenizer,
                        engine.text_model, slots=4, steps=4, chunk=2,
                        step_options=[2, 4, 10], guidance=2.0)
        base = _reqs(5, seed0=200)
        for r, s in zip(base, [2, 10, 4, 2, 10]):
            r.steps = s
        got = se.generate(base)
        assert got.shape[0] == 5 and got.dtype == np.uint8
        for s in (2, 4, 10):
            fixed = InferenceEngine(engine.cfg, den, vq, engine.tokenizer,
                                    engine.text_model, max_batch=1,
                                    steps=s, guidance=2.0)
            for i, r in enumerate(base):
                if r.steps != s:
                    continue
                ref = fixed.generate([GenerateRequest(
                    prompt=r.prompt, seed=r.seed, mask=r.mask)])[0]
                assert np.abs(got[i].astype(int)
                              - ref.astype(int)).max() <= 1, \
                    f"request {i} (steps={s}) diverged from its fixed ref"
        bad = base[0]
        bad.steps = 3
        fut = se.submit(bad)
        with pytest.raises(ValueError, match="step_options"):
            fut.result(timeout=5)

    def test_chunk_must_divide_steps(self, engine):  # noqa: F811
        from stablediffusion_pytorch_tpu.serving import SlotEngine
        from stablediffusion_pytorch_tpu.tools.common import (
            build_denoiser, build_vqvae,
        )

        with pytest.raises(ValueError, match="divide"):
            SlotEngine(engine.cfg, build_denoiser(engine.cfg),
                       build_vqvae(engine.cfg), engine.tokenizer,
                       engine.text_model, slots=2, steps=5, chunk=2)


def test_http_server_with_slot_engine(slot_engine):
    """make_server() uses the SlotEngine as its own batcher: /generate
    returns a PNG, /stats reports slot-occupancy counters."""
    import http.client
    import json
    import threading

    from stablediffusion_pytorch_tpu.serving import make_server

    srv = make_server(slot_engine, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=120)
        conn.request("POST", "/generate",
                     body=json.dumps({"prompt": "a face", "seed": 3}))
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200 and data[:8] == b"\x89PNG\r\n\x1a\n"
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] >= 1 and "mean_slot_occupancy" in stats
        conn.close()
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_bench_streaming_smoke(engine):  # noqa: F811
    """bench_serving.bench_streaming runs the fixed-vs-slot comparison on
    the tiny config and reports sane latency/occupancy numbers."""
    from stablediffusion_pytorch_tpu.tools.bench_serving import (
        bench_streaming,
    )
    from stablediffusion_pytorch_tpu.tools.common import (
        build_denoiser, build_vqvae,
    )

    out = bench_streaming(
        engine.cfg, build_denoiser(engine.cfg), build_vqvae(engine.cfg),
        engine.tokenizer, engine.text_model, (32, 32, 18),
        slots=4, steps=4, chunk=2, n_requests=6, interval_s=0.01,
        dtype=None)
    assert out["fixed_engine"]["images_per_sec"] > 0
    assert out["slot_engine"]["images_per_sec"] > 0
    assert out["slot_engine"]["scheduler"]["requests"] >= 6
