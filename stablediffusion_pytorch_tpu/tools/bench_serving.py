"""Serving throughput benchmark: quantify the batched-engine design claim.

serving/engine.py replaces the reference's one-image-at-a-time GUI samplers
(/root/reference/GUI_image_generator.py drives sample_ddpm once per click)
with a fixed-shape batched program, on the claim that a batch-1 denoise
leaves the MXU mostly idle. This tool measures that claim on the real chip:
end-to-end images/sec of the compiled sample-CFG-decode program at a sweep
of batch sizes, at the production 256^2 text+mask configuration.

Each batch size is its own XLA program (the engine pins max_batch at
construction — "configuration is a compile, a request is a dispatch"), so
the sweep pays one compile per point; weights are random-init, which is
irrelevant to throughput (identical op schedule).

Also reports the padding cost: a 1-request call on the largest engine runs
the full padded batch, so its latency vs the dedicated batch-1 engine is
exactly what the RequestBatcher's coalescing window buys.

Usage::

  python -m stablediffusion_pytorch_tpu.tools.bench_serving \
      --config synthface256_text_image_cond --batches 1,4,8 --steps 50

Prints one JSON line per batch size plus a summary line; writes a
provenance-stamped report next to --out.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import jax.numpy as jnp
import numpy as np

from stablediffusion_pytorch_tpu.serving import GenerateRequest, InferenceEngine
from stablediffusion_pytorch_tpu.tools.common import (
    build_denoiser, build_vqvae, load_config,
)

PROMPTS = [
    "This person has long black hair and brown eyes.",
    "This person has long blond hair and blue eyes.",
    "This person has short brown hair.",
    "This person is wearing glasses.",
]


def _requests(n: int, mask_shape, base_seed: int):
    rng = np.random.default_rng(base_seed)
    reqs = []
    for i in range(n):
        mask = None
        if mask_shape is not None:
            mask = rng.random(mask_shape, dtype=np.float32)
        reqs.append(GenerateRequest(prompt=PROMPTS[i % len(PROMPTS)],
                                    seed=base_seed + i, mask=mask))
    return reqs


def bench_engine(engine: InferenceEngine, reps: int, mask_shape,
                 n_requests=None):
    """Median wall time of `reps` generate() calls (after warmup)."""
    n = engine.max_batch if n_requests is None else n_requests
    times = []
    for rep in range(reps):
        reqs = _requests(n, mask_shape, base_seed=1000 * rep + n)
        t0 = time.perf_counter()
        imgs = engine.generate(reqs)
        times.append(time.perf_counter() - t0)
        assert imgs.shape[0] == n
    return statistics.median(times)


def bench_streaming(cfg, model, vqvae, tokenizer, text_model, mask_shape,
                    *, slots: int, steps: int, chunk: int, n_requests: int,
                    interval_s: float, dtype):
    """Streaming-arrival comparison: the same staggered request trace
    through (a) the fixed engine + RequestBatcher (coalescing window) and
    (b) the chunked-continuous SlotEngine. Reports per-request latency and
    makespan — the number the padding-cost probe only bounds."""
    from stablediffusion_pytorch_tpu.serving import (
        RequestBatcher, SlotEngine,
    )

    reqs = _requests(n_requests, mask_shape, base_seed=9000)

    def drive(submit, close):
        futs, t_sub = [], []
        t0 = time.perf_counter()
        for r in reqs:
            t_sub.append(time.perf_counter() - t0)
            futs.append(submit(r))
            time.sleep(interval_s)
        lats = [
            (fut.result(timeout=600), time.perf_counter() - t0 - t_s)[1]
            for fut, t_s in zip(futs, t_sub)]
        makespan = time.perf_counter() - t0
        close()
        return {"mean_latency_s": round(statistics.mean(lats), 3),
                "p90_latency_s": round(sorted(lats)[int(0.9 * len(lats))], 3),
                "makespan_s": round(makespan, 3),
                "images_per_sec": round(n_requests / makespan, 3)}

    fixed = InferenceEngine(cfg, model, vqvae, tokenizer, text_model,
                            max_batch=slots, steps=steps, dtype=dtype)
    fixed.warmup()
    batcher = RequestBatcher(fixed, window_s=0.05)
    row_fixed = drive(batcher.submit, batcher.close)

    slot = SlotEngine(cfg, model, vqvae, tokenizer, text_model,
                      slots=slots, steps=steps, chunk=chunk, dtype=dtype)
    slot.warmup()
    slot.start()
    row_slot = drive(slot.submit, slot.stop)
    row_slot["scheduler"] = slot.stats()

    out = {"streaming": {"n_requests": n_requests,
                         "interval_s": interval_s, "slots": slots,
                         "chunk": chunk,
                         "fixed_engine": row_fixed,
                         "slot_engine": row_slot}}
    print(json.dumps(out), flush=True)
    return out["streaming"]


def bench_streaming_hetero(cfg, model, vqvae, tokenizer, text_model,
                           mask_shape, *, slots: int, steps_list, chunk: int,
                           n_requests: int, rate_per_s: float, dtype,
                           seed: int = 7):
    """Heterogeneous-steps + Poisson-arrival comparison (VERDICT r4 #7).

    The workload continuous batching exists for: requests with MIXED step
    counts arriving at Exp(1/rate) gaps. The fixed-engine side plays its
    best realistic strategy — one compiled engine + coalescing batcher PER
    step class (requests with different step counts cannot share a fixed
    batch). The slot side is ONE SlotEngine whose step_options cover the
    mix, so a 20-step request borrows the slot a 100-step request will
    free. Same trace, same backend, same weights."""
    import numpy as np

    from stablediffusion_pytorch_tpu.serving import (
        RequestBatcher, SlotEngine,
    )

    rng = np.random.default_rng(seed)
    steps_list = sorted(int(s) for s in steps_list)
    reqs = _requests(n_requests, mask_shape, base_seed=seed * 1000)
    for i, r in enumerate(reqs):
        r.steps = int(rng.choice(steps_list))
    gaps = rng.exponential(1.0 / rate_per_s, n_requests)
    gaps[0] = 0.0

    def drive(submit, close):
        futs, t_sub = [], []
        t0 = time.perf_counter()
        for r, gap in zip(reqs, gaps):
            time.sleep(gap)
            t_sub.append(time.perf_counter() - t0)
            futs.append(submit(r))
        lats = [
            (fut.result(timeout=600), time.perf_counter() - t0 - t_s)[1]
            for fut, t_s in zip(futs, t_sub)]
        makespan = time.perf_counter() - t0
        close()
        return {"mean_latency_s": round(statistics.mean(lats), 3),
                "p90_latency_s": round(sorted(lats)[int(0.9 * len(lats))], 3),
                "makespan_s": round(makespan, 3),
                "images_per_sec": round(n_requests / makespan, 3)}

    # fixed side: one engine+batcher per step class, routed by req.steps
    class_engines, class_batchers = {}, {}
    for s in steps_list:
        eng = InferenceEngine(cfg, model, vqvae, tokenizer, text_model,
                              max_batch=slots, steps=s, dtype=dtype)
        eng.warmup()
        class_engines[s] = eng
        class_batchers[s] = RequestBatcher(eng, window_s=0.05)

    def fixed_submit(r):
        return class_batchers[r.steps].submit(r)

    def fixed_close():
        for b in class_batchers.values():
            b.close()

    row_fixed = drive(fixed_submit, fixed_close)
    row_fixed["engines"] = len(steps_list)

    slot = SlotEngine(cfg, model, vqvae, tokenizer, text_model,
                      slots=slots, steps=steps_list[-1],
                      step_options=steps_list, chunk=chunk, dtype=dtype)
    slot.warmup()
    slot.start()
    row_slot = drive(slot.submit, slot.stop)
    row_slot["scheduler"] = slot.stats()

    out = {"hetero_streaming": {
        "n_requests": n_requests, "rate_per_s": rate_per_s,
        "steps_mix": steps_list, "slots": slots, "chunk": chunk,
        "fixed_engines_per_class": row_fixed, "slot_engine": row_slot}}
    print(json.dumps(out), flush=True)
    return out["hetero_streaming"]


def main():
    p = argparse.ArgumentParser(description="serving throughput benchmark")
    p.add_argument("--config", default="synthface256_text_image_cond")
    p.add_argument("--batches", default="1,4,8")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--streaming", action="store_true",
                   help="also run the staggered-arrival fixed-vs-SlotEngine "
                        "comparison (one extra engine compile)")
    p.add_argument("--stream-requests", type=int, default=24)
    p.add_argument("--stream-interval", type=float, default=0.25)
    p.add_argument("--chunk", type=int, default=10)
    p.add_argument("--hetero-steps", default="",
                   help="comma list (e.g. 20,50,100): also run the "
                        "heterogeneous-steps + Poisson-arrival comparison")
    p.add_argument("--poisson-rate", type=float, default=2.0,
                   help="mean arrivals/sec for --hetero-steps")
    p.add_argument("--out", default="")
    args = p.parse_args()

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.bf16 else None
    model = build_denoiser(cfg, dtype=dtype)
    vqvae = build_vqvae(cfg, dtype=dtype)

    tokenizer = text_model = None
    cc = dict(cfg.ldm_params).get("condition_config") or {}
    mask_shape = None
    if "text" in cc.get("condition_types", []):
        from stablediffusion_pytorch_tpu.data.text import (
            get_tokenizer_and_model,
        )

        tokenizer, text_model = get_tokenizer_and_model(
            cc["text_condition_config"].get("text_embed_model", "clip"))
    if "image" in cc.get("condition_types", []):
        icc = cc["image_condition_config"]
        mask_shape = (icc["image_condition_h"], icc["image_condition_w"],
                      icc["image_condition_input_channels"])

    rows = []
    biggest = None
    for b in [int(x) for x in args.batches.split(",")]:
        engine = InferenceEngine(cfg, model, vqvae, tokenizer, text_model,
                                 max_batch=b, steps=args.steps, dtype=dtype)
        compile_s = engine.warmup()
        t = bench_engine(engine, args.reps, mask_shape)
        row = {"max_batch": b, "steps": args.steps,
               "batch_latency_s": round(t, 4),
               "images_per_sec": round(b / t, 4),
               "sec_per_image": round(t / b, 4),
               "compile_warmup_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        biggest = engine if biggest is None or b >= biggest.max_batch \
            else biggest

    # padding cost: 1 request through the largest engine still runs the
    # full padded batch — this latency gap is what request coalescing buys
    pad = None
    if biggest is not None and biggest.max_batch > 1:
        t1 = bench_engine(biggest, args.reps, mask_shape, n_requests=1)
        pad = {"one_request_on_max_batch_engine_s": round(t1, 4),
               "vs_dedicated_batch1_s": next(
                   (r["batch_latency_s"] for r in rows
                    if r["max_batch"] == 1), None)}
        print(json.dumps({"padding_cost": pad}), flush=True)

    streaming = None
    if args.streaming:
        slots = max(int(x) for x in args.batches.split(","))
        streaming = bench_streaming(
            cfg, model, vqvae, tokenizer, text_model, mask_shape,
            slots=slots, steps=args.steps, chunk=args.chunk,
            n_requests=args.stream_requests,
            interval_s=args.stream_interval, dtype=dtype)

    hetero = None
    if args.hetero_steps:
        slots = max(int(x) for x in args.batches.split(","))
        hetero = bench_streaming_hetero(
            cfg, model, vqvae, tokenizer, text_model, mask_shape,
            slots=slots,
            steps_list=[int(x) for x in args.hetero_steps.split(",")],
            chunk=args.chunk, n_requests=args.stream_requests,
            rate_per_s=args.poisson_rate, dtype=dtype)

    from stablediffusion_pytorch_tpu.utils.provenance import build_stamp

    report = {"metric": "serving_images_per_sec",
              "config": args.config, "bf16": bool(args.bf16),
              "value": max(r["images_per_sec"] for r in rows),
              "rows": rows, "padding_cost": pad, "streaming": streaming,
              "hetero_streaming": hetero,
              "provenance": build_stamp(tokenizer=tokenizer,
                                        text_model=text_model)}
    print(json.dumps({k: report[k] for k in
                      ("metric", "config", "value")}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
