"""Batched TPU inference engine: ONE compiled program serves every request.

The reference ships interactive single-image GUIs (SURVEY.md §2.6: 8 tkinter
scripts driving `sample_ddpm_*` one image at a time, e.g.
/root/reference/GUI_image_generator.py). For production serving that design
is wrong on a TPU: every distinct (batch, steps) pair is a new XLA program,
and a batch-1 denoise leaves the MXU mostly idle. This engine is the
TPU-first replacement:

  * **Static shapes, one program.** The engine pins (max_batch, steps,
    method, eta) at construction and compiles ONE jitted
    sample-CFG-decode program. Every request batch — whatever its actual
    size — is padded to ``max_batch`` and runs through the same executable;
    nothing ever recompiles at serve time. Guidance scale is a *traced*
    scalar argument (``cfg_blend`` is pure arithmetic in it), so per-request
    guidance costs nothing.
  * **Weights as arguments.** Denoiser/VQVAE state are jit ARGUMENTS, not
    closure constants — they stay device-resident across calls and don't
    bloat the compile payload past the axon relay's request limit (same
    rationale as tools/sample_ddpm.py).
  * **Whole reverse loop on device.** The DDIM scan + CFG + VQVAE decode is
    one dispatch; the host only tokenizes, pads, and PNG-encodes. On the
    relay-attached chip (PERF.md: ~30 ms per dispatch) a 50-step sampler as
    50 dispatches would pay 1.5 s of pure latency; as one scan it pays it
    once.
  * **Per-request determinism.** Each request carries a seed; initial
    latents derive from ``vmap(normal)`` over per-request fold_in keys, so
    a seed reproduces its image regardless of what else shares the batch.

``RequestBatcher`` (below) adds the serving discipline: a bounded queue +
worker thread that coalesces concurrent requests into one engine call
within a small window — classic continuous-batching-lite, sized for a
single chip. Pass ``mesh=`` (a 1-axis ``jax.sharding.Mesh``) to serve the
same program data-parallel across chips: weights replicate once, request
batches shard on the leading axis, one process drives the whole mesh.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.schedulers import (
    ddim_sample, make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
    nearest_resize_np, resize_mask_to_latent,
)


@dataclass
class GenerateRequest:
    """One image request. ``mask`` is (H, W, C_in) float in [0, 1] at the
    config's image-condition resolution (or any integer multiple of the
    latent size — it is nearest-resized to latent resolution)."""

    prompt: str = ""
    seed: int = 0
    class_id: Optional[int] = None
    mask: Optional[np.ndarray] = None
    guidance: Optional[float] = None  # None -> engine default
    # DDIM step count. The fixed InferenceEngine pins steps at compile time
    # and ignores this; SlotEngine honors it per slot when the value is in
    # its compiled ``step_options`` (heterogeneous co-tenancy).
    steps: Optional[int] = None


class InferenceEngine:
    """Fixed-shape batched sampler around a trained denoiser + VQVAE.

    Parameters mirror the sampling CLI (tools/sample_ddpm.py) but are pinned
    at construction — the TPU serving contract is "configuration is a
    compile, a request is a dispatch".
    """

    def __init__(self, cfg, denoiser, vqvae, tokenizer=None, text_model=None,
                 *, max_batch: int = 8, steps: int = 50,
                 method: str = "linear", eta: float = 0.0,
                 guidance: float = 2.0, dtype=None, mesh=None):
        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.steps = int(steps)
        self.method = method
        self.eta = float(eta)
        self.default_guidance = float(guidance)
        self.dtype = dtype or jnp.float32

        dp = dict(cfg.diffusion_params)
        self._sched = make_compvis_linear_schedule(
            dp["num_timesteps"], dp["beta_start"], dp["beta_end"])

        ldm = dict(cfg.ldm_params)
        cc = ldm.get("condition_config") or {}
        self.condition_types = list(cc.get("condition_types", []))
        self._cond_config = cc
        self.tokenizer, self.text_model = tokenizer, text_model
        if "text" in self.condition_types and tokenizer is None:
            raise ValueError("config wants text conditioning: pass "
                             "tokenizer/text_model (data.text."
                             "get_tokenizer_and_model)")

        from stablediffusion_pytorch_tpu.tools.common import latent_hw

        self._hw = latent_hw(cfg)
        self._z = cfg.autoencoder_params["z_channels"]

        self._den_graphdef, self._den_state = nnx.split(denoiser)
        self._vq_graphdef, self._vq_state = nnx.split(vqvae)

        # Data-parallel serving: with a 1-axis device mesh, weights are
        # replicated once at construction and every request batch is
        # sharded on its leading axis — the whole program (vmap'd latent
        # init, DDIM scan, VQVAE decode) is batch-parallel, so jit follows
        # the input shardings with zero collectives. The reference scales
        # inference the DDP way (batch_condition_image_generator_multi_GPU
        # .py wraps the model in DataParallel per process); here one
        # process drives all chips through ONE compiled program.
        self.mesh = mesh
        if mesh is not None:
            from stablediffusion_pytorch_tpu.parallel.mesh import replicate

            if len(mesh.axis_names) != 1:
                raise ValueError(
                    f"serving engine shards requests on a single data axis; "
                    f"got a {len(mesh.axis_names)}-axis mesh "
                    f"{dict(mesh.shape)} — build it with one axis")
            n = int(mesh.devices.size)
            if self.max_batch % n:
                raise ValueError(
                    f"max_batch={self.max_batch} must be divisible by the "
                    f"mesh's {n} devices (XLA batch sharding)")
            self._den_state = replicate(mesh, self._den_state)
            self._vq_state = replicate(mesh, self._vq_state)

        # empty-prompt embedding reused as every request's uncond branch
        if "text" in self.condition_types:
            from stablediffusion_pytorch_tpu.data.text import (
                get_text_representation,
            )

            self._uncond_text = np.asarray(get_text_representation(
                [""], tokenizer, text_model))[0]

        self._program = jax.jit(self._build_program())
        self._lock = threading.Lock()  # one in-flight device program

    # ---- compiled program -------------------------------------------------
    def _build_program(self):
        den_graphdef = self._den_graphdef
        vq_graphdef = self._vq_graphdef
        sched, steps, method, eta = (self._sched, self.steps, self.method,
                                     self.eta)
        hw, z, dtype = self._hw, self._z, self.dtype
        has_cond = bool(self.condition_types)

        def program(den_state, vq_state, keys, loop_key, guidance,
                    cond, uncond):
            def model_fn(xt, t, c=None):
                m = nnx.merge(den_graphdef, den_state)
                return m(xt, t, c) if c is not None else m(xt, t)

            xt = jax.vmap(
                lambda k: jax.random.normal(k, (hw, hw, z), dtype))(keys)
            x0 = ddim_sample(
                model_fn, sched, xt, loop_key, steps=steps, method=method,
                eta=eta, cond=cond if has_cond else None,
                uncond=uncond if has_cond else None,
                guidance_scale=guidance if has_cond else None)
            imgs = nnx.merge(vq_graphdef, vq_state).decode(x0)
            # pack to uint8 ON DEVICE: the device->host fetch through the
            # relay is 4x smaller than fetching float32 and converting on
            # host (same round-half-even + clip math)
            imgs = (jnp.clip(imgs.astype(jnp.float32), -1.0, 1.0)
                    + 1.0) * 127.5
            return jnp.clip(jnp.round(imgs), 0, 255).astype(jnp.uint8)

        return program

    # ---- host-side batch assembly ------------------------------------------
    def _assemble(self, requests: Sequence[GenerateRequest]):
        B = self.max_batch
        reqs = list(requests)
        if not reqs or len(reqs) > B:
            raise ValueError(f"need 1..{B} requests, got {len(reqs)}")
        pad = [reqs[-1]] * (B - len(reqs))
        full = reqs + pad

        cond, uncond = {}, {}
        if "text" in self.condition_types:
            from stablediffusion_pytorch_tpu.data.text import (
                get_text_representation,
            )

            emb = np.asarray(get_text_representation(
                [r.prompt or "" for r in full],
                self.tokenizer, self.text_model))
            cond["text"] = jnp.asarray(emb)
            uncond["text"] = jnp.asarray(
                np.broadcast_to(self._uncond_text, emb.shape))
        if "image" in self.condition_types:
            icc = self._cond_config["image_condition_config"]
            shape = (icc["image_condition_h"], icc["image_condition_w"],
                     icc["image_condition_input_channels"])
            masks = []
            for r in full:
                if r.mask is None:
                    masks.append(np.zeros(shape, np.float32))
                else:
                    m = np.asarray(r.mask, np.float32)
                    if m.ndim != 3 or m.shape[-1] != shape[-1]:
                        raise ValueError(
                            f"mask must be (H, W, {shape[-1]}), got {m.shape}")
                    masks.append(m)
            stacked = np.stack(masks)
            # resize on host when possible: transfers latent-res bytes
            # through the relay instead of full-res (see nearest_resize_np)
            host = nearest_resize_np(stacked, self._hw, self._hw)
            if host is not None:
                mask = jnp.asarray(host)
            else:
                mask = resize_mask_to_latent(jnp.asarray(stacked), self._hw)
            cond["image"] = mask
            uncond["image"] = jnp.zeros_like(mask)
        if "class" in self.condition_types:
            ncls = self._cond_config["class_condition_config"]["num_classes"]
            ids = [r.class_id if r.class_id is not None else 0 for r in full]
            cond["class"] = jax.nn.one_hot(jnp.asarray(ids), ncls)
            uncond["class"] = jnp.zeros_like(cond["class"])

        keys = jnp.stack([jax.random.PRNGKey(int(r.seed)) for r in full])
        # eta=0 DDIM ignores loop noise; keep it seed-derived for eta>0
        loop_key = jax.random.fold_in(jax.random.PRNGKey(int(full[0].seed)),
                                      0x5e4e)
        # per-request guidance as a traced (B,1,1,1) vector: cfg_blend is
        # pure broadcast arithmetic in the scale, so mixed-guidance batches
        # are exact and cost no recompile
        g = jnp.asarray([r.guidance if r.guidance is not None
                         else self.default_guidance for r in full],
                        jnp.float32).reshape(B, 1, 1, 1)
        return keys, loop_key, g, cond, uncond

    # ---- public API ---------------------------------------------------------
    def generate(self, requests: Sequence[GenerateRequest]) -> np.ndarray:
        """Run one padded batch; returns uint8 (len(requests), H, W, C)."""
        keys, loop_key, g, cond, uncond = self._assemble(requests)
        if self.mesh is not None:
            from stablediffusion_pytorch_tpu.parallel.mesh import (
                replicate, shard_batch,
            )

            keys, g, cond, uncond = shard_batch(
                self.mesh, (keys, g, cond, uncond))
            loop_key = replicate(self.mesh, loop_key)
        with self._lock:
            imgs = self._program(self._den_state, self._vq_state, keys,
                                 loop_key, g, cond, uncond)
        return np.asarray(imgs)[: len(requests)]

    def warmup(self) -> float:
        """Compile + run once on zeros; returns elapsed seconds."""
        t0 = time.perf_counter()
        self.generate([GenerateRequest()])
        return time.perf_counter() - t0

    def info(self) -> dict:
        from stablediffusion_pytorch_tpu.utils.provenance import build_stamp

        return {
            "max_batch": self.max_batch, "steps": self.steps,
            "method": self.method, "eta": self.eta,
            "default_guidance": self.default_guidance,
            "condition_types": self.condition_types,
            "latent": [self._hw, self._hw, self._z],
            "mesh_devices": (int(self.mesh.devices.size)
                             if self.mesh is not None else 1),
            "provenance": build_stamp(tokenizer=self.tokenizer,
                                      text_model=self.text_model),
        }


class RequestBatcher:
    """Coalesces concurrent requests into engine-sized batches.

    One daemon worker drains a bounded queue: it blocks for the first
    request, then keeps gathering until ``max_batch`` or ``window_s``
    elapses, and runs ONE engine call for the whole group. Callers get
    ``concurrent.futures.Future``s. Failure of a batch fails its futures,
    never the worker.
    """

    def __init__(self, engine: InferenceEngine, *, window_s: float = 0.05,
                 max_queue: int = 256):
        self.engine = engine
        self.window_s = float(window_s)
        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stats = {"requests": 0, "batches": 0, "batched_requests": 0}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="sdtpu-batcher")
        self._worker.start()

    def submit(self, request: GenerateRequest) -> Future:
        fut: Future = Future()
        self._q.put((request, fut))  # blocks (backpressure) when full
        return fut

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.engine.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            reqs = [r for r, _ in batch]
            try:
                imgs = self.engine.generate(reqs)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for _, fut in batch:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            self._stats["requests"] += len(batch)
            self._stats["batches"] += 1
            self._stats["batched_requests"] += len(batch) * (len(batch) > 1)
            for i, (_, fut) in enumerate(batch):
                if not fut.cancelled():
                    fut.set_result(imgs[i])

    def stats(self) -> dict:
        s = dict(self._stats)
        s["mean_batch_size"] = (s["requests"] / s["batches"]
                                if s["batches"] else 0.0)
        s["queue_depth"] = self._q.qsize()
        return s

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
