"""Chunked continuous batching: slot-scheduled diffusion serving.

The fixed-shape :class:`~stablediffusion_pytorch_tpu.serving.engine.
InferenceEngine` runs each request batch through the whole reverse loop
together — late arrivals wait for the next full pass, and one request on a
batch-8 engine pays the full padded-batch latency (measured: 0.99 s vs
0.18 s dedicated, PERF.md round-3 serving section). GPU serving stacks fix
this with continuous batching (iteration-level scheduling); a literal port
(admit after every step) is wrong on a relay-attached TPU because every
dispatch costs ~30 ms — 50 dispatches per request would pay 1.5 s of pure
latency that the single-scan engine pays once.

This module is the TPU-native middle point — CHUNKED continuous batching:

  * ``slots`` concurrent requests live in one fixed (S, hw, hw, z) latent
    tensor; each slot carries its own position in the (static) DDIM
    timestep subsequence, its own conditioning rows, guidance, and PRNG key.
  * One compiled ``tick`` advances every occupied slot by ``chunk`` DDIM
    steps in a single dispatch (``lax.scan`` over the chunk, per-slot
    timestep gather — numerically the same update as samplers.ddim_sample,
    just vectorized over heterogeneous per-slot t).
  * New requests are admitted at CHUNK BOUNDARIES into free or finished
    slots: the host updates (S, ...) numpy mirrors of cond/guidance/keys
    and a ``fresh`` mask; the tick initializes fresh slots' latents from
    their per-request seed keys on device — admission costs zero extra
    dispatches.
  * Finished slots decode through a second compiled program (all S slots,
    executed only on chunks where something finished) and their futures
    resolve; the freed slots admit the next queue entries.

Per-request determinism matches the fixed engine exactly at eta=0: the
same seed gives the same latent init (``normal(PRNGKey(seed))``) and eta=0
DDIM is noise-free, so a request's image is independent of what shares its
slots — pinned by tests/test_continuous.py against InferenceEngine
outputs. For eta>0 the per-step noise is derived from each request's own
key folded with its own step position, so a request's trajectory is still
deterministic under any slot co-tenancy (the stochastic stream differs
from the fixed engine's, whose loop noise is itself batch-composition
dependent — engine.py derives it from the first request's seed).

Throughput math (DDIM-50, chunk 10): a request's lifetime spans 5 ticks;
admission latency is at most one tick (~chunk x step_ms), dispatch overhead
is amortized 10x, and under streaming load every model eval runs at full
slot occupancy instead of padding — which is where the fixed engine loses
(its padding probe: 1 request on the batch-8 program costs 5.5x dedicated).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.schedulers import (
    make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.schedulers.samplers import (
    cfg_blend, ddim_timesteps,
)
from stablediffusion_pytorch_tpu.serving.engine import GenerateRequest
from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
    nearest_resize_np, resize_mask_to_latent,
)


class SlotEngine:
    """Slot-scheduled DDIM server around a trained denoiser + VQVAE.

    Same construction contract as InferenceEngine (configuration is a
    compile, a request is a queue entry); ``slots`` plays the role of
    ``max_batch`` and ``chunk`` sets the admission granularity.
    """

    def __init__(self, cfg, denoiser, vqvae, tokenizer=None, text_model=None,
                 *, slots: int = 8, steps: int = 50, chunk: int = 10,
                 step_options: Optional[Sequence[int]] = None,
                 method: str = "linear", eta: float = 0.0,
                 guidance: float = 2.0, dtype=None):
        self.slots = int(slots)
        self.steps = int(steps)
        # heterogeneous per-request step counts: each option is its own
        # (static) DDIM subsequence; a slot carries WHICH option it runs.
        # This is the structural win over the fixed engine — a 20-step
        # request frees its slot while its 100-step co-tenants keep going,
        # where fixed batching must segregate requests by step count.
        self.step_options = tuple(sorted(
            {int(s) for s in (step_options or ())} | {int(steps)}))
        self.chunk = int(chunk)
        self.method = method
        self.eta = float(eta)
        self.default_guidance = float(guidance)
        self.dtype = dtype or jnp.float32
        self.cfg = cfg

        dp = dict(cfg.diffusion_params)
        self._sched = make_compvis_linear_schedule(
            dp["num_timesteps"], dp["beta_start"], dp["beta_end"])

        # materialize each option's REVERSED subsequence up front: the
        # REAL length can differ from the nominal request (stride
        # rounding in ddim_timesteps), and it is the real length that
        # must land on a chunk boundary and drive the done check
        self._ts_rows, self._ts_prev_rows, real_lens = [], [], []
        for s in self.step_options:
            a, b = ddim_timesteps(self._sched.num_timesteps, s, method)
            if len(a) % chunk:
                raise ValueError(
                    f"chunk {chunk} must divide steps {len(a)} (requested "
                    f"{s}) so slots finish exactly at chunk boundaries")
            self._ts_rows.append(a[::-1].copy())
            self._ts_prev_rows.append(b[::-1].copy())
            real_lens.append(len(a))
        self._opt_total = np.asarray(real_lens, np.int32)
        self.max_steps = int(self._opt_total.max())

        cc = dict(cfg.ldm_params).get("condition_config") or {}
        self.condition_types = list(cc.get("condition_types", []))
        self._cond_config = cc
        self.tokenizer, self.text_model = tokenizer, text_model
        if "text" in self.condition_types and tokenizer is None:
            raise ValueError("config wants text conditioning: pass "
                             "tokenizer/text_model")

        from stablediffusion_pytorch_tpu.tools.common import latent_hw

        self._hw = latent_hw(cfg)
        self._z = cfg.autoencoder_params["z_channels"]
        self._den_graphdef, self._den_state = nnx.split(denoiser)
        self._vq_graphdef, self._vq_state = nnx.split(vqvae)

        if "text" in self.condition_types:
            from stablediffusion_pytorch_tpu.data.text import (
                get_text_representation,
            )

            self._uncond_text = np.asarray(get_text_representation(
                [""], tokenizer, text_model))[0]

        # ---- host-side slot mirrors (numpy; shipped whole each tick) ----
        S = self.slots
        self._pos = np.full((S,), self.max_steps, np.int32)  # >=total = idle
        self._opt = np.zeros((S,), np.int32)              # step-option index
        self._total = np.full((S,), self.max_steps, np.int32)
        self._occupied = np.zeros((S,), bool)
        self._futures: list[Optional[Future]] = [None] * S
        self._g = np.full((S, 1, 1, 1), self.default_guidance, np.float32)
        self._keys = np.zeros((S, 2), np.uint32)
        self._cond = {}
        self._uncond = {}
        if "text" in self.condition_types:
            emb_shape = self._uncond_text.shape
            self._cond["text"] = np.zeros((S, *emb_shape), np.float32)
            self._uncond["text"] = np.broadcast_to(
                self._uncond_text, (S, *emb_shape)).copy()
        if "image" in self.condition_types:
            icc = cc["image_condition_config"]
            ch = icc["image_condition_input_channels"]
            self._cond["image"] = np.zeros((S, self._hw, self._hw, ch),
                                           np.float32)
            self._uncond["image"] = np.zeros_like(self._cond["image"])
        if "class" in self.condition_types:
            ncls = cc["class_condition_config"]["num_classes"]
            self._cond["class"] = np.zeros((S, ncls), np.float32)
            self._uncond["class"] = np.zeros_like(self._cond["class"])

        # device-resident latents (donated through the tick) + device
        # copies of the admission-time mirrors (uploaded only on ticks
        # that admitted something; uncond never changes after init)
        self._lat = jnp.zeros((S, self._hw, self._hw, self._z), self.dtype)
        self._cond_dev = None
        self._keys_dev = None
        self._g_dev = None
        self._uncond_dev = {k: jnp.asarray(v)
                            for k, v in self._uncond.items()}

        self._queue: "queue.Queue[tuple[GenerateRequest, Future]]" = (
            queue.Queue())
        self._lock = threading.Lock()
        self._n_requests = 0
        self._n_ticks = 0
        self._occ_sum = 0
        self._tick_fn = jax.jit(self._build_tick(), donate_argnums=(1,))
        self._decode_fn = jax.jit(self._build_decode())
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._last_error: Optional[BaseException] = None

    # ---- compiled programs ------------------------------------------------
    def _build_tick(self):
        den_graphdef = self._den_graphdef
        sched, K = self._sched, self.chunk
        hw, z, dtype = self._hw, self._z, self.dtype
        has_cond = bool(self.condition_types)
        eta = self.eta
        # one REVERSED DDIM subsequence per step option, padded to
        # max_steps with the terminal value (inactive slots never read
        # past their own total); position p walks 0..total-1 through row
        # `opt`, exactly ddim_sample's scan order for that step count
        max_steps = self.max_steps

        def _pad(row):
            pad = max_steps - len(row)
            return np.concatenate([row, np.full(pad, row[-1], row.dtype)])

        ts_tab = jnp.asarray(np.stack([_pad(r) for r in self._ts_rows]),
                             jnp.int32)
        ts_prev_tab = jnp.asarray(
            np.stack([_pad(r) for r in self._ts_prev_rows]), jnp.int32)

        def tick(den_state, lat, pos, occupied, fresh, keys, g,
                 cond, uncond, opt, total):
            # fresh slots: latent init from the request's own seed key —
            # identical to InferenceEngine's vmap(normal) init
            init = jax.vmap(
                lambda k: jax.random.normal(k, (hw, hw, z), dtype))(keys)
            lat = jnp.where(fresh[:, None, None, None], init, lat)
            pos = jnp.where(fresh, 0, pos)

            def model_fn(x, t, c=None):
                m = nnx.merge(den_graphdef, den_state)
                return m(x, t, c) if c is not None else m(x, t)

            def body(carry, _):
                lat, pos = carry
                act = occupied & (pos < total)
                p = jnp.minimum(jnp.maximum(pos, 0), total - 1)
                t = ts_tab[opt, p]             # (S,) heterogeneous timesteps
                t_prev = ts_prev_tab[opt, p]
                if has_cond:
                    x2 = jnp.concatenate([lat, lat], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    c2 = jax.tree.map(
                        lambda c, u: jnp.concatenate([c, u], axis=0),
                        cond, uncond)
                    eps2 = model_fn(x2, t2, c2)
                    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
                    eps = cfg_blend(eps_c, eps_u, g)
                else:
                    eps = model_fn(lat, t)
                # per-slot DDIM update — samplers.ddim_sample:154-168 with
                # the alpha gathers vectorized over the slot axis
                a_t = sched.alpha_cum_prod[t][:, None, None, None]
                a_prev = sched.alpha_cum_prod[t_prev][:, None, None, None]
                sigma = eta * jnp.sqrt(
                    (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev))
                # eta>0 step noise comes from each request's OWN key folded
                # with its OWN position, so a request's trajectory is
                # deterministic regardless of what shares its slots (the
                # 0x0e7a fold separates this stream from the latent-init
                # use of the same key). XLA dead-code-eliminates it at
                # eta=0 where sigma is the constant 0.
                noise = jax.vmap(
                    lambda k, pp: jax.random.normal(
                        jax.random.fold_in(jax.random.fold_in(k, 0x0E7A),
                                           pp),
                        (hw, hw, z), lat.dtype))(keys, p)
                x_prev = (
                    jnp.sqrt(a_prev / a_t) * lat
                    + (jnp.sqrt(1.0 - a_prev - sigma**2)
                       - jnp.sqrt(a_prev * (1.0 - a_t) / a_t)) * eps
                    + sigma * noise
                ).astype(dtype)
                lat = jnp.where(act[:, None, None, None], x_prev, lat)
                pos = jnp.where(act, pos + 1, pos)
                return (lat, pos), None

            (lat, pos), _ = jax.lax.scan(body, (lat, pos), None, length=K)
            return lat, pos

        return tick

    def _build_decode(self):
        vq_graphdef = self._vq_graphdef

        def decode(vq_state, lat):
            imgs = nnx.merge(vq_graphdef, vq_state).decode(lat)
            imgs = (jnp.clip(imgs.astype(jnp.float32), -1.0, 1.0)
                    + 1.0) * 127.5
            return jnp.clip(jnp.round(imgs), 0, 255).astype(jnp.uint8)

        return decode

    # ---- admission ----------------------------------------------------------
    def _validate(self, req: GenerateRequest) -> None:
        """Cheap structural checks, raised at the API edge (submit) AND at
        admission — a malformed request must fail its own Future, never the
        scheduler thread (advisor r4 high: a ValueError escaping _tick_once
        killed loop() and hung every other request)."""
        if "image" in self.condition_types and req.mask is not None:
            m = np.asarray(req.mask)
            ch = self._cond["image"].shape[-1]
            if m.ndim != 3 or m.shape[-1] != ch:
                raise ValueError(
                    f"mask must be (H, W, {ch}), got {m.shape}")
        if "class" in self.condition_types and req.class_id is not None:
            ncls = self._cond["class"].shape[-1]
            cid = int(req.class_id)
            if not 0 <= cid < ncls:
                raise ValueError(
                    f"class_id {cid} out of range [0, {ncls})")
        req_steps = getattr(req, "steps", None)
        if req_steps is not None and int(req_steps) not in self.step_options:
            raise ValueError(
                f"steps {req_steps} not in this engine's compiled "
                f"step_options {self.step_options}")

    def _admit(self, slot: int, req: GenerateRequest, fut: Future) -> None:
        self._validate(req)
        if "text" in self.condition_types:
            from stablediffusion_pytorch_tpu.data.text import (
                get_text_representation,
            )

            text_row = np.asarray(get_text_representation(
                [req.prompt or ""], self.tokenizer, self.text_model))[0]
        if "image" in self.condition_types:
            if req.mask is None:
                image_row = 0.0
            else:
                m = np.asarray(req.mask, np.float32)[None]
                host = nearest_resize_np(m, self._hw, self._hw)
                if host is None:
                    # resolution not an integer multiple of the latent
                    # grid: same device-resize fallback as the fixed
                    # engine (engine.py:222-226) instead of rejecting
                    host = np.asarray(resize_mask_to_latent(
                        jnp.asarray(m), self._hw))
                image_row = host[0]
        # everything that can raise has run — commit the slot atomically
        self._occupied[slot] = True
        self._futures[slot] = fut
        req_steps = int(getattr(req, "steps", None) or self.steps)
        opt = self.step_options.index(req_steps)
        self._opt[slot] = opt
        self._total[slot] = self._opt_total[opt]
        self._keys[slot] = np.asarray(
            jax.random.PRNGKey(int(req.seed)), np.uint32)
        self._g[slot] = (req.guidance if req.guidance is not None
                         else self.default_guidance)
        if "text" in self.condition_types:
            self._cond["text"][slot] = text_row
        if "image" in self.condition_types:
            self._cond["image"][slot] = image_row
        if "class" in self.condition_types:
            ncls = self._cond["class"].shape[-1]
            cid = int(req.class_id) if req.class_id is not None else 0
            self._cond["class"][slot] = np.eye(ncls, dtype=np.float32)[cid]

    # ---- the scheduler loop -------------------------------------------------
    def _tick_once(self) -> int:
        """Admit -> one chunk dispatch -> resolve finished. Returns the
        number of active slots after the tick (0 = idle). Per-request
        errors fail that request's Future; a dispatch-level error fails
        the in-flight futures and resets the slots — the scheduler thread
        itself never dies (advisor r4 high)."""
        with self._lock:
            fresh = np.zeros((self.slots,), bool)
            drained = False
            for s in range(self.slots):
                if drained or self._occupied[s]:
                    continue
                while True:
                    try:
                        req, fut = self._queue.get_nowait()
                    except queue.Empty:
                        drained = True
                        break
                    try:
                        self._admit(s, req, fut)
                        fresh[s] = True
                        break
                    except Exception as e:  # noqa: BLE001 — isolate request
                        self._occupied[s] = False
                        self._futures[s] = None
                        if not fut.cancelled():
                            fut.set_exception(e)
                        # slot stays free: try the next queue entry in it
            if not self._occupied.any():
                return 0
            self._n_ticks += 1
            self._occ_sum += int(self._occupied.sum())

            try:
                # cond/guidance/keys only change at admission: keep the
                # device copies resident and re-upload only on fresh
                # ticks, so steady-state ticks ship just the small (S,)
                # control vectors (advisor r4 low: ~30 ms/host->device
                # interaction on the relay-attached chip)
                if fresh.any() or self._cond_dev is None:
                    self._cond_dev = {k: jnp.asarray(v)
                                      for k, v in self._cond.items()}
                    self._keys_dev = jnp.asarray(self._keys)
                    self._g_dev = jnp.asarray(self._g)
                self._lat, pos_dev = self._tick_fn(
                    self._den_state, self._lat, jnp.asarray(self._pos),
                    jnp.asarray(self._occupied), jnp.asarray(fresh),
                    self._keys_dev, self._g_dev,
                    self._cond_dev, self._uncond_dev,
                    jnp.asarray(self._opt), jnp.asarray(self._total))
                self._pos = np.asarray(pos_dev)

                done = self._occupied & (self._pos >= self._total)
                if done.any():
                    imgs = np.asarray(
                        self._decode_fn(self._vq_state, self._lat))
                    for s in np.nonzero(done)[0]:
                        fut = self._futures[s]
                        self._futures[s] = None
                        self._occupied[s] = False
                        if fut is not None:
                            fut.set_result(imgs[s])
            except Exception as e:  # noqa: BLE001 — fail futures, not loop
                for s in np.nonzero(self._occupied)[0]:
                    fut = self._futures[s]
                    self._futures[s] = None
                    self._occupied[s] = False
                    if fut is not None and not fut.cancelled():
                        fut.set_exception(e)
                # the donated latent buffer may be invalid after a failed
                # dispatch — rebuild the device state cleanly
                self._lat = jnp.zeros(
                    (self.slots, self._hw, self._hw, self._z), self.dtype)
                self._pos = np.full((self.slots,), self.max_steps, np.int32)
            return int(self._occupied.sum())

    # ---- public API ---------------------------------------------------------
    def submit(self, req: GenerateRequest) -> Future:
        """Queue one request; the Future resolves to a (H, W, C) uint8.
        Structurally invalid requests (bad class_id, wrong mask shape)
        fail their Future here, at the API edge, without entering the
        queue."""
        fut: Future = Future()
        self._n_requests += 1
        try:
            self._validate(req)
        except Exception as e:  # noqa: BLE001 — reject at the edge
            fut.set_exception(e)
            return fut
        self._queue.put((req, fut))
        return fut

    def generate(self, requests: Sequence[GenerateRequest]) -> np.ndarray:
        """Synchronous helper mirroring InferenceEngine.generate: submit
        all, drive ticks until every future resolves."""
        futs = [self.submit(r) for r in requests]
        self.run_until_idle()
        return np.stack([f.result() for f in futs])

    def warmup(self) -> float:
        """Compile + run the tick/decode programs once; returns seconds."""
        t0 = time.perf_counter()
        self.generate([GenerateRequest()])
        return time.perf_counter() - t0

    def run_until_idle(self) -> None:
        """Drive the scheduler inline until queue + slots drain (used by
        tests/benchmarks and by callers without the background worker)."""
        while not self._queue.empty() or self._occupied.any():
            self._tick_once()

    def start(self, poll_s: float = 0.005) -> None:
        """Background scheduler thread (the serving daemon path)."""
        if self._worker is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                try:
                    active = self._tick_once()
                except Exception as e:  # noqa: BLE001 — daemon must live
                    # _tick_once already fails affected futures; this is
                    # the last-resort guard for host-side surprises
                    self._last_error = e
                    active = 0
                if active == 0 and self._queue.empty():
                    time.sleep(poll_s)

        self._worker = threading.Thread(target=loop, daemon=True)
        self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=30)
            self._worker = None

    # RequestBatcher-compatible surface (serving/server.py uses the
    # batcher's submit/stats/close triple)
    def close(self) -> None:
        self.stop()

    def stats(self) -> dict:
        return {
            "requests": self._n_requests,
            "ticks": self._n_ticks,
            "mean_slot_occupancy": (round(self._occ_sum / self._n_ticks, 3)
                                    if self._n_ticks else 0.0),
            "slots": self.slots, "chunk": self.chunk,
        }

    def info(self) -> dict:
        from stablediffusion_pytorch_tpu.utils.provenance import build_stamp

        return {
            "slots": self.slots, "steps": self.steps, "chunk": self.chunk,
            "step_options": list(self.step_options),
            "method": self.method, "eta": self.eta,
            "default_guidance": self.default_guidance,
            "condition_types": self.condition_types,
            "latent": [self._hw, self._hw, self._z],
            "provenance": build_stamp(tokenizer=self.tokenizer,
                                      text_model=self.text_model),
        }
