"""Conditional (and unconditional) latent-DDPM training CLI.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond
--config celebhq_text_image_cond [--epochs N]``

Re-implements reference tools/train_ddpm_cond.py:19-218 (and the
unconditional tools/train_ddpm_vqvae.py, which is the same loop minus the
condition handling — run with a config that has no condition_config):
scheduler + text encoder + cached empty-text embedding, precomputed-latent
dataset, per-batch text->embedding + CFG dropout, q-sample + denoiser + MSE.
Adds the flagship trainer's production features (EMA, bf16, grad clip,
non-finite skip, data-parallel sharding) from
train_ddpm_cond_celebhq_multi_gpu.py via LdmTrainer.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_pytorch_tpu.data import DataLoader
from stablediffusion_pytorch_tpu.data.text import (
    get_text_representation, get_tokenizer_and_model,
)
from stablediffusion_pytorch_tpu.parallel import (
    make_mesh_for_batch, shard_stacked_batch,
)
from stablediffusion_pytorch_tpu.schedulers import make_compvis_linear_schedule
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_denoiser, build_vqvae, latent_hw, load_config,
    seed_everything,
)
from stablediffusion_pytorch_tpu.training import LdmTrainer
from stablediffusion_pytorch_tpu.training.checkpoint import (
    load_model, save_train_checkpoint,
)
from stablediffusion_pytorch_tpu.utils.train_utils import (
    create_run_artifacts, persist_loss_history, save_config_snapshot_json,
)

log = logging.getLogger("sdtpu")


def prepare_cond_batch(cond_np, condition_types, tokenizer, text_model,
                       num_classes=None, latent_size=None):
    """Host-side condition prep: text -> CLIP embedding (no-grad), class ->
    one-hot; masks pre-resized to latent resolution (2x step time saved,
    see utils.diffusion_utils.resize_mask_to_latent)
    (reference: train_ddpm_cond.py:150-190)."""
    from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
        resize_mask_to_latent,
    )

    cond = {}
    if "text" in condition_types:
        cond["text"] = get_text_representation(cond_np["text"], tokenizer,
                                               text_model)
    if "image" in condition_types:
        mask = np.asarray(cond_np["image"])
        if latent_size and mask.shape[1] % latent_size == 0 \
                and mask.shape[2] % latent_size == 0:
            # downsample ON HOST before the device transfer: the strided
            # slice is bit-identical to nearest resize (diffusion_utils.
            # nearest_resize), and shipping the full-res mask every step
            # both wastes relay bandwidth and leaks pinned host buffers in
            # the experimental axon runtime (~37 MB/step at 128^2 b32 —
            # the remainder of the OOM fixed in data/text.py)
            rh = mask.shape[1] // latent_size
            rw = mask.shape[2] // latent_size
            mask = mask[:, rh // 2::rh, rw // 2::rw, :]
        mask = jnp.asarray(mask)
        if latent_size:
            mask = resize_mask_to_latent(mask, latent_size)
        cond["image"] = mask
    if "class" in condition_types:
        cond["class"] = jax.nn.one_hot(jnp.asarray(cond_np["class"]),
                                       num_classes)
    return cond


def train(args):
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    dp = dict(cfg.diffusion_params)
    key = seed_everything(tc.get("seed", 1111))

    arts = create_run_artifacts(args.output_root, tc["task_name"])
    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])

    condition_config = dict(cfg.ldm_params).get("condition_config")
    condition_types = (condition_config or {}).get("condition_types", [])

    tokenizer = text_model = empty_text_embed = None
    num_classes = None
    if "text" in condition_types:
        ttype = condition_config["text_condition_config"].get(
            "text_embed_model", "clip")
        tokenizer, text_model = get_tokenizer_and_model(
            ttype, weights_path=args.text_weights)
        empty_text_embed = get_text_representation([""], tokenizer, text_model)
    if "class" in condition_types:
        num_classes = condition_config["class_condition_config"]["num_classes"]
    save_config_snapshot_json(arts["run_dir"], cfg, tokenizer=tokenizer,
                              text_model=text_model)

    model = build_denoiser(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    if getattr(args, "remat", False):
        # gradient checkpointing: per-layer/per-block activation recompute
        # in the backward pass (models/{dit,unet}.py) — trains larger
        # batches/configs in the same HBM for one extra forward of FLOPs
        model.remat = True
        log.info("gradient checkpointing (remat) enabled")
    if getattr(args, "resume", None):
        # resume from a prior run's ckpt (reference config key
        # model_paths_ldm_ckpt_resume, multi_gpu.py:249-254)
        load_model(args.resume, model)
        log.info("resumed denoiser from %s", args.resume)

    tp = max(1, getattr(args, "tp", 1))
    pp = max(1, getattr(args, "pp", 1))
    if tp > 1 and pp > 1:
        raise ValueError("--tp and --pp are separate meshes; pick one "
                         "(hybrid TP x PP is not wired in this CLI)")
    n_dev = len(jax.devices())
    batch = tc["ldm_batch_size"]
    if pp > 1:
        # GPipe pipeline (+ data parallel over the leftover devices):
        # ('data', 'pipe') mesh, transformer stack sharded over 'pipe',
        # batch over 'data'. See training/pp.py and parallel/pp.py.
        from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
        from stablediffusion_pytorch_tpu.training.pp import PPLdmTrainer

        if n_dev % pp:
            raise ValueError(f"--pp {pp} does not divide {n_dev} devices")
        dp = n_dev // pp
        while dp > 1 and batch % dp:
            dp //= 2  # fewer data shards rather than an unsplittable batch
        mesh = make_mesh(dp * pp, ("data", "pipe"), axis_sizes=(dp, pp))
        trainer = PPLdmTrainer(
            model, sched, mesh, n_microbatches=args.microbatches,
            lr=tc["ldm_lr"], condition_config=condition_config,
            empty_text_embed=empty_text_embed,
            data_axis="data" if dp > 1 else None)
        log.info("pipeline parallel: %d stages x %d data shards, "
                 "%d microbatches", pp, dp, args.microbatches)
    elif tp > 1:
        # Megatron tensor parallel (+ data parallel): shard the attention/
        # MLP kernels over 'model' BEFORE the trainer copies params into
        # optimizer moments / EMA so every training buffer inherits the
        # sharding. See parallel/tp.py.
        from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
        from stablediffusion_pytorch_tpu.parallel.tp import apply_tp_sharding

        if n_dev % tp:
            raise ValueError(f"--tp {tp} does not divide {n_dev} devices")
        dp = n_dev // tp
        while dp > 1 and batch % dp:
            dp //= 2
        mesh = make_mesh(dp * tp, ("data", "model"), axis_sizes=(dp, tp))
        n_tp = apply_tp_sharding(model, mesh)
        if getattr(args, "sp", False):
            # sequence parallel: residual-stream tokens sharded over the
            # TP axis between layers (parallel/sp.py)
            from stablediffusion_pytorch_tpu.parallel.sp import apply_sp
            apply_sp(model, mesh)
            log.info("sequence parallel: residual tokens sharded %d-way", tp)
        trainer = LdmTrainer(model, sched, lr=tc["ldm_lr"],
                             condition_config=condition_config,
                             empty_text_embed=empty_text_embed)
        log.info("tensor parallel: %d-way over %d params x %d data shards",
                 tp, n_tp, dp)
    else:
        mesh = make_mesh_for_batch(batch)
        trainer = LdmTrainer(model, sched, lr=tc["ldm_lr"],
                             condition_config=condition_config,
                             empty_text_embed=empty_text_embed)

    if getattr(args, "zero1", False):
        # ZeRO-1: shard Adam moments + EMA over 'data' — parameters stay
        # replicated, optimizer memory drops ~Nx (parallel/zero.py)
        if pp > 1:
            raise ValueError("--zero1 composes with DP/TP; the PP trainer "
                             "already shards its optimizer state over "
                             "'pipe' (training/pp.py)")
        from stablediffusion_pytorch_tpu.parallel.zero import apply_zero1
        n_z = apply_zero1(trainer, mesh)
        log.info("ZeRO-1: sharded %d optimizer/EMA arrays over the "
                 "%d-way data axis", n_z, mesh.shape["data"])

    latent_dir = os.path.join(args.latent_root or args.output_root,
                              tc["task_name"], tc["vqvae_latent_dir_name"])
    # masks are consumed at latent resolution only (prepare_cond_batch);
    # asking the dataset to one-hot them there saves ~250x of per-item
    # host work at the 512^2 flagship config (the single data-feed core is
    # on the train-step critical path — measured in PERF.md round 3)
    hw = latent_hw(cfg)
    ds = build_dataset(cfg, use_latents=True, latent_path=latent_dir,
                       condition_config=condition_config, mask_hw=(hw, hw))
    if not ds.use_latents:
        log.warning("latents not found at %s — encoding on the fly via "
                    "VQVAE (slower); run infer_vqvae --save-latents first",
                    latent_dir)
        vqvae = build_vqvae(cfg)
        if args.vqvae_ckpt:
            load_model(args.vqvae_ckpt, vqvae)
    else:
        vqvae = None

    dl = DataLoader(ds, batch_size=tc["ldm_batch_size"],
                    seed=tc.get("seed", 1111))

    num_epochs = args.epochs or tc["ldm_epochs"]
    start_epoch = max(0, getattr(args, "start_epoch", 0))
    save_every = tc.get("ldm_save_every_epochs", 1)
    all_losses, boundaries = [], []

    steps_per_call = max(1, getattr(args, "steps_per_call", 1))
    pending = []  # HOST-side (latents_np, cond_np) buffered for one flush

    # The feed path stays on the host until one fused transfer per flush:
    # every device interaction on the relay-attached chip costs a ~30 ms
    # round trip (PERF.md), and the original per-batch flow paid it 4-6
    # times per step (text-encoder dispatch, mask put, shard put, device
    # stacks) — measured at 300+ ms/step against a 2.3 ms on-chip step.
    # Here each flush does: host np.stack, ONE text-encoder dispatch for
    # all S batches, ONE sharded device_put, ONE train dispatch.
    hw = latent_hw(cfg)

    def build_cond_stack(conds):
        """S per-batch host cond dicts -> one (S, B, ...) cond stack."""
        from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
            nearest_resize_np,
        )

        S = len(conds)
        stack = {}
        if "text" in condition_types:
            flat = [t for c in conds for t in c["text"]]
            emb = get_text_representation(flat, tokenizer, text_model)
            stack["text"] = emb.reshape(S, -1, *emb.shape[1:])
        if "image" in condition_types:
            masks = np.stack([np.asarray(c["image"]) for c in conds])
            if masks.shape[2] != hw or masks.shape[3] != hw:
                s, b = masks.shape[:2]
                flat = nearest_resize_np(
                    masks.reshape(s * b, *masks.shape[2:]), hw, hw)
                if flat is None:
                    # non-integer downsample ratio: one device resize per
                    # flush (same fallback the pre-accumulation path had —
                    # prepare_cond_batch / engine.py keep it too); datasets
                    # with such mask shapes must keep training, not abort
                    from stablediffusion_pytorch_tpu.utils.diffusion_utils \
                        import resize_mask_to_latent
                    flat = np.asarray(resize_mask_to_latent(
                        jnp.asarray(masks.reshape(s * b, *masks.shape[2:])),
                        hw))
                masks = flat.reshape(s, b, hw, hw, masks.shape[-1])
            stack["image"] = masks
        if "class" in condition_types:
            oh = np.eye(num_classes, dtype=np.float32)
            stack["class"] = np.stack(
                [oh[np.asarray(c["class"])] for c in conds])
        return stack

    def flush(epoch_losses, k_step):
        if not pending:
            return
        lat = shard_stacked_batch(mesh, np.stack([p[0] for p in pending]))
        cond_stack = None
        if condition_types:
            cond_stack = shard_stacked_batch(
                mesh, build_cond_stack([p[1] for p in pending]))
        epoch_losses.extend(trainer.train_multi_step(lat, cond_stack, k_step))
        pending.clear()

    for epoch in range(start_epoch, num_epochs):
        epoch_losses = []
        for batch in dl.epoch(epoch):
            im, cond_np = batch if condition_types else (batch, {})
            key, k_step = jax.random.split(key)
            if vqvae is not None:
                # on-the-fly encode (slow path, warned above): fetch to host
                # and continue through the same host-accumulated feed
                latents = np.asarray(vqvae.encode(jnp.asarray(im))[0])
            else:
                latents = np.asarray(im)
            pending.append((latents, cond_np))
            if len(pending) >= steps_per_call:
                flush(epoch_losses, k_step)
        key, k_tail = jax.random.split(key)
        flush(epoch_losses, k_tail)
        # single host sync per epoch (reference syncs every step — §5)
        epoch_np = [float(x) for x in epoch_losses]
        mean_loss = float(np.mean(epoch_np)) if epoch_np else float("nan")
        all_losses.extend(epoch_np)
        boundaries.append(len(all_losses))
        lr = trainer.end_epoch(mean_loss)
        log.info("epoch %d | mean loss %.4f | lr %.2e", epoch, mean_loss, lr)
        if (epoch + 1) % save_every == 0 or epoch == num_epochs - 1:
            if hasattr(trainer, "sync_into_model"):
                trainer.sync_into_model()  # PP: stack/rest -> plain model
            save_train_checkpoint(arts["ckpt_dir"],
                                  tc.get("ldm_ckpt_name", "ddpm_ckpt"),
                                  epoch, model, trainer.ema_params)
            persist_loss_history(arts["run_dir"], all_losses, boundaries)
    log.info("Done Training ...")
    return arts


def main():
    parser = argparse.ArgumentParser(description="Arguments for ddpm training")
    parser.add_argument("--config", dest="config",
                        default="celebhq_text_image_cond")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--start-epoch", type=int, default=0,
                        help="first (global) epoch index — lets resumed "
                             "chunks keep a global epoch numbering so "
                             "epoch_NNN checkpoints from different chunks "
                             "line up for matched-epoch comparisons")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument("--vqvae-ckpt", default=None)
    parser.add_argument("--resume", default=None,
                        help="denoiser ckpt to resume from")
    parser.add_argument("--text-weights", default=None)
    parser.add_argument("--latent-root", default=None)
    parser.add_argument("--output-root", default="runs")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="optimizer steps fused into one jitted scan "
                             "(amortizes dispatch latency; see PERF.md)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel ways (Megatron shardings over "
                             "a 'model' mesh axis; DiT only)")
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel stages (GPipe over a 'pipe' "
                             "mesh axis; DiT only)")
    parser.add_argument("--microbatches", type=int, default=4,
                        help="GPipe microbatches per step (with --pp)")
    parser.add_argument("--sp", action="store_true",
                        help="sequence parallel (with --tp): shard the "
                             "residual-stream token axis over the TP axis "
                             "between layers")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1: shard Adam moments + EMA over the "
                             "data axis (params stay replicated; ~Nx less "
                             "optimizer HBM per chip)")
    parser.add_argument("--remat", action="store_true",
                        help="gradient checkpointing: recompute layer/block "
                             "activations in the backward pass (larger "
                             "batches per chip for one extra forward)")
    train(parser.parse_args())


if __name__ == "__main__":
    main()
