"""FID-trajectory evidence: sample N digits from EMA checkpoints at several
epochs with the same DDIM protocol, score each set against the training
images with the (stamped, framework-internal) random-conv FID extractor,
and write runs_evidence/fid_trajectory.json.  One-shot evidence script for
RESULTS.md; not part of the package API."""
import json, os, sys
import numpy as np
import jax, jax.numpy as jnp
from flax import nnx
from PIL import Image

sys.argv = [sys.argv[0]]
from stablediffusion_pytorch_tpu.tools.sample_ddpm import sample
from stablediffusion_pytorch_tpu.analysis.fid import (
    compute_fid, default_extractor)
from stablediffusion_pytorch_tpu.utils.provenance import build_stamp

CKPT_ROOT = os.environ.get(
    "SDTPU_FID_CKPT_ROOT",
    "runs_evidence/mnist_ldm/ddpm_20260816-202721/mnist/checkpoints")
VQ = os.environ.get(
    "SDTPU_FID_VQ",
    "runs_evidence/mnist_vqvae/ddpm_20260816-195913/mnist/checkpoints/"
    "vqvae_autoencoder_ckpt")
OUT_ROOT = os.environ.get("SDTPU_FID_OUT", "runs_evidence")
LAST = int(os.environ.get("SDTPU_FID_LAST_EPOCH", "39"))
EPOCHS = sorted({0, 4, 12, LAST // 2, LAST})
N = 100

class A:  # minimal args namespace for sample()
    config = "mnist_class_cond"; vqvae_ckpt = VQ
    num_samples = N; class_id = -1; cf_guidance_scale = 2.0
    sampler = "ddim"; steps = 100; method = "linear"; eta = 0.0
    seed = 7; bf16 = False; prompt = None; mask_from_dataset = False
    save_trajectory = False; text_weights = None

def real_iter(limit=1000):
    root = "data/mnist/train/images"
    cnt = 0
    for cls in sorted(os.listdir(root)):
        for f in sorted(os.listdir(os.path.join(root, cls)))[: limit // 10]:
            with Image.open(os.path.join(root, cls, f)) as im:
                yield np.asarray(im.convert("RGB"), np.float32) / 255.0
            cnt += 1

extractor = default_extractor(None)
rows = []
for ep in EPOCHS:
    a = A()
    name = ("ema_ddpm_ckpt_class_cond_latest" if ep == LAST
            else f"ema_epoch_{ep:03d}_ddpm_ckpt_class_cond")
    a.ckpt = os.path.join(CKPT_ROOT, name)
    a.output_root = os.path.join(OUT_ROOT, f"fid_traj/ep{ep:03d}")
    imgs = sample(a)  # (N, H, W, C) in [-1, 1]
    fake = [(np.repeat(np.asarray(g), 3, axis=-1) + 1) / 2 if g.shape[-1] == 1
            else (np.asarray(g) + 1) / 2 for g in imgs]
    fid = compute_fid(real_iter(), iter(fake), extractor=extractor,
                      batch_size=32)
    rows.append({"epoch": ep, "fid_internal": round(float(fid), 3)})
    print("epoch", ep, "framework-FID", fid, flush=True)

out = {"protocol": "DDIM-100 eta=0 cfg=2.0 n=100 vs 1000 train images",
       "provenance": build_stamp(fid_extractor=extractor),
       "trajectory": rows}
with open(os.path.join(OUT_ROOT, "fid_trajectory.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
