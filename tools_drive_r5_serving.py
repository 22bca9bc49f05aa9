"""Verify-drive: SlotEngine error isolation / mask fallback / eta>0 per-slot
determinism, and quant external-noise-key thread-locality. CPU backend."""
import threading

import numpy as np
import yaml

CFG = yaml.safe_load("""
dataset_params: {im_path: unused, im_channels: 3, im_size: 16, name: celebhq}
diffusion_params: {num_timesteps: 20, beta_start: 0.0015, beta_end: 0.0195}
ldm_params:
  down_channels: [8, 16, 16, 24]
  mid_channels: [24, 24, 16]
  down_sample: [true, false, false]
  attn_down: [true, true, true]
  time_emb_dim: 16
  norm_channels: 4
  num_heads: 2
  conv_out_channels: 16
  num_down_layers: 1
  num_mid_layers: 1
  num_up_layers: 1
  condition_config:
    condition_types: [class, image]
    class_condition_config: {num_classes: 5, cond_drop_prob: 0.1}
    image_condition_config:
      image_condition_input_channels: 18
      image_condition_output_channels: 3
      image_condition_h: 32
      image_condition_w: 32
      cond_drop_prob: 0.1
autoencoder_params:
  z_channels: 2
  codebook_size: 8
  down_channels: [8, 16]
  mid_channels: [16, 16]
  down_sample: [true]
  attn_down: [false]
  norm_channels: 4
  num_heads: 2
  num_down_layers: 1
  num_mid_layers: 1
  num_up_layers: 1
""")

CFG["train_params"] = {"seed": 7, "task_name": "drive_r5"}
import os
import tempfile

from stablediffusion_pytorch_tpu.serving import GenerateRequest, SlotEngine
from stablediffusion_pytorch_tpu.tools.common import (
    build_denoiser, build_vqvae, load_config,
)

_d = tempfile.mkdtemp(prefix="drive_r5_")
with open(os.path.join(_d, "cfg.yaml"), "w") as _f:
    yaml.safe_dump(CFG, _f)
CFG = load_config(os.path.join(_d, "cfg.yaml"))

se = SlotEngine(CFG, build_denoiser(CFG), build_vqvae(CFG), None, None,
                slots=4, steps=4, chunk=2, guidance=2.0)
rng = np.random.default_rng(3)
good_mask = rng.random((32, 32, 18), dtype=np.float32)

# 1. plain good requests through the background worker
se.start()
futs = [se.submit(GenerateRequest(prompt="", seed=i, class_id=i % 5,
                                  mask=good_mask)) for i in range(6)]
imgs = [f.result(timeout=300) for f in futs]
assert all(im.dtype == np.uint8 and im.shape == (16, 16, 3) for im in imgs)
print("1. 6 good requests via background worker: OK")

# 2. malformed at the edge: bad class_id and bad mask shape fail their OWN
#    future, scheduler survives, next good request still resolves
bad1 = se.submit(GenerateRequest(prompt="", seed=9, class_id=99,
                                 mask=good_mask))
bad2 = se.submit(GenerateRequest(prompt="", seed=9, class_id=1,
                                 mask=rng.random((32, 32, 4),
                                                 dtype=np.float32)))
for b, what in [(bad1, "class_id 99"), (bad2, "mask channels")]:
    try:
        b.result(timeout=60)
        raise SystemExit(f"FAIL: {what} did not raise")
    except ValueError as e:
        print(f"2. {what} -> ValueError at edge: OK ({e})")
after = se.submit(GenerateRequest(prompt="", seed=10, class_id=2,
                                  mask=good_mask))
assert after.result(timeout=300).dtype == np.uint8
print("2. scheduler alive after rejects, good request resolves: OK")

# 3. non-integer-multiple mask resolution (48 -> 32 grid): device-resize
#    fallback instead of rejection (parity with the fixed engine)
odd = se.submit(GenerateRequest(prompt="", seed=11, class_id=3,
                                mask=rng.random((48, 48, 18),
                                                dtype=np.float32)))
assert odd.result(timeout=300).dtype == np.uint8
print("3. 48x48 mask (non-multiple of 32 grid) resolves via fallback: OK")
se.stop()

# 4. eta>0 per-slot determinism: same request solo vs co-tenant -> same image
se_eta = SlotEngine(CFG, build_denoiser(CFG), build_vqvae(CFG), None, None,
                    slots=4, steps=4, chunk=2, guidance=2.0, eta=0.5)
probe = GenerateRequest(prompt="", seed=77, class_id=1, mask=good_mask)
solo = se_eta.generate([probe])[0]
others = [GenerateRequest(prompt="", seed=200 + i, class_id=i % 5,
                          mask=good_mask) for i in range(3)]
cotenant = se_eta.generate(others + [probe])[3]
np.testing.assert_array_equal(solo, cotenant)
print("4. eta=0.5: solo == co-tenant image (per-slot noise stream): OK")

# 5. quant external-noise-key thread locality: each thread sees only its key
from stablediffusion_pytorch_tpu.ops.quant import (
    external_noise_key, get_external_noise_key,
)
import jax

seen = {}
barrier = threading.Barrier(2)


def worker(tag, seed):
    with external_noise_key(jax.random.PRNGKey(seed)):
        barrier.wait()          # both threads inside their contexts
        seen[tag] = np.asarray(get_external_noise_key()).tolist()
        barrier.wait()
    seen[tag + "_after"] = get_external_noise_key()


t1 = threading.Thread(target=worker, args=("a", 1))
t2 = threading.Thread(target=worker, args=("b", 2))
t1.start(); t2.start(); t1.join(); t2.join()
assert seen["a"] != seen["b"], "keys leaked across threads"
assert seen["a_after"] is None and seen["b_after"] is None
print("5. external_noise_key thread-local isolation: OK")
print("DRIVE PASS")
