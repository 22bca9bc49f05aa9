"""Mask-painter GUI: paint 19-class CelebAMask semantic masks, enter a
prompt + CFG scale + DDIM steps, generate live.

Usage: ``python -m stablediffusion_pytorch_tpu.gui.mask_painter
--config celebhq_text_image_cond [--ckpt ... --vqvae-ckpt ...]``

Re-implements the reference's tkinter GUIs
(gui_ddpm_text_image_cond_celebhq_{tc05,tc05_andi,full_size_ldm}.py and the
Model_*_GUI.py family, ~1000 LoC each): label list + RGB palette
(reference: gui_..._tc05_andi.py:42-68), brush painting on a canvas,
quadratic-schedule DDIM with a CFG-wrapped model
(_GuidedModelWrapper :147-165), live result display. The ``--qat`` flag
first runs the ProgressiveTrain conversion so sampling goes through
quantized+noisy CIM layers (the _andi GUIs' behavior).

The painting/model logic lives in ``MaskPainterCore`` (headless-testable);
tkinter is only the shell.
"""

from __future__ import annotations

import argparse
import logging
from typing import Optional

import numpy as np

log = logging.getLogger("sdtpu")

# CelebAMask-HQ label palette (reference: gui_..._tc05_andi.py:42-68)
LABELS = ["skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow",
          "l_ear", "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat",
          "ear_r", "neck_l", "neck", "cloth"]
PALETTE = [
    (204, 0, 0), (76, 153, 0), (204, 204, 0), (51, 51, 255), (204, 0, 204),
    (0, 255, 255), (255, 204, 204), (102, 51, 0), (255, 0, 0),
    (102, 204, 0), (255, 255, 0), (0, 0, 153), (0, 0, 204), (255, 51, 153),
    (0, 204, 204), (0, 51, 0), (255, 153, 51), (0, 204, 0),
]


class MaskPainterCore:
    """Headless painting state + sampling backend."""

    def __init__(self, config: str = "celebhq_text_image_cond",
                 ckpt: Optional[str] = None,
                 vqvae_ckpt: Optional[str] = None, qat: bool = False,
                 mask_size: int = 512, canvas_size: int = 256):
        self.config = config
        self.ckpt = ckpt
        self.vqvae_ckpt = vqvae_ckpt
        self.qat = qat
        self.mask_size = mask_size
        self.canvas_size = canvas_size
        # label map: 0 = background, 1..18 = parts
        self.label_map = np.zeros((canvas_size, canvas_size), np.uint8)
        self.current_label = 1
        self.brush = 8
        self._models = None

    # ---- painting ----------------------------------------------------
    def select_label(self, idx: int) -> None:
        assert 1 <= idx <= len(LABELS)
        self.current_label = idx

    def paint(self, x: int, y: int) -> None:
        r = self.brush
        yy, xx = np.ogrid[:self.canvas_size, :self.canvas_size]
        circle = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
        self.label_map[circle] = self.current_label

    def clear(self) -> None:
        self.label_map[:] = 0

    def rgb_preview(self) -> np.ndarray:
        out = np.zeros((self.canvas_size, self.canvas_size, 3), np.uint8)
        for i, color in enumerate(PALETTE, start=1):
            out[self.label_map == i] = color
        return out

    def one_hot_mask(self) -> np.ndarray:
        """label map -> (mask_size, mask_size, 18) float32 (background
        dropped), nearest-resized like the dataset path
        (celeb_dataset.py:164-184)."""
        from PIL import Image

        im = Image.fromarray(self.label_map, "L").resize(
            (self.mask_size, self.mask_size), Image.NEAREST)
        label = np.asarray(im, np.int64)
        one_hot = np.eye(len(LABELS) + 1, dtype=np.float32)[label]
        return one_hot[..., 1:]

    # ---- sampling backend --------------------------------------------
    def _ensure_models(self):
        if self._models is not None:
            return self._models
        import jax.numpy as jnp
        from flax import nnx

        from stablediffusion_pytorch_tpu.data.text import (
            get_tokenizer_and_model,
        )
        from stablediffusion_pytorch_tpu.schedulers import (
            make_compvis_linear_schedule,
        )
        from stablediffusion_pytorch_tpu.tools.common import (
            build_denoiser, build_vqvae, load_config,
        )
        from stablediffusion_pytorch_tpu.training.checkpoint import load_model

        cfg = load_config(self.config)
        dp = dict(cfg.diffusion_params)
        model = build_denoiser(cfg)
        if self.ckpt:
            load_model(self.ckpt, model)
        if self.qat:
            # sampling through quantized CIM layers (the _andi GUIs)
            from stablediffusion_pytorch_tpu.cim import (
                ProgressiveTrain, calibrate_quant_layers,
            )
            from stablediffusion_pytorch_tpu.cim.registry import nn_layers

            pt = ProgressiveTrain(model)
            pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                                 weight_bit=4, input_bit=8, output_bit=0,
                                 noise_scale=0.08)
        vqvae = build_vqvae(cfg)
        if self.vqvae_ckpt:
            load_model(self.vqvae_ckpt, vqvae)
        tokenizer, text_model = get_tokenizer_and_model("clip")
        sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                             dp["beta_start"], dp["beta_end"])
        self._models = dict(cfg=cfg, model=model, vqvae=vqvae,
                            tokenizer=tokenizer, text_model=text_model,
                            sched=sched)
        return self._models

    def generate(self, prompt: str, cf_scale: float = 1.0,
                 steps: int = 50, seed: int = 11111) -> np.ndarray:
        """Run DDIM (quadratic) with CFG over the painted mask; returns an
        (H, W, 3) uint8 image. SEED defaults to the reference GUIs' 11111
        (gui_..._tc05_andi.py:33-40)."""
        import jax
        import jax.numpy as jnp
        from flax import nnx

        from stablediffusion_pytorch_tpu.schedulers import ddim_sample
        from stablediffusion_pytorch_tpu.tools.common import latent_hw
        from stablediffusion_pytorch_tpu.data.text import (
            get_text_representation,
        )
        from stablediffusion_pytorch_tpu.utils.image_utils import to_uint8

        m = self._ensure_models()
        cfg = m["cfg"]
        hw = latent_hw(cfg)
        z = cfg.autoencoder_params["z_channels"]
        mask = jnp.asarray(self.one_hot_mask())[None]
        cond = {"image": mask}
        uncond = {"image": jnp.zeros_like(mask)}
        cc = dict(cfg.ldm_params).get("condition_config") or {}
        if "text" in cc.get("condition_types", []):
            cond["text"] = get_text_representation(
                [prompt], m["tokenizer"], m["text_model"])
            uncond["text"] = get_text_representation(
                [""], m["tokenizer"], m["text_model"])

        graphdef, state = nnx.split(m["model"])

        def model_fn(xt, t, c):
            return nnx.merge(graphdef, state)(xt, t, c)

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        xt = jax.random.normal(k1, (1, hw, hw, z))
        x0 = ddim_sample(model_fn, m["sched"], xt, k2, steps=steps,
                         method="quadratic", cond=cond,
                         uncond=uncond if cf_scale > 1 else None,
                         guidance_scale=cf_scale if cf_scale > 1 else None)
        vq_graphdef, vq_state = nnx.split(m["vqvae"])
        img = nnx.merge(vq_graphdef, vq_state).decode(x0)
        return to_uint8(np.asarray(jnp.clip(img, -1, 1))[0])


# ---------------------------------------------------------------------------
# tkinter shell
# ---------------------------------------------------------------------------

def run_gui(core: MaskPainterCore):  # pragma: no cover - needs a display
    import tkinter as tk

    from PIL import Image, ImageTk

    root = tk.Tk()
    root.title("TPU latent-diffusion mask painter")

    canvas = tk.Canvas(root, width=core.canvas_size,
                       height=core.canvas_size, bg="black")
    canvas.grid(row=0, column=0, rowspan=22)
    result = tk.Label(root)
    result.grid(row=0, column=2, rowspan=22)

    photo = {"mask": None, "out": None}

    def refresh():
        img = Image.fromarray(core.rgb_preview())
        photo["mask"] = ImageTk.PhotoImage(img)
        canvas.create_image(0, 0, anchor="nw", image=photo["mask"])

    def on_drag(ev):
        core.paint(ev.x, ev.y)
        refresh()

    canvas.bind("<B1-Motion>", on_drag)
    canvas.bind("<Button-1>", on_drag)

    for i, (name, color) in enumerate(zip(LABELS, PALETTE), start=1):
        hexc = "#%02x%02x%02x" % color
        tk.Button(root, text=name, bg=hexc,
                  command=lambda i=i: core.select_label(i)
                  ).grid(row=i, column=1, sticky="ew")

    prompt_var = tk.StringVar(value="a photograph of a face")
    scale_var = tk.DoubleVar(value=1.0)
    steps_var = tk.IntVar(value=50)
    tk.Entry(root, textvariable=prompt_var, width=40).grid(row=19, column=1)
    tk.Scale(root, variable=scale_var, from_=0.5, to=8.0, resolution=0.1,
             orient="horizontal", label="CFG scale").grid(row=20, column=1)
    tk.Scale(root, variable=steps_var, from_=10, to=200, orient="horizontal",
             label="DDIM steps").grid(row=21, column=1)

    def on_generate():
        img = core.generate(prompt_var.get(), scale_var.get(),
                            steps_var.get())
        photo["out"] = ImageTk.PhotoImage(Image.fromarray(img))
        result.configure(image=photo["out"])

    tk.Button(root, text="Generate", command=on_generate).grid(
        row=22, column=1)
    tk.Button(root, text="Clear", command=lambda: (core.clear(), refresh())
              ).grid(row=23, column=1)
    refresh()
    root.mainloop()


def main():
    parser = argparse.ArgumentParser(description="Mask painter GUI")
    parser.add_argument("--config", default="celebhq_text_image_cond")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--vqvae-ckpt", default=None)
    parser.add_argument("--qat", action="store_true",
                        help="sample through quantized CIM layers")
    args = parser.parse_args()
    core = MaskPainterCore(args.config, args.ckpt, args.vqvae_ckpt, args.qat)
    run_gui(core)


if __name__ == "__main__":
    main()
