"""Procedural dataset generation for training-evidence runs.

The build environment has no network egress, so the reference datasets
(MNIST pngs, CelebA-HQ) cannot be downloaded. This tool renders two honest
synthetic substitutes **in the exact on-disk layouts the reference datasets
use** (dataset/mnist_dataset.py:10-95, dataset/celeb_dataset.py:16-238), so
every trainer/sampler/eval tool runs unmodified:

  * ``mnist``  — 28x28 grayscale digits rendered with the system DejaVu
    fonts under random affine jitter, written to
    ``<root>/train/images/<digit>/*.png`` (+ a test split). Same layout the
    reference MnistDataset scans.
  * ``faces``  — procedural "portrait" images with *paired* CelebAMask-HQ
    style semantic label maps and attribute captions:
    ``<root>/CelebA-HQ-img/<i>.jpg``, ``<root>/CelebAMask-HQ-mask/<i>.png``
    (512^2 label map, values 0..18 in CELEB_MASK_LABELS order), and
    ``<root>/celeba-caption/<i>.txt`` (several caption lines; the dataset
    samples one per epoch, celeb_dataset.py:195). Faces vary in skin tone,
    hair style/colour, eye colour, glasses, hats, earrings, necklaces,
    expression and clothing — a genuinely learnable joint distribution for
    the text+mask-conditioned LDM.

Both are deterministic given --seed.
"""

from __future__ import annotations

import argparse
import math
import os
import random

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

# ----------------------------------------------------------------------
# MNIST-style digits
# ----------------------------------------------------------------------

_FONT_FILES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
]


def _render_digit(digit: int, rng: random.Random) -> Image.Image:
    """One 28x28 white-on-black digit with random font/size/rotation/shift."""
    fonts = [f for f in _FONT_FILES if os.path.exists(f)]
    font_path = rng.choice(fonts) if fonts else None
    size = rng.randint(30, 46)  # on the 2x canvas, halved by the downsample
    font = (ImageFont.truetype(font_path, size) if font_path
            else ImageFont.load_default())
    # render large then rotate+downsample for soft anti-aliased strokes
    big = Image.new("L", (56, 56), 0)
    d = ImageDraw.Draw(big)
    bbox = d.textbbox((0, 0), str(digit), font=font)
    w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
    cx = 28 - w / 2 - bbox[0] + rng.uniform(-3, 3)
    cy = 28 - h / 2 - bbox[1] + rng.uniform(-3, 3)
    d.text((cx, cy), str(digit), fill=255, font=font)
    big = big.rotate(rng.uniform(-20, 20), resample=Image.BILINEAR,
                     center=(28, 28))
    if rng.random() < 0.3:
        big = big.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 0.9)))
    return big.resize((28, 28), Image.BILINEAR)


def make_mnist(root: str, per_class_train: int, per_class_test: int,
               seed: int) -> None:
    rng = random.Random(seed)
    for split, n in (("train", per_class_train), ("test", per_class_test)):
        for digit in range(10):
            out_dir = os.path.join(root, split, "images", str(digit))
            os.makedirs(out_dir, exist_ok=True)
            for i in range(n):
                _render_digit(digit, rng).save(
                    os.path.join(out_dir, f"{i:05d}.png"))
        print(f"mnist {split}: {10 * n} images under {root}/{split}/images")


# ----------------------------------------------------------------------
# Procedural faces with CelebAMask-HQ style masks + captions
# ----------------------------------------------------------------------

# label values in the 512^2 label map (0 = background); order matches
# data/datasets.py CELEB_MASK_LABELS (index i -> value i+1)
L = {name: i + 1 for i, name in enumerate([
    "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear",
    "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l",
    "neck", "cloth",
])}

_SKIN_TONES = [(255, 224, 196), (240, 200, 170), (220, 177, 140),
               (198, 140, 100), (160, 105, 75), (120, 80, 60)]
_HAIR_COLORS = {"black": (25, 22, 20), "brown": (90, 56, 30),
                "blond": (215, 180, 105), "red": (150, 60, 30),
                "gray": (160, 160, 160)}
_EYE_COLORS = {"brown": (90, 55, 25), "blue": (70, 110, 180),
               "green": (70, 140, 90), "gray": (120, 125, 130)}
_CLOTH_COLORS = {"red": (170, 40, 45), "blue": (40, 70, 150),
                 "green": (40, 120, 70), "white": (235, 235, 235),
                 "black": (30, 30, 34), "purple": (110, 55, 150),
                 "yellow": (220, 190, 60)}


def _sample_attrs(rng: random.Random) -> dict:
    return {
        "skin": rng.choice(_SKIN_TONES),
        "hair_color": rng.choice(list(_HAIR_COLORS)),
        "hair_style": rng.choice(["short", "long", "bald"]),
        "eye_color": rng.choice(list(_EYE_COLORS)),
        "glasses": rng.random() < 0.3,
        "hat": rng.random() < 0.2,
        "earrings": rng.random() < 0.25,
        "necklace": rng.random() < 0.2,
        "smiling": rng.random() < 0.5,
        "cloth": rng.choice(list(_CLOTH_COLORS)),
        "face_w": rng.uniform(0.82, 1.12),
        "face_h": rng.uniform(0.88, 1.1),
        "bg": tuple(rng.randint(40, 215) for _ in range(3)),
    }


def _draw_face(attrs: dict, rng: random.Random, canvas: int = 512):
    """Render (RGB image, label map) at canvas^2 from one attribute dict.
    All geometry is drawn twice — once with colours, once with label ids —
    so image and mask agree pixel-for-pixel."""
    img = Image.new("RGB", (canvas, canvas), attrs["bg"])
    lab = Image.new("L", (canvas, canvas), 0)
    di, dl = ImageDraw.Draw(img), ImageDraw.Draw(lab)
    s = canvas / 512.0  # geometry below is authored at 512

    def both(method, xy, color, label, **kw):
        getattr(di, method)(xy, fill=color, **kw)
        getattr(dl, method)(xy, fill=label, **kw)

    cx, cy = 256 * s, 260 * s
    rx = 120 * attrs["face_w"] * s
    ry = 150 * attrs["face_h"] * s
    skin = attrs["skin"]
    darker = tuple(max(0, int(c * 0.78)) for c in skin)
    hair = _HAIR_COLORS[attrs["hair_color"]]

    # neck + cloth (bottom-up painting order)
    both("rectangle", [cx - 45 * s, cy + ry * 0.75, cx + 45 * s, 512 * s],
         darker, L["neck"])
    both("rectangle", [0, 440 * s, 512 * s, 512 * s],
         _CLOTH_COLORS[attrs["cloth"]], L["cloth"])
    if attrs["necklace"]:
        both("arc", [cx - 40 * s, 415 * s, cx + 40 * s, 455 * s],
             (230, 200, 80), L["neck_l"], start=200, end=340,
             width=max(2, int(5 * s)))

    # long hair behind the face
    if attrs["hair_style"] == "long":
        both("ellipse", [cx - rx - 28 * s, cy - ry - 20 * s,
                         cx + rx + 28 * s, cy + ry + 60 * s], hair, L["hair"])

    # ears (before face so the face overlaps their inner half)
    ear_ry = 22 * s
    for side, lbl in ((-1, "l_ear"), (1, "r_ear")):
        ex = cx + side * rx
        both("ellipse", [ex - 14 * s, cy - ear_ry, ex + 14 * s, cy + ear_ry],
             skin, L[lbl])
    # face
    both("ellipse", [cx - rx, cy - ry, cx + rx, cy + ry], skin, L["skin"])

    # hair on top of face
    if attrs["hair_style"] != "bald" and not attrs["hat"]:
        both("chord", [cx - rx * 1.04, cy - ry * 1.12,
                       cx + rx * 1.04, cy + ry * 0.4], hair, L["hair"],
             start=180, end=360)
    if attrs["hat"]:
        both("chord", [cx - rx * 1.1, cy - ry * 1.25,
                       cx + rx * 1.1, cy + ry * 0.28],
             _CLOTH_COLORS[rng.choice(list(_CLOTH_COLORS))], L["hat"],
             start=180, end=360)
        both("rectangle", [cx - rx * 1.18, cy - ry * 0.55,
                           cx + rx * 1.18, cy - ry * 0.38],
             (60, 50, 45), L["hat"])

    # eyes / brows
    eye_y = cy - ry * 0.18
    eye_dx = rx * 0.42
    er = 16 * s
    iris = _EYE_COLORS[attrs["eye_color"]]
    for side, lbl, blbl in ((-1, "l_eye", "l_brow"), (1, "r_eye", "r_brow")):
        ex = cx + side * eye_dx
        both("ellipse", [ex - er, eye_y - er * 0.7, ex + er, eye_y + er * 0.7],
             (250, 250, 250), L[lbl])
        both("ellipse", [ex - er * 0.45, eye_y - er * 0.5,
                         ex + er * 0.45, eye_y + er * 0.5], iris, L[lbl])
        di.ellipse([ex - er * 0.18, eye_y - er * 0.22,
                    ex + er * 0.18, eye_y + er * 0.22], fill=(10, 10, 10))
        both("rectangle", [ex - er * 1.1, eye_y - er * 1.9,
                           ex + er * 1.1, eye_y - er * 1.3], hair, L[blbl])
    if attrs["glasses"]:
        gw = max(2, int(5 * s))
        for side in (-1, 1):
            ex = cx + side * eye_dx
            di.ellipse([ex - er * 1.5, eye_y - er * 1.3,
                        ex + er * 1.5, eye_y + er * 1.3],
                       outline=(20, 20, 20), width=gw)
            dl.ellipse([ex - er * 1.5, eye_y - er * 1.3,
                        ex + er * 1.5, eye_y + er * 1.3],
                       outline=L["eye_g"], width=gw)
        both("rectangle", [cx - er * 0.6, eye_y - gw, cx + er * 0.6, eye_y],
             (20, 20, 20), L["eye_g"])

    # earrings (after face/hair so they stay visible)
    if attrs["earrings"]:
        for side in (-1, 1):
            ex = cx + side * rx
            both("ellipse", [ex - 6 * s, cy + ear_ry, ex + 6 * s,
                             cy + ear_ry + 12 * s], (235, 205, 90), L["ear_r"])

    # nose
    both("polygon", [(cx, cy - 8 * s), (cx - 13 * s, cy + ry * 0.22),
                     (cx + 13 * s, cy + ry * 0.22)], darker, L["nose"])

    # mouth: u_lip / l_lip arcs (+ open mouth when smiling)
    mouth_y = cy + ry * 0.48
    mw = rx * 0.45
    lip = tuple(min(255, int(c * 0.6 + 70)) for c in (200, 60, 70))
    if attrs["smiling"]:
        both("chord", [cx - mw, mouth_y - 14 * s, cx + mw, mouth_y + 26 * s],
             (60, 20, 25), L["mouth"], start=0, end=180)
        both("rectangle", [cx - mw, mouth_y - 8 * s, cx + mw, mouth_y],
             lip, L["u_lip"])
        both("chord", [cx - mw, mouth_y + 6 * s, cx + mw, mouth_y + 34 * s],
             lip, L["l_lip"], start=0, end=180)
    else:
        both("rectangle", [cx - mw, mouth_y - 7 * s, cx + mw, mouth_y],
             lip, L["u_lip"])
        both("rectangle", [cx - mw, mouth_y, cx + mw, mouth_y + 7 * s],
             tuple(int(c * 0.85) for c in lip), L["l_lip"])

    return img, lab


def _captions(attrs: dict) -> list[str]:
    hair = (f"{attrs['hair_color']} hair" if attrs["hair_style"] != "bald"
            else "no hair")
    bits = []
    if attrs["glasses"]:
        bits.append("wearing glasses")
    if attrs["hat"]:
        bits.append("wearing a hat")
    if attrs["earrings"]:
        bits.append("wearing earrings")
    if attrs["necklace"]:
        bits.append("wearing a necklace")
    mood = "smiling" if attrs["smiling"] else "not smiling"
    style = ("" if attrs["hair_style"] == "bald"
             else f"{attrs['hair_style']} ")
    face = "A smiling face" if attrs["smiling"] else "A face"
    lines = [
        f"This person has {style}{hair} and {attrs['eye_color']} eyes.",
        f"{face} with {hair}" + (", " + " and ".join(bits) if bits
                                 else "") + ".",
        f"The person is {mood} and wears {attrs['cloth']} clothes.",
    ]
    if bits:
        lines.append("This person is " + " and ".join(bits) + ".")
    return lines


def make_faces(root: str, count: int, im_size: int, seed: int) -> None:
    rng = random.Random(seed)
    img_dir = os.path.join(root, "CelebA-HQ-img")
    mask_dir = os.path.join(root, "CelebAMask-HQ-mask")
    cap_dir = os.path.join(root, "celeba-caption")
    for d in (img_dir, mask_dir, cap_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(count):
        attrs = _sample_attrs(rng)
        img, lab = _draw_face(attrs, rng, canvas=512)
        img.resize((im_size, im_size), Image.BILINEAR).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=92)
        lab.save(os.path.join(mask_dir, f"{i}.png"))
        with open(os.path.join(cap_dir, f"{i}.txt"), "w") as f:
            f.write("\n".join(_captions(attrs)) + "\n")
        if (i + 1) % 500 == 0:
            print(f"faces: {i + 1}/{count}")
    print(f"faces: wrote {count} image/mask/caption triplets under {root}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pm = sub.add_parser("mnist")
    pm.add_argument("--root", default="data/mnist")
    pm.add_argument("--per-class-train", type=int, default=1200)
    pm.add_argument("--per-class-test", type=int, default=200)
    pm.add_argument("--seed", type=int, default=1111)
    pf = sub.add_parser("faces")
    pf.add_argument("--root", default="data/synthface")
    pf.add_argument("--count", type=int, default=3000)
    pf.add_argument("--im-size", type=int, default=128)
    pf.add_argument("--seed", type=int, default=1111)
    args = p.parse_args()
    if args.cmd == "mnist":
        make_mnist(args.root, args.per_class_train, args.per_class_test,
                   args.seed)
    else:
        make_faces(args.root, args.count, args.im_size, args.seed)


if __name__ == "__main__":
    main()
