"""FID evaluation: feature statistics, Frechet distance, stats caching.

Re-implements reference fid_evaluation.py (155 LoC): InceptionV3 pool
features at 299^2 bilinear (reference: :99-107), mu/Sigma +
calculate_frechet_distance, and dataset-stats caching to npz
(reference: :134-143).

Feature extractor: the reference uses torchvision InceptionV3 with
fc -> Identity. This zero-egress image has neither torchvision nor
pretrained weights, so the extractor is pluggable:
  * ``TorchInceptionExtractor`` — used automatically when torchvision +
    weights are available (production FID, numerically comparable to the
    reference protocol)
  * ``RandomConvExtractor`` — deterministic random-init conv features
    (relative comparisons within this framework only; NOT comparable to
    published FID numbers — a warning says so)
"""

from __future__ import annotations

import logging
import os
from typing import Iterable, Optional, Tuple

import numpy as np

log = logging.getLogger("sdtpu")

FEATURE_DIM = 2048
INCEPTION_SIZE = 299


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """FID = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (the
    pytorch_fid formula the reference calls, fid_evaluation.py:120-133)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def save_statistics(path: str, mu, sigma) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, mu=mu, sigma=sigma)


def load_statistics(path: str):
    with np.load(path) as d:
        return d["mu"], d["sigma"]


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------

class RandomConvExtractor:
    """Deterministic random-projection conv features (fallback).

    A fixed 4-stage strided conv net with fixed random weights followed by
    global average pooling to FEATURE_DIM. Stable across runs (seeded), so
    relative FID comparisons within this framework are meaningful; absolute
    values are NOT comparable to InceptionV3 FID.
    """

    def __init__(self, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from flax import nnx

        log.warning(
            "FID: using deterministic random-conv features (no InceptionV3 "
            "weights in this environment). Values are comparable only "
            "within this framework.")

        class _Net(nnx.Module):
            def __init__(self, rngs):
                chans = [3, 64, 128, 256, FEATURE_DIM // 4]
                self.convs = nnx.List([
                    nnx.Conv(chans[i], chans[i + 1], kernel_size=(3, 3),
                             strides=(2, 2), padding="SAME", rngs=rngs)
                    for i in range(4)
                ])

            def __call__(self, x):
                for c in self.convs:
                    x = nnx.gelu(c(x))
                avg = jnp.mean(x, axis=(1, 2))
                mx = jnp.max(x, axis=(1, 2))
                sd = jnp.std(x, axis=(1, 2))
                q = jnp.mean(jnp.abs(x), axis=(1, 2))
                return jnp.concatenate([avg, mx, sd, q], axis=-1)

        net = _Net(nnx.Rngs(seed))
        graphdef, state = nnx.split(net)
        self._fn = jax.jit(
            lambda s, x: nnx.merge(graphdef, s)(x))
        self._state = state
        self._jnp = jnp

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        """images01: (B, H, W, 3) float in [0, 1] -> (B, 2048)."""
        import jax

        x = self._jnp.asarray(images01) * 2.0 - 1.0
        x = jax.image.resize(
            x, (x.shape[0], INCEPTION_SIZE, INCEPTION_SIZE, 3), "bilinear")
        return np.asarray(self._fn(self._state, x))


class TorchInceptionExtractor:
    """torchvision InceptionV3 pool features (the reference protocol,
    fid_evaluation.py:99-107) — requires torchvision + weights."""

    def __init__(self, weights_path: Optional[str] = None):
        import torch
        import torchvision

        model = torchvision.models.inception_v3(weights=None, aux_logits=True)
        if weights_path:
            state = torch.load(weights_path, map_location="cpu",
                               weights_only=True)
            model.load_state_dict(state)
        model.fc = torch.nn.Identity()
        model.eval()
        self.model = model
        self.torch = torch

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        torch = self.torch
        x = torch.from_numpy(np.ascontiguousarray(
            images01.transpose(0, 3, 1, 2))).float()
        x = torch.nn.functional.interpolate(
            x, size=(INCEPTION_SIZE, INCEPTION_SIZE), mode="bilinear",
            align_corners=False)
        x = (x - 0.5) / 0.5
        with torch.no_grad():
            return self.model(x).numpy()


def default_extractor(weights_path: Optional[str] = None):
    try:
        return TorchInceptionExtractor(weights_path)
    except Exception:
        return RandomConvExtractor()


# ---------------------------------------------------------------------------
# FID driver (reference: fid_evaluation.py main flow)
# ---------------------------------------------------------------------------

def features_for_images(image_iter: Iterable[np.ndarray], extractor,
                        batch_size: int = 32) -> np.ndarray:
    feats, batch = [], []
    for im in image_iter:
        batch.append(im)
        if len(batch) == batch_size:
            feats.append(extractor(np.stack(batch)))
            batch = []
    if batch:
        feats.append(extractor(np.stack(batch)))
    return np.concatenate(feats) if feats else np.zeros((0, FEATURE_DIM))


def compute_fid(real_images: Iterable[np.ndarray],
                fake_images: Iterable[np.ndarray],
                extractor=None, stats_cache: Optional[str] = None,
                batch_size: int = 32) -> float:
    """FID between two image sets ((H, W, 3) float [0,1] each). When
    ``stats_cache`` exists, the real-set statistics load from it; otherwise
    they are computed and cached (reference: fid_evaluation.py:134-143)."""
    extractor = extractor or default_extractor()
    if stats_cache and os.path.exists(stats_cache):
        mu_r, sigma_r = load_statistics(stats_cache)
    else:
        feats_r = features_for_images(real_images, extractor, batch_size)
        mu_r, sigma_r = compute_statistics(feats_r)
        if stats_cache:
            save_statistics(stats_cache, mu_r, sigma_r)
    feats_f = features_for_images(fake_images, extractor, batch_size)
    mu_f, sigma_f = compute_statistics(feats_f)
    return calculate_frechet_distance(mu_r, sigma_r, mu_f, sigma_f)
