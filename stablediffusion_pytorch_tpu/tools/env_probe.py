"""Environment probe: devices, memory, matmul throughput sanity.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.env_probe``

The TPU counterpart of reference test_jetson.py (cuDNN/conv environment
probe with timing): report backend/devices/memory and measure a chained
matmul + conv to confirm the accelerator actually executes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def probe() -> dict:
    info = {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "process_count": jax.process_count(),
    }
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            info["device_memory_limit_gb"] = round(
                stats.get("bytes_limit", 0) / 2**30, 2)
    except Exception:
        pass

    # chained matmul throughput (block_until_ready is unreliable on
    # relay-attached chips — chain + host fetch, see bench.py)
    n, reps = 4096, 8
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a @ b) * (1.0 / n))
    x = f(a, b)
    np.asarray(x[:1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, b)
    np.asarray(x[:1, :1])
    dt = time.perf_counter() - t0
    info["matmul_tflops_bf16"] = round(2 * n**3 * reps / dt / 1e12, 1)

    # conv probe
    img = jax.random.normal(jax.random.PRNGKey(2), (32, 128, 128, 128),
                            jnp.bfloat16)
    ker = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128),
                            jnp.bfloat16)
    conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    y = conv(img, ker)
    np.asarray(y[:1, :1, :1])
    t0 = time.perf_counter()
    yy = img
    for _ in range(reps):
        yy = conv(yy, ker) * 0.1
    np.asarray(yy[:1, :1, :1])
    conv_flops = 2 * 32 * 128 * 128 * 3 * 3 * 128 * 128
    info["conv_tflops_bf16"] = round(
        conv_flops * reps / (time.perf_counter() - t0) / 1e12, 1)
    return info


def main():
    for k, v in probe().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
