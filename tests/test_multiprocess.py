"""Multi-process distributed launch (parallel/multiprocess.py): 2 real CPU
processes rendezvous via jax.distributed.initialize on a localhost
coordinator, run one all-reduced LDM train step on per-process loader
shards, and must agree with each other and with the single-process result.

The executable counterpart of the reference's mp.spawn + MASTER_ADDR/PORT
DDP launch (train_ddpm_cond_celebhq_multi_gpu.py:439-466) — which the
reference itself never had a test for (SURVEY.md §4).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # PYTHONPATH must NOT inherit /root/.axon_site: its sitecustomize
    # initializes the jax backend at interpreter start, before the worker's
    # jax.distributed.initialize — the world would stay single-process
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORM_NAME", None)
    return env


def _launch(num_processes: int, process_id: int, port: int, out: str,
            env: dict) -> subprocess.Popen:
    cmd = [sys.executable, "-m",
           "stablediffusion_pytorch_tpu.parallel.multiprocess",
           "--num-processes", str(num_processes),
           "--process-id", str(process_id),
           "--coordinator", f"localhost:{port}",
           "--batch", "8", "--seed", "0", "--out", out]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


@pytest.mark.slow
def test_two_process_all_reduce_matches_single(tmp_path):
    env = _worker_env()
    port = _free_port()

    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [_launch(2, i, port, outs[i], env) for i in range(2)]
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (
            f"rank {i} failed\nstdout:{stdout}\nstderr:{stderr[-3000:]}")

    results = [json.load(open(o)) for o in outs]
    assert all(r["global_devices"] == 2 for r in results)

    # both ranks computed the same (all-reduced) loss and updated params
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-7)
    assert results[0]["param_fingerprint"] == pytest.approx(
        results[1]["param_fingerprint"], rel=1e-7)

    # single-process reference on the full batch — separate process so its
    # jax runtime is configured identically (1 fresh CPU device world)
    ref_env = _worker_env()
    ref_out = str(tmp_path / "single.json")
    p = _launch(1, 0, _free_port(), ref_out, ref_env)
    stdout, stderr = p.communicate(timeout=300)
    assert p.returncode == 0, f"single-process run failed\n{stderr[-3000:]}"
    single = json.load(open(ref_out))

    assert single["loss"] == pytest.approx(results[0]["loss"], rel=1e-5)
    assert single["grad_norm"] == pytest.approx(
        results[0]["grad_norm"], rel=1e-4)
    assert single["param_fingerprint"] == pytest.approx(
        results[0]["param_fingerprint"], rel=1e-6)
