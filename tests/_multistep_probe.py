"""Child-process probe for the scan-carried multi-step trainer.

Compiling the multi-step nnx.scan program (model + optimizer riding the
carry) intermittently SEGFAULTS XLA:CPU when it runs late in a full-suite
process that has already compiled hundreds of programs (observed at
jax 0.8 `backend_compile_and_load`; standalone it always passes). The
suite therefore executes these scenarios in a fresh interpreter — this
script — and asserts on its exit code, which also keeps the flaky compile
out of the persistent compilation cache.

Usage: python tests/_multistep_probe.py {base|cond}
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main(scenario: str) -> None:
    from flax import nnx

    from stablediffusion_pytorch_tpu.models import Unet
    from stablediffusion_pytorch_tpu.schedulers import (
        make_compvis_linear_schedule,
    )
    from stablediffusion_pytorch_tpu.training import LdmTrainer
    from tests.test_models import COND_CFG, TINY_UNET

    cond_mode = scenario == "cond"
    cfg = dict(TINY_UNET, condition_config=COND_CFG) if cond_mode \
        else TINY_UNET
    model = Unet(4, cfg, rngs=nnx.Rngs(0))
    sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
    tr = LdmTrainer(model, sched, lr=1e-3,
                    condition_config=COND_CFG if cond_mode else None,
                    empty_text_embed=jnp.zeros((1, 7, 24)) if cond_mode
                    else None)

    if cond_mode:
        S, B = 2, 2
        stack = jax.random.normal(jax.random.PRNGKey(0), (S, B, 16, 16, 4))
        cond = {
            "class": jnp.tile(jax.nn.one_hot(jnp.array([1, 2]), 10)[None],
                              (S, 1, 1)),
            "text": jnp.ones((S, B, 7, 24)),
            "image": jnp.ones((S, B, 64, 64, 18)),
        }
        losses = tr.train_multi_step(stack, cond, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(losses)).all()
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4)) * 0.1
        stack = jnp.tile(x[None], (15, 1, 1, 1, 1))
        l1 = tr.train_multi_step(stack, None, jax.random.PRNGKey(1))
        l2 = tr.train_multi_step(stack, None, jax.random.PRNGKey(2))
        assert l1.shape == (15,)
        assert float(l2[-1]) < float(l1[0]) * 0.9, "updates must persist"
        m = tr.train_step(stack[0], None, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"]))
    print(f"multistep-probe {scenario}: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "base")
