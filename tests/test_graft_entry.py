"""Driver-contract tests: entry() compiles and dryrun_multichip runs on the
8-device CPU mesh (what the driver validates externally)."""

import sys

import jax
import numpy as np


sys.path.insert(0, "/root/repo")


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == args[0].shape
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "ok" in capsys.readouterr().out

    def test_dryrun_multichip_4(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)
