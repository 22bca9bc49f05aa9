"""Driver-contract tests: entry() lowers and dryrun_multichip runs on the
8-device CPU mesh (what the driver validates externally).

entry() is LOWERED (traced to StableHLO), not XLA-compiled: the driver
performs the real single-chip compile on TPU, and a full CPU compile of
DiT-12L costs ~2 min of the suite budget for no extra coverage (shape and
trace errors — the failure modes a refactor can introduce — all surface at
lowering). dryrun_multichip stays a real run: its sharded programs are tiny.
"""

import sys

import pytest
import jax


sys.path.insert(0, "/root/repo")


@pytest.mark.slow
class TestGraftEntry:
    def test_entry_lowers_with_expected_shapes(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        lowered = jax.jit(fn).lower(*args)
        out_aval = lowered.out_info
        shape = jax.tree_util.tree_leaves(out_aval)[0].shape
        assert tuple(shape) == tuple(args[0].shape)
        assert "stablehlo" in lowered.as_text()[:4096].lower() or \
            "module" in lowered.as_text()[:64]

    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "ok" in capsys.readouterr().out

    def test_dryrun_multichip_4(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)
