"""Guard the driver interface: __graft_entry__.entry() must jit-compile and
run single-device, and dryrun_multichip must execute a distributed BA step on
the virtual 8-device mesh."""

import importlib.util
from pathlib import Path

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    path = Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGraftEntry:
    def test_entry_compiles_and_runs(self, graft):
        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        t, R, tracked = out
        assert np.asarray(t).shape == (3,)
        assert np.asarray(R).shape == (3, 3)
        assert np.isfinite(np.asarray(t)).all()

    def test_dryrun_multichip_8(self, graft, capsys):
        graft.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip OK" in out
