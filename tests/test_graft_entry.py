"""Guard the driver entry points (__graft_entry__) against API drift."""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
