"""Driver entry points: entry() must be jittable and correct;
dryrun_multichip must run a full sharded training step."""

import numpy as np

import jax

def test_entry_jittable():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    queries, keys = args[0], args[1]
    want = np.searchsorted(np.asarray(keys), np.asarray(queries))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
