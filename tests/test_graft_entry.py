"""__graft_entry__ contract: entry() must stay jittable and
dryrun_multichip must execute on a virtual multi-device mesh — these are
the driver's compile checks; breaking them breaks the round."""
import jax
import numpy as np


def test_entry_jittable():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    vals, gids = np.asarray(out[0]), np.asarray(out[1])
    assert vals.shape == gids.shape == (8, 10)
    assert (vals[:, 0] > 0).all()  # self-queries must match something


def test_dryrun_multichip_virtual():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
