"""Checkpoint save/restore round-trips pytrees."""

import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.utils import checkpoint


def test_save_restore_roundtrip(tmp_path):
    state = {
        "params": jnp.arange(5.0),
        "opt": (jnp.ones((2, 2)), 3),
        "epoch": 7,
    }
    d = str(tmp_path / "ckpts")
    assert checkpoint.latest_step(d) == -1
    restored, step = checkpoint.restore(d, state)
    assert restored is None and step == -1

    checkpoint.save(d, 3, state)
    checkpoint.save(d, 9, state)
    assert checkpoint.latest_step(d) == 9

    restored, step = checkpoint.restore(d, state)
    assert step == 9
    np.testing.assert_allclose(np.asarray(restored["params"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["opt"][0]), np.ones((2, 2)))
