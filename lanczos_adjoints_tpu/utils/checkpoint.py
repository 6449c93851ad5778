"""Training checkpoint/resume.

The reference has no checkpointing (SURVEY.md 5.4: training scripts run
to completion; "checkpoint" there means gradient rematerialisation).
For production training this module adds crash-safe save/resume of
arbitrary pytrees (parameters, optimiser state, epoch counters, PRNG
keys) using orbax when available and a numpy fallback otherwise.
"""

import os
import pickle

import jax
import numpy as np


def save(directory: str, step: int, state) -> str:
    """Save a pytree checkpoint; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    try:
        import orbax.checkpoint as ocp

        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(os.path.abspath(path), jax.device_get(state), force=True)
    except Exception:  # noqa: BLE001  orbax absent or incompatible
        leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "leaves.npz"), *[np.asarray(x) for x in leaves])
        with open(os.path.join(path, "treedef.pkl"), "wb") as fp:
            pickle.dump(treedef, fp)
    _write_latest(directory, step)
    return path


def restore(directory: str, state_like):
    """Restore the latest checkpoint, or return ``(None, -1)`` if absent.

    ``state_like`` provides the pytree structure (and, for orbax,
    shape/dtype targets).
    """
    step = latest_step(directory)
    if step < 0:
        return None, -1
    path = os.path.join(directory, f"ckpt_{step:08d}")
    try:
        import orbax.checkpoint as ocp

        checkpointer = ocp.PyTreeCheckpointer()
        restored = checkpointer.restore(
            os.path.abspath(path), item=jax.device_get(state_like)
        )
    except Exception:  # noqa: BLE001
        with open(os.path.join(path, "treedef.pkl"), "rb") as fp:
            treedef = pickle.load(fp)
        archive = np.load(os.path.join(path, "leaves.npz"))
        leaves = [archive[k] for k in archive.files]
        restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored, step


def latest_step(directory: str) -> int:
    marker = os.path.join(directory, "LATEST")
    if not os.path.exists(marker):
        return -1
    with open(marker) as fp:
        return int(fp.read().strip())


def _write_latest(directory: str, step: int):
    tmp = os.path.join(directory, "LATEST.tmp")
    with open(tmp, "w") as fp:
        fp.write(str(step))
    os.replace(tmp, os.path.join(directory, "LATEST"))
