"""End-to-end multi-chip training-step correctness on the virtual mesh.

Runs the driver's ``dryrun_multichip`` (the production ``assemble()``
path: mll + blocked/vmapped SLQ + adaptive PCG + pivoted-Cholesky
preconditioner, sharded via ``sharded_gram_policy`` under shard_map)
on the 8-virtual-device CPU mesh and asserts the sharded loss value and
full hyperparameter gradient allclose against the identical step
assembled without a mesh -- the test-oracle pattern of SURVEY.md section 4
applied to the whole multi-chip flagship path, not just the policy.
"""

import importlib.util
import os

import jax
import pytest


def _load_graft_entry():
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "__graft_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_multichip_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh (tests/conftest.py)")
    graft = _load_graft_entry()
    # Raises np.testing assertion errors on value/gradient divergence.
    graft.dryrun_multichip(8)
