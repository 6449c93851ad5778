"""Row-partitioned operators over a ``jax.sharding.Mesh``.

The reference is strictly single-device (SURVEY.md 2.4); this layer is
the new TPU-native scope: the quadratic-cost object (N x N operator) is
row-partitioned across chips, and the O(N)-cost Krylov recurrences run
replicated on top of distributed matvecs.

Design
------
Each factory returns a matvec closure ``(v, *params) -> Av`` where ``v``
is replicated and the operator parameters are row-sharded.  Inside, a
``jax.shard_map`` computes the local row block and either

- ``all_gather``s nothing at all (dense/Gram: every device already holds
  replicated ``v`` and its own row block -- zero-communication forward,
  output assembled by an implicit all-gather of row blocks), or
- exchanges *halos* with ring neighbours via ``jax.lax.ppermute``
  (DIA stencils: each device only needs ``max|offset|`` entries from its
  neighbours; the circular ppermute exactly reproduces the single-device
  roll semantics, including the zero-padded wraparound).

Because the closure signature is unchanged, every layer above
(``krylov``, ``solvers``, ``trace``, ``models``) distributes without
modification; inner products run on replicated vectors so no psum
plumbing leaks upward.  Scaling efficiency is governed by the matvec
(the O(nnz/P) term); the replicated axpy/dot work is O(n) per device.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: int | None = None, *, axis: str = "rows") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def shard_rows(array, mesh: Mesh, *, axis: str = "rows", dim: int = 0):
    """Place ``array`` with its ``dim`` axis sharded over the mesh."""
    spec = [None] * array.ndim
    spec[dim] = axis
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def replicate(array, mesh: Mesh):
    """Place ``array`` replicated over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P()))


def sharded_dense_operator(mesh: Mesh, *, axis: str = "rows") -> Callable:
    """Row-partitioned dense matvec: ``matvec(v, matrix)``.

    ``matrix`` is sharded along rows; ``v`` replicated.  The local block
    matmul needs no communication; the row-block outputs concatenate into
    the (replicated) result via the closing all-gather that shard_map's
    ``out_specs=P(axis)`` + downstream replication implies.
    """

    def local_matvec(v, block):
        return jnp.matmul(block, v, precision="highest")

    smapped = jax.shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis),
    )

    def matvec(v, matrix):
        return smapped(v, matrix)

    return matvec


def sharded_dia_operator(dia, mesh: Mesh, *, axis: str = "rows") -> Callable:
    """Row-partitioned DIA (stencil/banded) matvec with ring halo exchange.

    ``vals`` is the ``(num_diags, n)`` DIA value array sharded along its
    position axis; ``v`` is row-sharded too.  Each device fetches a halo
    of ``max|offset|`` entries from each ring neighbour with
    ``jax.lax.ppermute`` -- O(halo) communication instead of O(n) --
    then performs the shifted multiply-adds locally.  Output is
    row-sharded (same layout as ``v``), so Krylov recurrences can run
    fully sharded with psum-reduced inner products, or the caller can
    re-replicate.

    The circular ppermute reproduces ``jnp.roll`` wraparound; wrapped
    contributions are killed by the zero padding in the DIA values, so
    results match the single-device operator bit-for-bit in structure.
    """
    offsets = dia.offsets
    halo = max(1, max(abs(int(d)) for d in offsets))
    n = dia.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        msg = f"n={n} must divide evenly over {n_dev} devices"
        raise ValueError(msg)
    local_n = n // n_dev
    if halo > local_n:
        msg = f"halo {halo} exceeds local rows {local_n}; use fewer devices"
        raise ValueError(msg)

    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_matvec(v, vals):
        # v: (local_n,) this device's segment. Receive the tail of the
        # left neighbour and the head of the right neighbour.
        from_left = jax.lax.ppermute(v[-halo:], axis, right_perm)
        from_right = jax.lax.ppermute(v[:halo], axis, left_perm)
        v_ext = jnp.concatenate([from_left, v, from_right])
        out = jnp.zeros_like(v)
        for k, d in enumerate(offsets):
            out = out + vals[k] * jax.lax.dynamic_slice(
                v_ext, (halo + d,), (local_n,)
            )
        return out

    return jax.shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(axis),
    )


def sharded_gram_policy(
    base_policy: Callable, mesh: Mesh, *, axis: str = "rows"
) -> Callable:
    """Lift a Gram-matvec execution *policy* onto a row-sharded mesh.

    ``base_policy`` is any of the single-device execution policies from
    ``ops.gram`` (``gram_matvec()``, ``gram_matvec_partitioned(...)``,
    ``gram_matvec_pallas()``); the returned policy has the identical
    calling convention ``policy(fun)(i, j, v)``, so it drops into
    ``models.gp.likelihood_pdf_p`` (and every other likelihood) without
    touching the model layer.  This is the multi-chip formulation of the
    flagship GP training configuration: the row data ``i`` is split over
    the ``axis`` mesh dimension, every device runs the *base* policy
    (including the fused Pallas kernel) on its own row block against the
    replicated column data and RHS, and the row-block outputs assemble
    into the replicated result through shard_map's closing all-gather.

    Communication per matvec is exactly one all-gather of the output
    (``n * 4`` bytes around the ring); the O(n^2 / P) kernel-tile work
    stays local, so efficiency approaches 1 as n grows (measured model:
    ``experiments/benchmarks/multihost_scaling``).

    ``v`` may be ``(n,)`` or an ``(n, m)`` multi-RHS block (blocked SLQ
    probes): both stay replicated; the blocked probes already amortise
    kernel evaluations *within* each device, so only rows are sharded.

    Row counts that do not divide the mesh (e.g. posterior-mean
    evaluation on an odd-sized test set) fall back to the single-device
    base policy -- a static shape decision at trace time.

    No reference counterpart (the reference is single-GPU; closest
    analog is the partitioned matvec, ``gp_util.py:470-522``).
    """
    n_dev = mesh.shape[axis]

    def policy(fun: Callable) -> Callable:
        apply_inner = base_policy(fun)

        def matvec_y(i, j, v):
            if jnp.shape(i)[0] % n_dev != 0:
                return apply_inner(i, j, v)
            smapped = jax.shard_map(
                apply_inner,
                mesh=mesh,
                in_specs=(P(axis), P(), P()),
                out_specs=P(axis),
            )
            return smapped(i, j, v)

        return matvec_y

    return policy


def sharded_gram_matvec(kernel_fun: Callable, mesh: Mesh, *, axis: str = "rows"):
    """Row-partitioned kernel-Gram matvec: ``matvec(x_rows, y, v)``.

    ``x_rows`` (the row data) is sharded; ``y`` and ``v`` replicated.
    Each device computes its row block of ``K(x, y) @ v`` -- the
    N^2-cost object never materialises anywhere and communication is a
    single output all-gather of length N/P per device.
    """
    from lanczos_adjoints_tpu.ops import gram

    dense = gram.gram_matvec()(kernel_fun)

    def local_matvec(x_block, y, v):
        return dense(x_block, y, v)

    return jax.shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
    )
