"""Row-partitioned DIA matvec as a Pallas kernel with RDMA halo overlap.

``parallel.sharded.sharded_dia_operator`` exchanges halos with
``jax.lax.ppermute`` *before* the local stencil work starts: XLA
schedules the collective and the FMA sequentially.  This kernel is the
BASELINE north-star formulation: each device

1. fires ``pltpu.make_async_remote_copy`` RDMAs of its boundary rows to
   both ring neighbours (ICI traffic),
2. computes the full local circular-roll accumulation while the copies
   are in flight (every output row whose stencil stays on-device is
   final after this step), and
3. waits on its receive semaphores and recomputes only the top/bottom
   ``halo`` rows from the received neighbour data.

The overlap window is the whole local FMA sweep -- O(num_diags * n/P)
VPU work against O(halo) ICI bytes -- so the exchange is hidden
whenever local work exceeds a one-hop ICI latency (the analytical model
in ``experiments/benchmarks/multihost_scaling`` quantifies the
crossover).

Semantics match ``sharded.sharded_dia_operator`` exactly: the ring is
circular and global wraparound contributions are killed by the zero
padding in the DIA values, reproducing single-device ``jnp.roll``
behaviour.  There is no single-device reference counterpart (the
reference is single-GPU; SURVEY.md §2.4).

Differentiation: registered as a ``jax.custom_vjp`` for *symmetric*
DIA operators (the Lanczos/CG/SLQ use cases): the cotangent matvec
reuses the forward kernel; the value gradient ``dvals[k] = u * v[.+d]``
runs through a plain ppermute halo (parameter gradients are not the
hot path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from lanczos_adjoints_tpu.ops.pallas_lanczos import LANES, _flat_roll

_SUBLANES = 8


def _halo_rows(halo: int) -> int:
    """Halo row count: ceil(halo/128) rounded up to the sublane multiple."""
    rows = -(-halo // LANES)
    return -(-rows // _SUBLANES) * _SUBLANES


def _halo_kernel(
    offsets,
    hr,
    axis,
    v_ref,
    vals_ref,
    out_ref,
    recv_l,
    recv_r,
    ext_top,
    ext_bot,
    send_sem,
    recv_sem,
):
    rows = v_ref.shape[0]
    hp = hr * LANES

    my = jax.lax.axis_index(axis)
    ndev = jax.lax.axis_size(axis)
    left = jax.lax.rem(my - 1 + ndev, ndev)
    right = jax.lax.rem(my + 1, ndev)

    # Neighbour barrier: no RDMA may land before the remote kernel has
    # started (its receive buffers exist for the whole kernel, but the
    # barrier also keeps successive invocations' semaphores in step).
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_wait(barrier, 2)

    # My tail rows -> right neighbour's left-halo buffer; my head rows
    # -> left neighbour's right-halo buffer.
    rdma_right = pltpu.make_async_remote_copy(
        src_ref=v_ref.at[pl.ds(rows - hr, hr)],
        dst_ref=recv_l,
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_right.start()
    rdma_left = pltpu.make_async_remote_copy(
        src_ref=v_ref.at[pl.ds(0, hr)],
        dst_ref=recv_r,
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_left.start()

    # Overlap window: the full local circular accumulation.  Rows whose
    # stencil stays on-device are final; the top/bottom ``hr`` rows see
    # locally-wrapped values and are overwritten after the waits.
    v = v_ref[:]
    acc = jnp.zeros_like(v)
    for k, d in enumerate(offsets):
        acc = acc + vals_ref[k] * _flat_roll(v, d, rows)
    out_ref[:] = acc

    # rdma_right.wait() waits my send (slot 0) and my *left* inbound
    # (slot 0: every device's rdma_right lands in its right neighbour's
    # recv_l) -- SPMD symmetry pairs the semaphores correctly.
    rdma_right.wait()
    rdma_left.wait()

    # Edge fix-up: extended tiles [neighbour halo; local rows].
    ext_top[0:hr] = recv_l[:]
    ext_top[hr : 3 * hr] = v_ref[0 : 2 * hr]
    top = ext_top[:]
    acc_top = jnp.zeros_like(recv_l[:])
    for k, d in enumerate(offsets):
        rolled = _flat_roll(top, hp + d, 3 * hr)
        acc_top = acc_top + vals_ref[k, 0:hr] * rolled[0:hr]
    out_ref[0:hr] = acc_top

    ext_bot[0 : 2 * hr] = v_ref[rows - 2 * hr : rows]
    ext_bot[2 * hr : 3 * hr] = recv_r[:]
    bot = ext_bot[:]
    acc_bot = jnp.zeros_like(recv_r[:])
    for k, d in enumerate(offsets):
        rolled = _flat_roll(bot, hp + d, 3 * hr)
        acc_bot = acc_bot + vals_ref[k, rows - hr : rows] * rolled[0:hr]
    out_ref[rows - hr : rows] = acc_bot


def sharded_dia_operator_pallas(
    dia,
    mesh: Mesh,
    *,
    axis: str = "rows",
    interpret: bool = False,
    collective_id: int = 7,
):
    """Halo-overlap DIA matvec ``matvec(v, vals)`` over a 1-D mesh.

    Same calling convention as ``sharded.sharded_dia_operator``: ``v``
    row-sharded ``(n,)``, ``vals`` the ``(num_diags, n)`` DIA values
    sharded along positions; output row-sharded.  The operator pattern
    must be symmetric (offsets closed under negation) for gradients.
    """
    offsets = tuple(int(d) for d in dia.offsets)
    halo = max(1, max(abs(d) for d in offsets))
    n = dia.shape[0]
    n_dev = mesh.shape[axis]
    if n % (n_dev * LANES * _SUBLANES) != 0:
        msg = (
            f"n={n} must divide into {n_dev} x {LANES * _SUBLANES}-element"
            " row tiles for the fused halo kernel"
        )
        raise ValueError(msg)
    local_n = n // n_dev
    rows = local_n // LANES
    hr = _halo_rows(halo)
    if rows < 2 * hr:
        msg = f"halo rows {hr} need local rows >= {2 * hr}, got {rows}"
        raise ValueError(msg)

    kernel = functools.partial(_halo_kernel, offsets, hr, axis)
    interpret_params = (
        pltpu.InterpretParams(dma_execution_mode="on_wait") if interpret else False
    )

    def local_matvec(v, vals):
        v2d = v.reshape(rows, LANES)
        vals2d = vals.reshape(len(offsets), rows, LANES)
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), v.dtype),
            scratch_shapes=[
                pltpu.VMEM((hr, LANES), jnp.float32),
                pltpu.VMEM((hr, LANES), jnp.float32),
                pltpu.VMEM((3 * hr, LANES), jnp.float32),
                pltpu.VMEM((3 * hr, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=collective_id,
            ),
            interpret=interpret_params,
        )(v2d, vals2d)
        return out.reshape(-1)

    smapped = jax.shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    # Parameter-gradient helper: dvals[k] = u * v[. + d_k] needs the
    # same halo of v; a plain ppermute exchange is fine off the hot path.
    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def _local_shift_products(u, v):
        from_left = jax.lax.ppermute(v[-halo:], axis, right_perm)
        from_right = jax.lax.ppermute(v[:halo], axis, left_perm)
        v_ext = jnp.concatenate([from_left, v, from_right])
        rowsets = [
            u * jax.lax.dynamic_slice(v_ext, (halo + d,), (local_n,))
            for d in offsets
        ]
        return jnp.stack(rowsets)

    shift_products = jax.shard_map(
        _local_shift_products,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(None, axis),
    )

    @jax.custom_vjp
    def matvec(v, vals):
        return smapped(v, vals)

    def matvec_fwd(v, vals):
        return smapped(v, vals), (v, vals)

    def matvec_bwd(cache, u):
        v, vals = cache
        dv = smapped(u, vals)  # symmetric pattern: A^T u = A u
        dvals = shift_products(u, v)
        return dv, dvals

    matvec.defvjp(matvec_fwd, matvec_bwd)
    return matvec
