"""Streaming BSR SpMV as a Pallas TPU kernel.

The matvec ``out = A @ v`` for a block-ELL matrix of (tile_rows, 128)
tiles (``ops.sparse.BSRData``) splits into

1. a 128-lane row gather of the source blocks of ``v``
   (``bsr_gather_vblocks``, XLA; ~855 GB/s measured on v5e -- full
   HBM roofline for this access pattern), and
2. the tile-value stream: every stored tile is read exactly once and
   contracted against its source block.  This kernel streams chunks of
   row blocks through VMEM (double-buffered by the Pallas pipeline) and
   performs the contraction on the VPU -- the MXU is useless here at
   one right-hand side, and the VPU has ~10x headroom over HBM at
   2 flops per loaded float.

Step (2) is what the reference delegates to
``jax.experimental.sparse.BCOO @ x`` on GPU (reference
``exp_util.py:35-42``, ``suite_sparse/benchmark.py:64-68``); XLA:TPU
lowers BCOO to element gathers (~1 GB/s measured), which is why this
path exists.  Throughput is bandwidth-bound on the *stored* tiles, so
effective nnz/s = roofline * fill_efficiency: the (8, 128) tile shape
and an RCM reordering (``ops.sparse.reverse_cuthill_mckee``) exist to
push fill up.

Gradients: registered as a ``jax.custom_vjp``.  For symmetric operators
(the Lanczos/CG/SLQ use cases) the cotangent matvec reuses the same
kernel; the value gradient ``d tiles[n,w,r,c] = u[n,r] * vblk[n,w,c]``
is a pure broadcast write at tile-storage bandwidth.  Non-symmetric
operators fall back to an XLA transpose matvec (block row-scatter-add).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_adjoints_tpu.ops.sparse import (
    BSR_TILE,
    BSRData,
    bsr_gather_vblocks,
)

_TARGET_CHUNK_BYTES = 1 << 20  # tile bytes resident per grid step


def _bsr_kernel(tiles_ref, vg_ref, out_ref):
    vg = vg_ref[...]
    prod = tiles_ref[...] * vg[:, :, None, :]
    out_ref[...] = jnp.sum(prod, axis=(1, 3))


def _chunk(bsr: BSRData) -> int:
    per_block = bsr.width * bsr.tile_rows * BSR_TILE * 4
    # Multiple of 8: the (chunk, tile_rows) output block's sublane dim
    # must be 8-divisible for Mosaic.
    return max(8, _TARGET_CHUNK_BYTES // per_block // 8 * 8)


def bsr_spmv_pallas(bsr: BSRData, *, interpret: bool = False):
    """Raw streaming matvec ``(v, tiles) -> A @ v`` (not differentiable)."""
    n = bsr.shape[0]
    nbr = bsr.padded_n // bsr.tile_rows
    chunk = _chunk(bsr)
    w, tr = bsr.width, bsr.tile_rows

    def matvec(v, tiles):
        vg = bsr_gather_vblocks(bsr, v)
        out = pl.pallas_call(
            _bsr_kernel,
            grid=(pl.cdiv(nbr, chunk),),
            in_specs=[
                pl.BlockSpec(
                    (chunk, w, tr, BSR_TILE),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, w, BSR_TILE),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (chunk, tr), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nbr, tr), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # Only ever RAISE the scoped-vmem limit above the Mosaic
                # default (16 MiB on some terminals): double-buffered
                # tile + gathered-v blocks per grid step.
                vmem_limit_bytes=min(
                    max(
                        4 * chunk * w * (tr + 1) * BSR_TILE * 4 + (1 << 20),
                        64 * 1024 * 1024,
                    ),
                    128 * 1024 * 1024,
                ),
            ),
            interpret=interpret,
        )(tiles, vg)
        return out.reshape(-1)[:n]

    return matvec


def _transpose_matvec_xla(bsr: BSRData):
    """A^T u via per-tile contraction + block row-scatter-add (XLA)."""
    n_r, n_c = bsr.shape

    def matvec_t(u, tiles):
        upad = jnp.pad(u, (0, bsr.padded_n - n_r)) if bsr.padded_n != n_r else u
        u2 = upad.reshape(-1, bsr.tile_rows)
        contrib = jnp.einsum(
            "nwrc,nr->nwc", tiles, u2, precision="highest"
        )  # (nbr, width, 128)
        flat = contrib.reshape(-1, BSR_TILE)
        idx = bsr.block_cols.reshape(-1)
        acc = jnp.zeros((bsr.padded_cols // BSR_TILE, BSR_TILE), jnp.float32)
        acc = acc.at[idx].add(flat)
        return acc.reshape(-1)[:n_c]

    return matvec_t


def bsr_matvec_pallas(bsr: BSRData, *, symmetric: bool, interpret: bool = False):
    """Differentiable streaming matvec ``matvec(v, tiles) -> A @ v``.

    ``symmetric=True`` (the Krylov use case) reuses the forward kernel
    for the cotangent matvec; otherwise the transpose runs through an
    XLA scatter-add fallback.
    """
    fwd = bsr_spmv_pallas(bsr, interpret=interpret)
    trans = fwd if symmetric else _transpose_matvec_xla(bsr)
    n_r = bsr.shape[0]

    @jax.custom_vjp
    def matvec(v, tiles):
        return fwd(v, tiles)

    def matvec_fwd(v, tiles):
        return fwd(v, tiles), (v, tiles)

    def matvec_bwd(cache, u):
        v, tiles = cache
        dv = trans(u, tiles)
        upad = jnp.pad(u, (0, bsr.padded_n - n_r)) if bsr.padded_n != n_r else u
        u2 = upad.reshape(-1, bsr.tile_rows)
        vg = bsr_gather_vblocks(bsr, v)
        dtiles = jnp.einsum("nr,nwc->nwrc", u2, vg, precision="highest")
        return dv, dtiles

    matvec.defvjp(matvec_fwd, matvec_bwd)
    return matvec


def fem_test_matrix(n_grid: int, *, dofs: int = 3, seed: int = 0):
    """Synthetic bcsstk-class stiffness pattern: 3-D hexahedral mesh,
    ``dofs`` unknowns per node, 27-point vertex coupling (~81 nnz/row
    at dofs=3 -- the density class of bcsstk17/18, reference
    ``suite_sparse/benchmark.py:59-68``; those archives are truncated
    in this offline bundle, so the benchmark generates the class).

    Returns a ``CSRMatrix`` (symmetric, diagonally dominant SPD).
    """
    import numpy as np

    from lanczos_adjoints_tpu.ops.sparse import csr_from_coo

    rng = np.random.default_rng(seed)
    g = n_grid
    nodes = g * g * g
    idx = np.arange(nodes).reshape(g, g, g)
    rows, cols = [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                src = idx[
                    max(0, -di) : g - max(0, di),
                    max(0, -dj) : g - max(0, dj),
                    max(0, -dk) : g - max(0, dk),
                ].ravel()
                dst = idx[
                    max(0, di) : g - max(0, -di),
                    max(0, dj) : g - max(0, -dj),
                    max(0, dk) : g - max(0, -dk),
                ].ravel()
                rows.append(src)
                cols.append(dst)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    # Expand to dofs x dofs node blocks.
    r = np.repeat(rows * dofs, dofs * dofs) + np.tile(
        np.repeat(np.arange(dofs), dofs), len(rows)
    )
    c = np.repeat(cols * dofs, dofs * dofs) + np.tile(
        np.tile(np.arange(dofs), dofs), len(cols)
    )
    n = nodes * dofs
    vals = rng.standard_normal(len(r)).astype(np.float32)
    # Symmetrise and make diagonally dominant (SPD).
    key = r * n + c
    key_t = c * n + r
    order = np.argsort(key)
    order_t = np.argsort(key_t)
    vals_sym = 0.5 * (vals[order] + vals[order_t])
    r, c = r[order], c[order]
    mat = csr_from_coo(r, c, vals_sym, shape=(n, n))
    # Add 100 * I for diagonal dominance.
    diag = np.isclose(mat.rows, mat.indices).astype(np.float32) * 100.0
    return mat._replace(data=mat.data + diag)
