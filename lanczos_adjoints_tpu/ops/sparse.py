"""Sparse operators: TPU-native multi-format SpMV engine.

Replaces the reference's ``jax.experimental.sparse.BCOO @ x`` SpMV
(reference exp_util.py:35-42 assembles BCOO; the VJP-wall-time benchmark
multiplies it at suite_sparse/benchmark.py:64-68).

TPU-first design
----------------
TPUs have no fast fine-grained gather/scatter: measured on a v5e, an
XLA element gather sustains ~1 GB/s while contiguous 128-wide row
gathers hit ~855 GB/s (full HBM roofline).  A CSR row loop is therefore
the wrong representation; this module keeps CSR only as the host-side
assembly format and lowers to one of three device layouts:

- ``dia``  -- diagonal (DIA) storage for stencil/banded matrices
              (finite-difference Laplacians, mass matrices, most of the
              reference's SuiteSparse set).  The matvec is a static
              unrolled sum of shifted multiply-adds: zero gathers, zero
              scatters, and the *adjoint* is also closed-form (transpose
              = negated offsets), so forward and VJP both run at VPU /
              HBM speed.
- ``bsr``  -- 128x128 block-sparse rows for clustered (FEM-type)
              matrices, optionally after reverse-Cuthill-McKee
              reordering.  The vector is gathered in whole 128-lane
              tiles (fast path above) and each tile contributes an MXU
              matmul: ``out[i] += tile @ v[block_col]``.
- ``ell``  -- padded ELLPACK with XLA element gathers; correctness
              fallback for pathological patterns.

``sparse_operator`` auto-selects the densest layout whose padding
overhead stays under a threshold and reports speed-of-light accounting
(stored slots vs. true nnz).

The differentiable parameter is the packed value array:
``matvec(v, values)`` with the sparsity pattern closed over, mirroring
how the reference treats BCOO data as the parameter.  For symmetric
operators the gradient w.r.t. ``v`` reuses the forward layout
(``A^T = A``) instead of XLA's scatter-add transpose.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CSRMatrix(NamedTuple):
    """Host-side CSR container (numpy); build device operators from it."""

    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray
    shape: tuple

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    @property
    def rows(self) -> np.ndarray:
        return np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))

    def todense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        np.add.at(out, (self.rows, self.indices), self.data)
        return out

    def is_symmetric(self) -> bool:
        if self.shape[0] != self.shape[1]:
            return False
        a = _coo_key_order(self.rows, self.indices, self.shape)
        b = _coo_key_order(self.indices, self.rows, self.shape)
        return (
            np.array_equal(self.rows[a], self.indices[b])
            and np.array_equal(self.indices[a], self.rows[b])
            and np.allclose(self.data[a], self.data[b])
        )


def _coo_key_order(rows, cols, shape):
    return np.lexsort((cols, rows))


def csr_from_coo(rows, cols, vals, *, shape) -> CSRMatrix:
    """Assemble CSR from COO triplets (duplicates are summed).

    Single-key argsort + ``np.add.reduceat`` + ``np.bincount``: the
    obvious ``np.lexsort``/``np.add.at`` formulation is ~10x slower at
    8M nnz (``ufunc.at`` is unbuffered).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)

    try:
        from scipy.sparse import coo_matrix
    except ImportError:
        pass
    else:
        csr = coo_matrix((vals, (rows, cols)), shape=tuple(shape)).tocsr()
        csr.sort_indices()
        return CSRMatrix(
            indptr=csr.indptr.astype(np.int64),
            indices=csr.indices.astype(np.int64),
            data=csr.data,
            shape=tuple(shape),
        )

    keys = rows * shape[1] + cols
    order = np.argsort(keys, kind="stable")
    keys, rows, cols, vals = keys[order], rows[order], cols[order], vals[order]

    if len(rows) > 1:
        uniq_mask = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.flatnonzero(uniq_mask)
        vals = np.add.reduceat(vals, starts)
        rows, cols = rows[uniq_mask], cols[uniq_mask]

    indptr = np.zeros(shape[0] + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(np.bincount(rows, minlength=shape[0]))
    return CSRMatrix(indptr=indptr, indices=cols, data=vals, shape=tuple(shape))


def csr_from_dense(matrix) -> CSRMatrix:
    matrix = np.asarray(matrix)
    rows, cols = np.nonzero(matrix)
    return csr_from_coo(rows, cols, matrix[rows, cols], shape=matrix.shape)


def reverse_cuthill_mckee(mat: CSRMatrix) -> np.ndarray:
    """RCM permutation (numpy BFS) to cluster a matrix towards a band."""
    n = mat.shape[0]
    degrees = np.diff(mat.indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for start_candidate in np.argsort(degrees):
        if visited[start_candidate]:
            continue
        queue = [int(start_candidate)]
        visited[start_candidate] = True
        while queue:
            node = queue.pop(0)
            order[pos] = node
            pos += 1
            lo, hi = mat.indptr[node], mat.indptr[node + 1]
            nbrs = mat.indices[lo:hi]
            nbrs = nbrs[~visited[nbrs]]
            nbrs = np.unique(nbrs)
            nbrs = nbrs[np.argsort(degrees[nbrs])]
            visited[nbrs] = True
            queue.extend(int(x) for x in nbrs)
    return order[::-1].copy()


def permute_symmetric(mat: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Apply P A P^T for a permutation vector (new[i] = old[perm[i]])."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return csr_from_coo(inv[mat.rows], inv[mat.indices], mat.data, shape=mat.shape)


# ---------------------------------------------------------------------------
# DIA layout
# ---------------------------------------------------------------------------


class DIAData(NamedTuple):
    offsets: tuple  # static python ints, sorted
    shape: tuple
    nnz: int
    # maps CSR entry -> (diag_index, position) for value packing
    diag_of_entry: np.ndarray
    pos_of_entry: np.ndarray

    @property
    def num_slots(self) -> int:
        return len(self.offsets) * self.shape[0]


def dia_analyze(mat: CSRMatrix):
    """Distinct diagonal offsets of the pattern."""
    offs = np.unique(mat.indices - mat.rows)
    return offs


def dia_pack(mat: CSRMatrix) -> DIAData:
    rows = mat.rows
    entry_offsets = mat.indices - rows
    offsets = np.unique(entry_offsets)
    lookup = {int(d): i for i, d in enumerate(offsets)}
    diag_of_entry = np.asarray([lookup[int(d)] for d in entry_offsets])
    return DIAData(
        offsets=tuple(int(d) for d in offsets),
        shape=mat.shape,
        nnz=mat.nnz,
        diag_of_entry=diag_of_entry,
        pos_of_entry=rows,
    )


def dia_values(dia: DIAData, csr_data) -> jax.Array:
    """Pack CSR-ordered values into the (num_diags, n) DIA layout.

    Diagonal d stored row-aligned: slot [k, i] is entry A[i, i + offsets[k]].
    """
    vals = np.zeros((len(dia.offsets), dia.shape[0]), dtype=np.asarray(csr_data).dtype)
    vals[dia.diag_of_entry, dia.pos_of_entry] = np.asarray(csr_data)
    return jnp.asarray(vals)


def dia_matvec_fn(dia: DIAData):
    """Roll-and-FMA matvec; offsets are static so the loop unrolls.

    ``out[i] = sum_k vals[k, i] * v[i + d_k]`` with the out-of-range tail
    handled by circular rolls: padded value slots are exactly zero, so
    wrapped contributions vanish.  Measured ~550 GB/s on a v5e (vs
    ~1 GB/s for an element-gather SpMV); the autodiff transpose is again
    rolls, so the adjoint path is equally fast.
    """
    offsets = dia.offsets

    def matvec(v, vals):
        out = jnp.zeros_like(v)
        for k, d in enumerate(offsets):
            out = out + vals[k] * jnp.roll(v, -d)
        return out

    # Tag the closure so krylov.tridiag can recognise the operator and
    # auto-dispatch to the fused Pallas Lanczos kernel.
    matvec.dia_data = dia
    return matvec


# Note on gradients: the DIA matvec is built from static slices and
# static-slice additions only, so its JAX-autodiff transpose is itself a
# static-slice program (no gathers or scatters) -- the Krylov adjoints'
# ``jax.vjp(matvec)`` calls run at the same HBM-bound speed as the
# forward matvec with no custom rules needed.


# ---------------------------------------------------------------------------
# BSR layout (128x128 tiles, block-ELL padded)
# ---------------------------------------------------------------------------

BSR_TILE = 128  # column tile length (lane dimension)
BSR_TILE_ROWS = 8  # row tile length (sublane dimension)


class BSRData(NamedTuple):
    """Block-ELL storage of (tile_rows, 128) tiles.

    The narrow default row tile matters: at FEM-like densities
    (~80 nnz/row) a 128x128 tile is ~1% filled, so the matvec would
    stream ~100x the nnz bytes; (8, 128) tiles -- the native f32
    register tile -- cut the padding ~10x while keeping every memory
    access a full-lane row.
    """

    block_cols: jax.Array  # (num_row_blocks, width) int32
    scatter_idx: np.ndarray  # CSR entry -> flat index into tile storage
    width: int
    shape: tuple  # original (possibly unpadded) shape
    padded_n: int  # padded row count
    padded_cols: int  # padded column count
    nnz: int
    tile_rows: int

    @property
    def num_slots(self) -> int:
        return (
            int(self.block_cols.shape[0])
            * self.width
            * self.tile_rows
            * BSR_TILE
        )


def bsr_pack(mat: CSRMatrix, *, tile_rows: int = BSR_TILE_ROWS) -> BSRData:
    n_r, n_c = mat.shape
    padded_n = -(-n_r // tile_rows) * tile_rows
    padded_cols = -(-n_c // BSR_TILE) * BSR_TILE
    nbr = padded_n // tile_rows
    ncb = padded_cols // BSR_TILE

    rows, cols = mat.rows, mat.indices
    brow, bcol = rows // tile_rows, cols // BSR_TILE

    # Unique (brow, bcol) tiles, block-ELL padded to uniform width.
    keys = brow * ncb + bcol
    uniq, entry_tile = np.unique(keys, return_inverse=True)
    tile_brow, tile_bcol = uniq // ncb, uniq % ncb
    counts = np.bincount(tile_brow, minlength=nbr)
    width = max(1, int(counts.max()))

    # slot of each unique tile within its row block
    tile_slot = np.zeros(len(uniq), dtype=np.int64)
    seen = np.zeros(nbr, dtype=np.int64)
    order = np.argsort(tile_brow, kind="stable")
    for t in order:
        tile_slot[t] = seen[tile_brow[t]]
        seen[tile_brow[t]] += 1

    block_cols = np.zeros((nbr, width), dtype=np.int32)
    block_cols[tile_brow, tile_slot] = tile_bcol

    flat_tile = tile_brow * width + tile_slot  # flat tile id per unique tile
    r_in, c_in = rows % tile_rows, cols % BSR_TILE
    scatter_idx = (
        flat_tile[entry_tile] * tile_rows * BSR_TILE + r_in * BSR_TILE + c_in
    )
    return BSRData(
        block_cols=jnp.asarray(block_cols),
        scatter_idx=scatter_idx,
        width=width,
        shape=mat.shape,
        padded_n=padded_n,
        padded_cols=padded_cols,
        nnz=mat.nnz,
        tile_rows=tile_rows,
    )


def bsr_values(bsr: BSRData, csr_data) -> jax.Array:
    nbr = bsr.padded_n // bsr.tile_rows
    flat = np.zeros(
        nbr * bsr.width * bsr.tile_rows * BSR_TILE, np.asarray(csr_data).dtype
    )
    flat[bsr.scatter_idx] = np.asarray(csr_data)
    return jnp.asarray(flat.reshape(nbr, bsr.width, bsr.tile_rows, BSR_TILE))


def bsr_gather_vblocks(bsr: BSRData, v):
    """(num_row_blocks, width, 128) source blocks of v for each tile.

    A 128-lane row gather (measured ~855 GB/s on v5e, vs ~1 GB/s for
    element gathers): the only indexed access in the BSR matvec.
    """
    n_c = bsr.shape[1]
    vpad = jnp.pad(v, (0, bsr.padded_cols - n_c)) if bsr.padded_cols != n_c else v
    v2 = vpad.reshape(-1, BSR_TILE)
    gathered = jnp.take(v2, bsr.block_cols.reshape(-1), axis=0)
    return gathered.reshape(*bsr.block_cols.shape, BSR_TILE)


def bsr_matvec_fn(bsr: BSRData):
    n = bsr.shape[0]

    def matvec(v, tiles):
        gathered = bsr_gather_vblocks(bsr, v)
        out = jnp.einsum(
            "nwrc,nwc->nr", tiles, gathered, precision="highest"
        )
        return out.reshape(-1)[:n]

    return matvec


# ---------------------------------------------------------------------------
# ELL fallback
# ---------------------------------------------------------------------------


class ELLData(NamedTuple):
    cols: jax.Array  # (n_rows, width) int32
    perm: np.ndarray  # CSR entry -> flat ELL slot
    width: int
    shape: tuple
    nnz: int

    @property
    def num_slots(self) -> int:
        return int(self.cols.shape[0]) * self.width


def ell_pack(mat: CSRMatrix, *, width_multiple: int = 8) -> ELLData:
    n_rows, _ = mat.shape
    counts = np.diff(mat.indptr)
    width = int(max(1, counts.max()))
    width = -(-width // width_multiple) * width_multiple

    cols = np.zeros((n_rows, width), dtype=np.int32)
    row_of = np.repeat(np.arange(n_rows), counts)
    pos_in_row = np.arange(mat.nnz) - np.repeat(mat.indptr[:-1], counts)
    cols[row_of, pos_in_row] = mat.indices
    perm = row_of * width + pos_in_row
    return ELLData(
        cols=jnp.asarray(cols), perm=perm, width=width, shape=mat.shape, nnz=mat.nnz
    )


def ell_values(ell: ELLData, csr_data) -> jax.Array:
    flat = np.zeros(ell.shape[0] * ell.width, dtype=np.asarray(csr_data).dtype)
    flat[ell.perm] = np.asarray(csr_data)
    return jnp.asarray(flat.reshape(ell.shape[0], ell.width))


def ell_matvec_fn(ell: ELLData):
    """Tiled-ELL matvec: 128-lane window-row gather + one-hot lane select.

    A per-element ``jnp.take`` sustains ~1 GB/s on TPU (serialised
    scalar gathers).  Instead, fetch for every stored entry the whole
    128-wide *window row* of ``v`` it points into -- whole-lane-row
    gathers run at HBM roofline (~855 GB/s measured) -- and select the
    lane with a one-hot contraction that XLA fuses into the gather
    consumer (pure VPU compare+FMA, no scatter, no element gather).
    Traffic is 512 B/entry instead of one serialised element; the
    measured numbers for the scattered/random case (this path vs the
    element-gather floor) live in
    ``results/benchmarks/spmv_formats/benchmark/formats.json`` and the
    RESULTS.md SpMV table built from it.
    """
    cols = ell.cols
    window = cols // 128  # (n_rows, width) v-window row ids
    lane = cols % 128
    n_c = ell.shape[1]
    padded_c = -(-n_c // 128) * 128

    def matvec(v, vals):
        vpad = jnp.pad(v, (0, padded_c - n_c)) if padded_c != n_c else v
        v2 = vpad.reshape(-1, 128)
        g = jnp.take(v2, window, axis=0)  # (n_rows, width, 128) row gather
        onehot = (lane[..., None] == jnp.arange(128, dtype=lane.dtype)).astype(
            v.dtype
        )
        picked = jnp.einsum("rwl,rwl->rw", g, onehot, precision="highest")
        return jnp.sum(vals * picked, axis=1)

    return matvec


class HYBData(NamedTuple):
    """Hybrid ELL: light rows in (tiled) ELL + heavy rows as dense.

    Plain ELL pads every row to the longest one, which explodes on
    matrices with a few (near-)dense rows -- bloweybq's max row is the
    full 10001 columns at mean degree 7, so pure ELL would store 1400x
    the nnz.  Rows longer than ``heavy_factor * max(8, median)`` are
    peeled into an explicit (k, n_cols) dense block (k is tiny on real
    patterns; its matvec is one skinny MXU matmul), and the remaining
    light rows use the tiled-ELL window-gather path at their own small
    width.  Degenerates to pure tiled ELL when no row is heavy.
    """

    ell: ELLData
    heavy_rows: jax.Array  # (k,) int32 row indices (possibly k=0)
    heavy_scatter: np.ndarray  # heavy CSR entry -> flat (k, n_cols) slot
    light_mask: np.ndarray  # bool per CSR entry: in the light part
    shape: tuple
    nnz: int

    @property
    def num_slots(self) -> int:
        return self.ell.num_slots + int(self.heavy_rows.shape[0]) * self.shape[1]


def hyb_pack(mat: CSRMatrix, *, heavy_factor: int = 4) -> HYBData:
    # The light_mask <-> ELL slot correspondence below assumes CSR
    # entries are (row, col)-sorted (csr_from_coo guarantees it); a
    # hand-built CSRMatrix with unsorted within-row indices would
    # silently permute values against ell.perm, so refuse it.
    if np.any(np.diff(mat.indices) <= 0):
        starts = mat.indptr[:-1]
        boundary = np.zeros(mat.nnz, dtype=bool)
        boundary[starts[starts < mat.nnz]] = True
        unsorted_inside_row = (np.diff(mat.indices) <= 0) & ~boundary[1:]
        if np.any(unsorted_inside_row):
            msg = (
                "hyb_pack requires column indices sorted within each row "
                "(duplicates included); build the matrix via csr_from_coo"
            )
            raise ValueError(msg)
    counts = np.diff(mat.indptr)
    threshold = heavy_factor * max(8, int(np.median(counts)))
    heavy = np.flatnonzero(counts > threshold)
    is_heavy_entry = np.isin(mat.rows, heavy)

    light_mask = ~is_heavy_entry
    light = csr_from_coo(
        mat.rows[light_mask],
        mat.indices[light_mask],
        mat.data[light_mask],
        shape=mat.shape,
    )
    # csr_from_coo sorts by (row, col) -- the light entries are already
    # in CSR order, so the entry<->slot correspondence is preserved.
    heavy_pos = np.searchsorted(heavy, mat.rows[is_heavy_entry])
    heavy_scatter = heavy_pos * mat.shape[1] + mat.indices[is_heavy_entry]
    return HYBData(
        ell=ell_pack(light),
        heavy_rows=jnp.asarray(heavy, dtype=jnp.int32),
        heavy_scatter=heavy_scatter,
        light_mask=light_mask,
        shape=mat.shape,
        nnz=mat.nnz,
    )


def hyb_values(hyb: HYBData, csr_data):
    """(ell_values, heavy_dense) pytree of differentiable parameters."""
    data = np.asarray(csr_data)
    ell_vals = ell_values(hyb.ell, data[hyb.light_mask])
    k = int(hyb.heavy_rows.shape[0])
    dense = np.zeros(k * hyb.shape[1], dtype=data.dtype)
    dense[hyb.heavy_scatter] = data[~hyb.light_mask]
    return ell_vals, jnp.asarray(dense.reshape(k, hyb.shape[1]))


def hyb_matvec_fn(hyb: HYBData):
    light_matvec = ell_matvec_fn(hyb.ell)
    heavy_rows = hyb.heavy_rows
    k = int(heavy_rows.shape[0])

    def matvec(v, vals):
        ell_vals, dense = vals
        out = light_matvec(v, ell_vals)
        if k == 0:
            return out
        heavy_out = dense @ v  # (k, n) @ (n,) skinny matmul
        return out.at[heavy_rows].set(heavy_out)

    return matvec


def ell_matvec_fn_gather(ell: ELLData):
    """Element-gather ELL matvec (the ~1 GB/s floor; kept for benchmarks)."""
    cols = ell.cols

    def matvec(v, vals):
        gathered = jnp.take(v, cols, axis=0)
        return jnp.sum(vals * gathered, axis=1)

    return matvec


# ---------------------------------------------------------------------------
# Format selection
# ---------------------------------------------------------------------------


class OperatorInfo(NamedTuple):
    format: str
    stored_slots: int
    nnz: int
    bytes_per_matvec: int

    @property
    def fill_efficiency(self) -> float:
        return self.nnz / max(1, self.stored_slots)


# x + its padded copy must fit VMEM alongside the streamed value chunks.
_DIA_PALLAS_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def sparse_operator(
    mat: CSRMatrix,
    *,
    dtype=jnp.float32,
    format: str = "auto",
    dia_max_diags: int = 64,
    bsr_min_fill: float = 0.02,
    with_info: bool = False,
):
    """Build ``(matvec, values)`` (+ ``OperatorInfo``) for a CSR matrix.

    ``matvec(v, values)`` computes ``A(values) @ v`` with the sparsity
    pattern closed over; ``values`` is the differentiable parameter in
    the chosen device layout.
    """
    fmt = format
    if fmt == "auto":
        offs = dia_analyze(mat)
        if len(offs) <= dia_max_diags and mat.shape[0] == mat.shape[1]:
            fmt = "dia"
        else:
            bsr = bsr_pack(mat)
            fmt = "bsr" if mat.nnz / bsr.num_slots >= bsr_min_fill else "hyb"

    if fmt == "dia":
        dia = dia_pack(mat)
        matvec = dia_matvec_fn(dia)
        # Single-pass Pallas kernel on TPU backends (the XLA roll-FMA
        # formulation materialises one rolled copy of x per diagonal;
        # measured ~3x slower with runtime values at n=1M).  The kernel
        # keeps x plus a circularly-padded copy VMEM-resident, so guard
        # by a VMEM budget and fall back to the XLA path beyond it.
        if (
            dtype == jnp.float32
            and mat.shape[0] % 1024 == 0
            and 2 * mat.shape[0] * 4 <= _DIA_PALLAS_VMEM_BUDGET_BYTES
            and jax.default_backend() == "tpu"
        ):
            from lanczos_adjoints_tpu.ops import pallas_dia

            matvec = pallas_dia.dia_matvec_pallas(dia)
            matvec.dia_data = dia  # keep the fused-Lanczos dispatch tag
        values = dia_values(dia, mat.data).astype(dtype)
        slots = dia.num_slots
    elif fmt == "bsr":
        bsr = bsr_pack(mat)
        matvec = bsr_matvec_fn(bsr)
        values = bsr_values(bsr, mat.data).astype(dtype)
        slots = bsr.num_slots
    elif fmt == "ell":
        ell = ell_pack(mat)
        matvec = ell_matvec_fn(ell)
        values = ell_values(ell, mat.data).astype(dtype)
        slots = ell.num_slots
    elif fmt == "hyb":
        hyb = hyb_pack(mat)
        matvec = hyb_matvec_fn(hyb)
        ell_vals, dense = hyb_values(hyb, mat.data)
        values = (ell_vals.astype(dtype), dense.astype(dtype))
        slots = hyb.num_slots
    else:
        msg = f"format={format!r} not in ('auto', 'dia', 'bsr', 'ell', 'hyb')"
        raise ValueError(msg)

    if with_info:
        itemsize = jnp.dtype(dtype).itemsize
        info = OperatorInfo(
            format=fmt,
            stored_slots=slots,
            nnz=mat.nnz,
            bytes_per_matvec=slots * itemsize + 2 * mat.shape[0] * itemsize,
        )
        return matvec, values, info
    return matvec, values


def coo_matvec_fn(mat: CSRMatrix, *, dtype=jnp.float32):
    """COO segment-sum matvec: reference-style correctness baseline."""
    row_ids = jnp.asarray(mat.rows, dtype=jnp.int32)
    cols = jnp.asarray(mat.indices, dtype=jnp.int32)
    n_rows = mat.shape[0]

    def matvec(v, vals):
        prods = vals * v[cols]
        return jax.ops.segment_sum(prods, row_ids, num_segments=n_rows)

    return matvec, jnp.asarray(mat.data, dtype=dtype)
