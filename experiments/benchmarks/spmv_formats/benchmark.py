"""SpMV throughput across the sparse-engine formats (DIA / BSR / ELL).

Produces the format-comparison table in RESULTS.md reproducibly:
matvec and VJP throughput (true nnz/s and effective HBM bandwidth) of
each device layout on stencil and scattered sparsity patterns, using
the on-device R-slope protocol.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_adjoints_tpu.ops import pallas_bsr, sparse
from lanczos_adjoints_tpu.utils import exp_util, timing


def laplacian_2d(m):
    n = m * m
    idx = np.arange(n)
    rows, cols, vals = [idx], [idx], [4.0 * np.ones(n)]
    i, j = idx // m, idx % m
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        ni, nj = i + di, j + dj
        ok = (ni >= 0) & (ni < m) & (nj >= 0) & (nj < m)
        rows.append(idx[ok])
        cols.append((ni * m + nj)[ok])
        vals.append(-1.0 * np.ones(ok.sum()))
    return sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )


def random_csr(n, nnz_per_row, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, n, len(rows))
    vals = rng.normal(size=len(rows))
    return sparse.csr_from_coo(rows, cols, vals, shape=(n, n))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", type=int, default=1024)
    parser.add_argument("--random_n", type=int, default=65536)
    parser.add_argument("--random_nnz_per_row", type=int, default=8)
    parser.add_argument("--fem_grid", type=int, default=24)
    args = parser.parse_args()
    print(args)

    # FEM case: synthetic bcsstk-class stiffness pattern (3-D hex mesh,
    # 3 dofs/node, ~81 nnz/row -- reference suite_sparse/benchmark.py:59-68
    # timed bcsstk18; those archives are truncated in the offline bundle).
    fem = pallas_bsr.fem_test_matrix(args.fem_grid, dofs=3)
    perm = sparse.reverse_cuthill_mckee(fem)
    fem_rcm = sparse.permute_symmetric(fem, perm)

    # ELL's element-gather transpose is the documented XLA:TPU pathology
    # (~1 GB/s); time it at a size where the VJP finishes in seconds.
    cases = [
        ("laplacian_2d", laplacian_2d(args.grid), ["dia", "dia_pallas"]),
        ("laplacian_2d_small", laplacian_2d(args.grid // 4), ["dia", "dia_pallas", "ell"]),
        ("fem_3dof", fem, ["bsr", "bsr_pallas"]),
        ("fem_3dof_rcm", fem_rcm, ["bsr", "bsr_pallas"]),
        (
            "random",
            random_csr(args.random_n, args.random_nnz_per_row),
            ["ell", "ell_gather"],
        ),
        # Real scattered pattern from the bundled SuiteSparse set:
        # bloweybq's (8,128)-tile fill is 0.07% (block formats hopeless)
        # and it carries two near-dense rows (plain ELL would pad 1400x),
        # so it exercises the hybrid heavy-row peel + tiled-ELL path.
        # The floor to beat is the reference-style BCOO segment-sum
        # (ref exp_util.py:35-42).
        (
            "bloweybq",
            exp_util.suite_sparse_load(
                "bloweybq", path="/root/reference/data/matrices/"
            ),
            ["hyb", "coo"],
        ),
    ]

    results = []
    for case_name, mat, formats in cases:
        v = jnp.ones((mat.shape[0],), jnp.float32)
        for fmt in formats:
            try:
                if fmt in ("dia", "dia_pallas"):
                    # Build both DIA paths explicitly: sparse_operator's
                    # auto-dispatch would otherwise pick the Pallas kernel
                    # for the 'dia' row too and the XLA-vs-Pallas
                    # comparison would silently measure the same code.
                    dia = sparse.dia_pack(mat)
                    values = sparse.dia_values(dia, mat.data)
                    if fmt == "dia_pallas":
                        from lanczos_adjoints_tpu.ops import pallas_dia

                        matvec = pallas_dia.dia_matvec_pallas(dia)
                    else:
                        matvec = sparse.dia_matvec_fn(dia)
                    itemsize = 4
                    stored = int(np.prod(values.shape))
                    info = sparse.OperatorInfo(
                        format=fmt,
                        stored_slots=stored,
                        nnz=mat.nnz,
                        bytes_per_matvec=stored * itemsize
                        + 2 * mat.shape[0] * itemsize,
                    )
                elif fmt == "bsr_pallas":
                    bsr = sparse.bsr_pack(mat)
                    values = sparse.bsr_values(bsr, mat.data)
                    matvec = pallas_bsr.bsr_matvec_pallas(
                        bsr, symmetric=mat.is_symmetric()
                    )
                    itemsize = 4
                    info = sparse.OperatorInfo(
                        format=fmt,
                        stored_slots=bsr.num_slots,
                        nnz=mat.nnz,
                        bytes_per_matvec=bsr.num_slots * itemsize
                        + 2 * mat.shape[0] * itemsize,
                    )
                elif fmt == "coo":
                    matvec, values = sparse.coo_matvec_fn(mat)
                    itemsize = mat.data.dtype.itemsize
                    info = sparse.OperatorInfo(
                        format=fmt,
                        stored_slots=mat.nnz,
                        nnz=mat.nnz,
                        bytes_per_matvec=3 * mat.nnz * itemsize
                        + 2 * mat.shape[0] * itemsize,
                    )
                elif fmt == "ell_gather":
                    # The pre-round-3 element-gather floor, kept so the
                    # tiled-ELL speedup is measured against it.
                    ell = sparse.ell_pack(mat)
                    values = sparse.ell_values(ell, mat.data)
                    matvec = sparse.ell_matvec_fn_gather(ell)
                    itemsize = mat.data.dtype.itemsize
                    info = sparse.OperatorInfo(
                        format=fmt,
                        stored_slots=ell.num_slots,
                        nnz=mat.nnz,
                        bytes_per_matvec=2 * ell.num_slots * itemsize
                        + 2 * mat.shape[0] * itemsize,
                    )
                else:
                    matvec, values, info = sparse.sparse_operator(
                        mat, format=fmt, with_info=True
                    )
            except Exception as err:  # noqa: BLE001
                print(f"{case_name}/{fmt}: pack failed ({type(err).__name__})")
                continue
            # ``values`` rides through slope_time as a traced argument:
            # closing over it would embed the array in the lowered HLO
            # (hundreds of MB for the FEM cases).
            t, t_info = timing.slope_time(
                matvec, v, values, reps=8, return_info=True
            )
            nnz_s = mat.nnz / t
            bw = info.bytes_per_matvec / t
            # VJP (transpose matvec + value gradient) throughput.
            grad = jax.grad(lambda x, vl: jnp.sum(matvec(x, vl) ** 2), argnums=0)
            t_vjp, t_vjp_info = timing.slope_time(
                grad, v, values, reps=8, return_info=True
            )
            print(
                f"{case_name}/{fmt}: {t * 1e3:.3f} ms/matvec "
                f"({nnz_s / 1e9:.2f} Gnnz/s, {bw / 1e9:.0f} GB/s eff, "
                f"fill {info.fill_efficiency:.3f}); vjp {t_vjp * 1e3:.3f} ms"
            )
            row = {
                "case": case_name,
                "format": fmt,
                "time_s": t,
                "time_vjp_s": t_vjp,
                "nnz_per_s": nnz_s,
                "fill": info.fill_efficiency,
            }
            # Refuse to persist sub-window slope readings as numbers: a
            # window below the resolvable threshold can produce garbage
            # (even negative) times -- mark them unresolved instead.
            if not (t_info["resolved"] and t > 0):
                row["time_s"] = None
                row["nnz_per_s"] = None
                row["unresolved"] = True
            if not (t_vjp_info["resolved"] and t_vjp > 0):
                row["time_vjp_s"] = None
                row["unresolved"] = True
            results.append(row)

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    with open(f"{directory}formats.json", "w") as fp:
        json.dump(results, fp, indent=2)
