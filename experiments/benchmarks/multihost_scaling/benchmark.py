"""Scaling of the sharded flagship workloads across a device mesh.

NEW scope beyond the reference (BASELINE config 5).  Two workloads:

1. **GP flagship Gram matvec** (the --mesh training path,
   ``parallel.sharded_gram_policy``): O(n^2/P) local kernel-tile work
   against ONE output all-gather of n*4 bytes per matvec.  Compute
   shrinks 1/P while communication stays O(n), so efficiency is a pure
   function of local rows -- measured on the real chip via the fused
   Pallas Gram kernel at rows = n/P.
2. **Row-partitioned DIA Lanczos** (ring halo exchange): O(nnz/P) local
   stencil work against O(halo) ICI bytes plus the per-step scalar
   psums of the Lanczos recurrence.  The RDMA halo-overlap kernel
   (``parallel/pallas_halo.py``) hides the halo bytes behind the local
   FMA sweep; the scalar psums are on the recurrence's critical path
   and cannot be hidden, which floors DIA scaling at small rows/P.

On real multi-chip hardware the measured section runs as-is; on this
single-chip host the local step times t(rows) ARE measured on the real
chip (``--measure_local``) and the ICI terms come from a stated
analytical model -- the honest single-chip statement about multi-chip
efficiency.  The artifact records the regime (rows per device) where
the >= 80 % BASELINE.md:34 target holds for each workload.
"""

import argparse
import functools
import json
import os
import time

import numpy as np

ICI_BW = 9e10  # bytes/s effective per link direction, v5e ICI (order)
ICI_LAT = 2e-6  # seconds per one-hop collective launch (order)
DEVICE_GRID = [2, 4, 8, 16, 32]
# Local-cost fits are measured on a DENSER grid than the device counts
# (intermediate divisors interleave the powers of two) with repeated
# slope measurements per point: the round-4 fit from 6 single-shot
# points carried a ~2x relative residual at the small-rows end -- the
# exact regime where the 80 % boundary sits.
MEASURE_GRID = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48]
MEASURE_REPEATS = 3


def _median_slope(timing, fn, *args, reps=8):
    """Median of repeated slope measurements (each already windowed)."""
    times, resolved = [], True
    for _ in range(MEASURE_REPEATS):
        t, info = timing.slope_time(fn, *args, reps=reps, return_info=True)
        times.append(t)
        resolved = resolved and info["resolved"]
    return {
        "time_s": float(np.median(times)),
        "times": [float(t) for t in times],
        "resolved": resolved,
    }


def measure_gram_local(args):
    """Fused Gram matvec time at rows = n/P on the real chip."""
    import jax
    import jax.numpy as jnp

    from lanczos_adjoints_tpu.ops import pallas_gram
    from lanczos_adjoints_tpu.utils import timing

    n, d = args.gram_n, args.gram_d
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), dtype=jnp.float32)
    v = jax.random.normal(key, (n,), dtype=jnp.float32)
    ell = jnp.ones((d,), jnp.float32)
    out_scale = jnp.asarray(1.0, jnp.float32)
    fused = pallas_gram.gram_matvec_fused("matern32")

    rows_table = {}
    for p in MEASURE_GRID:
        rows = n // p
        x_loc = x[:rows]

        def local(v, x_loc, *, _rows=rows):
            out = fused(x_loc, x, v, ell, out_scale)
            return jnp.pad(out, (0, n - _rows))  # keep feedback shape (n,)

        entry = _median_slope(timing, local, v, x_loc)
        rows_table[rows] = entry
        print(
            f"gram local rows={rows}: {entry['time_s'] * 1e3:.3f} ms "
            f"(spread {min(entry['times']) * 1e3:.3f}-"
            f"{max(entry['times']) * 1e3:.3f}, resolved={entry['resolved']})"
        )
    return rows_table


def measure_dia_local(args):
    """Pallas DIA matvec time at rows = n/P on the real chip."""
    import jax
    import jax.numpy as jnp

    from lanczos_adjoints_tpu.ops import pallas_dia, sparse
    from lanczos_adjoints_tpu.utils import timing

    rows_table = {}
    for p in MEASURE_GRID:
        rows = args.num_rows // p
        rows -= rows % 1024  # fused kernel needs n % (8*128) == 0
        idx = np.arange(rows)
        offsets = [-args.bandwidth, -1, 0, 1, args.bandwidth]
        rr, cc, vv = [], [], []
        for dd in offsets:
            lo, hi = max(0, -dd), min(rows, rows - dd)
            rr.append(idx[lo:hi])
            cc.append(idx[lo:hi] + dd)
            vv.append((4.0 if dd == 0 else -1.0) * np.ones(hi - lo))
        mat = sparse.csr_from_coo(
            np.concatenate(rr), np.concatenate(cc), np.concatenate(vv),
            shape=(rows, rows),
        )
        dia = sparse.dia_pack(mat)
        values = jnp.asarray(sparse.dia_values(dia, mat.data), jnp.float32)
        matvec = pallas_dia.dia_matvec_pallas(dia)
        v = jnp.ones((rows,), jnp.float32)
        t, info = timing.slope_time(matvec, v, values, reps=8, return_info=True)
        rows_table[rows] = {"time_s": t, "resolved": info["resolved"]}
        print(f"dia local rows={rows}: {t * 1e6:.1f} us (resolved={info['resolved']})")
    return rows_table


def fit_affine_cost(local_table):
    """Fit a monotone cost model ``t(rows) = a + b*rows`` (a, b >= 0).

    Plugging independently-measured step times at different row counts
    straight into an efficiency ratio can predict super-linear speedups
    (>1.0) whenever run-to-run noise makes t(rows) locally sub-linear --
    physically impossible for a fixed-size problem.  A nonnegative
    affine fit (fixed per-launch overhead + throughput term) is the
    minimal model that is monotone in rows, and it makes the predicted
    efficiency structurally <= 1:
    eff = (a + b n) / (P a + b n + P t_comm) <= 1 for a, t_comm >= 0.
    """
    # Resolved slope readings only: sub-window rows are garbage (can be
    # negative) and an affine fit through them reports a meaningless
    # throughput term.  The tiny-rows DIA matvecs (<10 us) routinely
    # fail to clear the 5 ms window within the rep budget.
    resolved = {r: v for r, v in local_table.items() if v.get("resolved", True)}
    if len(resolved) < 3:
        return {
            "overhead_s": None,
            "per_row_s": None,
            "max_rel_fit_error": None,
            "median_rel_fit_error": None,
            "points": int(len(resolved)),
            "unresolved": True,
        }
    local_table = resolved
    rows = np.array(sorted(local_table))
    t = np.array([local_table[r]["time_s"] for r in rows])
    # RELATIVE least squares (weight 1/t): an unweighted fit is dominated
    # by the large-rows points and leaves ~2x relative residuals at small
    # rows -- exactly where the 80 % regime boundary is decided.
    A = np.stack([np.ones_like(rows, dtype=float), rows.astype(float)], axis=1)
    (a, b), *_ = np.linalg.lstsq(A / t[:, None], np.ones_like(t), rcond=None)
    if b < 0:  # degenerate: flat-cost regime; all overhead
        a, b = float(np.mean(t)), 0.0
    elif a < 0:  # degenerate: pure-throughput regime
        a, b = 0.0, float(np.sum(rows / t) / np.sum(rows * rows / t**2))
    residual = t - (a + b * rows)
    rel = np.abs(residual) / t
    return {
        "overhead_s": float(a),
        "per_row_s": float(b),
        "max_rel_fit_error": float(np.max(rel)),
        "median_rel_fit_error": float(np.median(rel)),
        "points": int(len(rows)),
    }


def gram_model(local_table, n, scale=1.0):
    """Efficiency of the row-sharded Gram matvec vs device count.

    Communication: ring all-gather of the (n,) output -- P-1 hops of
    n/P * 4 bytes each.  Local work: the monotone affine fit to the
    measured fused-kernel times at rows = n/P (see ``fit_affine_cost``
    for why raw per-row measurements are not used directly).  ``scale``
    multiplies the local-cost fit -- used to propagate the fit residual
    into an efficiency/regime uncertainty band (smaller local cost =
    relatively larger communication = the pessimistic band edge).
    """
    fit = fit_affine_cost(local_table)
    if fit.get("unresolved"):
        return None, fit
    cost = lambda rows: scale * (fit["overhead_s"] + fit["per_row_s"] * rows)
    t1 = cost(n)
    out = []
    for p in DEVICE_GRID:
        rows = n // p
        if rows not in local_table:
            rows = min(local_table, key=lambda r: abs(r - n // p))
        t_local = cost(rows)
        t_comm = (p - 1) * (rows * 4 / ICI_BW + ICI_LAT)
        eff = t1 / (p * (t_local + t_comm))
        out.append(
            {
                "devices": p,
                "rows_per_device": rows,
                "t_local_s": t_local,
                "t_local_measured_s": local_table[rows]["time_s"],
                "t_comm_s": t_comm,
                "predicted_efficiency": eff,
            }
        )
    return out, fit


def dia_model(local_table, n, bandwidth, scale=1.0):
    """Efficiency of the sharded DIA Lanczos step vs device count.

    Per Lanczos step and device: one halo exchange (both directions,
    ``bandwidth`` f32 entries each) and two scalar psums (alpha, beta)
    on the recurrence's critical path.  Two variants:

    - sequential (``sharded_dia_operator``): halo exchange then FMA,
    - overlapped (``pallas_halo``): the RDMA halo rides under the local
      FMA sweep; only the *exposed* remainder max(0, t_halo - t_local)
      plus the boundary-row recompute costs time.  The psums cannot be
      hidden (data dependency), so they floor both variants.
    """
    fit = fit_affine_cost(local_table)
    if fit.get("unresolved"):
        return None, fit
    cost = lambda rows: scale * (fit["overhead_s"] + fit["per_row_s"] * rows)
    t1 = cost(n)
    halo_bytes = 2 * bandwidth * 4  # per direction
    out = []
    for p in DEVICE_GRID:
        rows = n // p
        if rows not in local_table:
            rows = min(local_table, key=lambda r: abs(r - n // p))
        t_local = cost(rows)
        t_halo = halo_bytes / ICI_BW + ICI_LAT
        t_psum = 2 * 2 * ICI_LAT * max(1, int(np.log2(p)))
        # boundary recompute: 2*halo rows of the stencil out of `rows`
        t_recompute = t_local * min(1.0, 2 * bandwidth / rows)
        eff_seq = t1 / (p * (t_local + 2 * t_halo + t_psum))
        exposed = max(0.0, 2 * t_halo - t_local)
        overlap_fraction = 1.0 - exposed / (2 * t_halo)
        eff_ovl = t1 / (p * (t_local + exposed + t_recompute + t_psum))
        out.append(
            {
                "devices": p,
                "rows_per_device": rows,
                "t_local_s": t_local,
                "t_local_measured_s": local_table[rows]["time_s"],
                "t_halo_exchange_s": 2 * t_halo,
                "t_psum_s": t_psum,
                "overlap_fraction": overlap_fraction,
                "predicted_efficiency_sequential": eff_seq,
                "predicted_efficiency_overlapped": eff_ovl,
            }
        )
    return out, fit


def regime_80(model_rows, key):
    """Smallest rows/device at which every device count meets >= 0.80."""
    passing = [m["rows_per_device"] for m in model_rows if m[key] >= 0.80]
    failing = [m["rows_per_device"] for m in model_rows if m[key] < 0.80]
    if not passing:
        return {"holds": False, "min_rows_per_device": None}
    threshold = max(failing) if failing else 0
    return {
        "holds": True,
        "min_rows_per_device": int(
            min(r for r in passing if r > threshold)
        ),
    }


def measured_virtual_mesh(args):
    """Correctness run of the sharded DIA Lanczos VJP over mesh sizes."""
    import jax
    import jax.numpy as jnp

    from lanczos_adjoints_tpu import krylov, parallel
    from lanczos_adjoints_tpu.ops import sparse

    n = args.num_rows
    idx = np.arange(n)
    offsets = [-args.bandwidth, -1, 0, 1, args.bandwidth]
    rows, cols, vals = [], [], []
    for d in offsets:
        lo, hi = max(0, -d), min(n, n - d)
        rows.append(idx[lo:hi])
        cols.append(idx[lo:hi] + d)
        vals.append((4.0 if d == 0 else -1.0) * np.ones(hi - lo))
    mat = sparse.csr_from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape=(n, n)
    )
    dia = sparse.dia_pack(mat)
    values = sparse.dia_values(dia, mat.data).astype(jnp.float32)
    print(f"operator: n={n} nnz={mat.nnz} diagonals={len(dia.offsets)}")

    results = []
    max_dev = len(jax.devices())
    sizes = [p for p in [1, 2, 4, 8, 16] if p <= max_dev]
    base_time = None
    for p in sizes:
        mesh = parallel.device_mesh(p)
        matvec = parallel.sharded_dia_operator(dia, mesh)
        vals_sharded = parallel.shard_rows(values, mesh, dim=1)
        factorise = krylov.tridiag(
            lambda v, vals: matvec(v, vals), args.depth, reortho="none"
        )
        v0 = parallel.shard_rows(jnp.ones((n,), jnp.float32), mesh)

        def one_vjp(v, vals):
            out, vjp = jax.vjp(factorise, v, vals)
            flat, unflatten = jax.flatten_util.ravel_pytree(out)
            dv, _dvals = vjp(unflatten(jnp.ones_like(flat)))
            return jnp.sum(dv), dv

        def repeated(v, vals, reps):
            def body(_i, carry):
                v, acc = carry
                contribution, dv = one_vjp(v, vals)
                return v + 1e-12 * dv, acc + contribution

            _v, acc = jax.lax.fori_loop(0, reps, body, (v, 0.0))
            return acc

        fn_many = jax.jit(functools.partial(repeated, reps=args.reps))
        fn_one = jax.jit(functools.partial(repeated, reps=1))
        np.asarray(fn_many(v0, vals_sharded))
        np.asarray(fn_one(v0, vals_sharded))
        t_many, t_one = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn_many(v0, vals_sharded))
            t_many.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fn_one(v0, vals_sharded))
            t_one.append(time.perf_counter() - t0)
        t = (float(np.median(t_many)) - float(np.median(t_one))) / (args.reps - 1)
        if base_time is None:
            base_time = t
        eff = base_time / (t * p)
        print(f"devices={p}: {t * 1e3:.2f} ms/VJP  scaling efficiency {eff:.2f}")
        results.append({"devices": p, "time_s": t, "efficiency": eff})
    return results


def main(args):
    import jax

    artifact_path = None
    from lanczos_adjoints_tpu.utils import exp_util

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    artifact_path = f"{directory}scaling.json"

    artifact = {}
    if os.path.exists(artifact_path) and args.merge:
        with open(artifact_path) as fp:
            artifact = json.load(fp)

    if args.model_only:
        pass  # rebuild comm_model below from the stored local_steps
    elif args.measure_local:
        # Real-chip local-step measurements (the n-dependence the model
        # needs); run this part on the TPU.
        assert jax.default_backend() != "cpu", "--measure_local needs the chip"
        gram_table = measure_gram_local(args)
        dia_table = measure_dia_local(args)
        artifact["local_steps"] = {
            "platform": jax.default_backend(),
            "gram": {
                "n": args.gram_n,
                "d": args.gram_d,
                "kernel": "matern32 fused Pallas",
                "rows_table": {str(k): v for k, v in gram_table.items()},
            },
            "dia": {
                "n": args.num_rows,
                "bandwidth": args.bandwidth,
                "kernel": "single-pass Pallas DIA",
                "rows_table": {str(k): v for k, v in dia_table.items()},
            },
        }
    else:
        artifact["measured"] = measured_virtual_mesh(args)
        artifact["virtual_mesh"] = (
            args.force_cpu_devices > 0 or jax.default_backend() == "cpu"
        )
        artifact["platform"] = jax.default_backend()
        artifact["caveat"] = (
            "Measured times on a virtual (forced host) mesh reflect "
            "host-emulation overhead, NOT multi-chip scaling; see "
            "comm_model for the analytical ICI statement."
            if artifact["virtual_mesh"]
            else "measured on real devices"
        )

    # (Re)build the communication model from whatever local-step tables
    # the artifact holds.
    steps = artifact.get("local_steps")
    if steps:
        gram_table = {
            int(k): v for k, v in steps["gram"]["rows_table"].items()
        }
        dia_table = {int(k): v for k, v in steps["dia"]["rows_table"].items()}
        gm, gram_fit = gram_model(gram_table, steps["gram"]["n"])
        dm, dia_fit = dia_model(dia_table, steps["dia"]["n"], steps["dia"]["bandwidth"])

        # Propagate the fit residual into a band on the 80 %-regime
        # boundary: re-evaluate the model with the local cost scaled by
        # (1 -+ max_rel_fit_error).  The pessimistic edge (local cost low,
        # communication relatively high) is the honest boundary to quote.
        def _regime_band(model_fn, fit, key, *fn_args):
            if fit.get("unresolved"):
                return {"unresolved": True, "points_resolved": fit["points"]}
            e = min(fit["max_rel_fit_error"], 0.9)
            lo, _ = model_fn(*fn_args, scale=1.0 - e)
            hi, _ = model_fn(*fn_args, scale=1.0 + e)
            return {
                "local_cost_scaled_down": regime_80(lo, key),
                "local_cost_scaled_up": regime_80(hi, key),
                "scale_half_width": e,
            }

        gram_band = _regime_band(
            gram_model, gram_fit, "predicted_efficiency",
            gram_table, steps["gram"]["n"],
        )
        dia_band = _regime_band(
            dia_model, dia_fit, "predicted_efficiency_overlapped",
            dia_table, steps["dia"]["n"], steps["dia"]["bandwidth"],
        )
        artifact["comm_model"] = {
            "assumptions": {
                "ici_bytes_per_s_per_direction": ICI_BW,
                "ici_one_hop_latency_s": ICI_LAT,
                "local_step_times": (
                    "monotone affine fit t(rows) = a + b*rows (a, b >= 0) "
                    "to the real-chip measurements in local_steps; raw "
                    "per-row readings are noisy enough to predict "
                    "super-linear (>1.0) efficiency if used directly, and "
                    "the affine form bounds efficiency by 1 by construction"
                ),
                "local_cost_fit": {"gram": gram_fit, "dia": dia_fit},
                "gram_communication": "ring all-gather of the n*4-byte output",
                "dia_communication": (
                    "bidirectional halo exchange + 2 scalar psums per "
                    "Lanczos step; overlapped variant credits the RDMA "
                    "halo kernel (parallel/pallas_halo.py) with hiding "
                    "min(t_halo, t_local) of the exchange"
                ),
            },
            "gram_flagship": gm,
            "dia_lanczos": dm,
            "efficiency_80_regime": {
                "gram_flagship": (
                    regime_80(gm, "predicted_efficiency")
                    if gm else {"unresolved": True}
                ),
                "dia_lanczos_sequential": (
                    regime_80(dm, "predicted_efficiency_sequential")
                    if dm else {"unresolved": True}
                ),
                "dia_lanczos_overlapped": (
                    regime_80(dm, "predicted_efficiency_overlapped")
                    if dm else {"unresolved": True}
                ),
                "uncertainty_band": {
                    "gram_flagship": gram_band,
                    "dia_lanczos_overlapped": dia_band,
                },
            },
        }
        for row in gm or []:
            print(
                f"gram P={row['devices']}: eff {row['predicted_efficiency']:.3f}"
            )
        for row in dm or []:
            print(
                f"dia P={row['devices']}: seq {row['predicted_efficiency_sequential']:.3f} "
                f"ovl {row['predicted_efficiency_overlapped']:.3f}"
            )

    with open(artifact_path, "w") as fp:
        json.dump(artifact, fp, indent=2)
    print(f"wrote {artifact_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_rows", type=int, default=1 << 20)
    parser.add_argument("--bandwidth", type=int, default=1024)
    parser.add_argument("--depth", type=int, default=30)
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument("--force_cpu_devices", type=int, default=0)
    parser.add_argument("--measure_local", action="store_true")
    parser.add_argument(
        "--model_only",
        action="store_true",
        help="rebuild comm_model from the stored local_steps (no device runs)",
    )
    parser.add_argument("--merge", action="store_true", default=True)
    parser.add_argument("--gram_n", type=int, default=1 << 16)
    parser.add_argument("--gram_d", type=int, default=9)
    args = parser.parse_args()
    print(args)

    if args.force_cpu_devices:
        import os as _os

        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    main(args)
