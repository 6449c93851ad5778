"""Shared GP-training machinery for the optim_logml_* drivers.

Re-implements the reference flagship experiment
(``experiments/applications/gaussian_process/train/
optim_logml_adjoints_adaptive.py``) on the TPU-native stack: UCI data,
Matern-3/2 GP, preconditioned adaptive/fixed CG + SLQ logdet with
Lanczos adjoints, Adam, per-epoch diagnostics streamed from the
info-dict, results persisted as .npy series.
"""

import os
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanczos_adjoints_tpu import parallel, precond, solvers, trace
from lanczos_adjoints_tpu.models import gp
from lanczos_adjoints_tpu.utils import checkpoint as ckpt_util
from lanczos_adjoints_tpu.utils import data as data_util
from lanczos_adjoints_tpu.utils import exp_util, uci


def load_data(which: str, /):
    loader = getattr(uci, f"uci_{which}", None)
    if loader is None:
        msg = f"Unknown dataset {which!r}"
        raise ValueError(msg)
    return loader(normalize=True)


def rmse(x, *, target):
    return jnp.sqrt(jnp.mean((x - target) ** 2))


def build_argparser(parser):
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--rank_precon", type=int, required=True)
    parser.add_argument(
        "--slq",
        type=str,
        default="vmap",
        choices=["vmap", "blocked"],
        help="SLQ probe execution: 'vmap' = per-probe recurrences "
        "(reference scheme); 'blocked' = multi-RHS recurrences, one "
        "operator application per step for all probes (same "
        "full-reortho semantics)",
    )
    parser.add_argument(
        "--matvec",
        type=str,
        default="auto",
        choices=["auto", "fused"],
        help="Gram matvec policy: 'auto' = vmapped/partitioned per "
        "--num_partitions; 'fused' = the streaming Pallas kernel "
        "(O(N) memory, fastest measured)",
    )
    parser.add_argument(
        "--precon_block",
        type=int,
        default=1,
        help="pivots per sweep for the blocked partial Cholesky (1=sequential)",
    )
    parser.add_argument(
        "--mesh",
        type=str,
        default="1",
        help="device mesh 'R' or 'RxS': the Gram matvec is row-partitioned "
        "R ways (shard_map over a rows axis; works with every --matvec "
        "policy incl. 'fused') and the SLQ probe batch is sharded S ways "
        "(per-probe mode only; blocked SLQ keeps probes on-device)",
    )
    parser.add_argument(
        "--train_log",
        type=str,
        default="clipped",
        choices=["clipped", "plain"],
        help="SLQ matfun during training: 'clipped' protects against "
        "negative Ritz values at f32 (this repo's default); 'plain' is "
        "the reference's jnp.log (ref optim_logml_adjoints_adaptive.py"
        ":108-115 via gp_util.krylov_logdet_slq)",
    )
    parser.add_argument(
        "--split_step",
        action="store_true",
        help="compute each training step as three shorter device calls "
        "(preconditioner factor / CG quadratic-term grad / SLQ logdet "
        "grad) instead of one.  Mathematically identical (the mll is a "
        "sum and the factor is non-differentiable either way); needed "
        "at large N in environments that kill executables running "
        "longer than ~90 s on-device (this relay's watchdog)",
    )
    parser.add_argument(
        "--slq_host_batches",
        type=int,
        default=1,
        help="(--split_step only) evaluate the SLQ logdet gradient as "
        "this many separate device calls of num_samples/B probes each, "
        "averaged on the host.  The Hutchinson mean and its gradient "
        "distribute over probe batches, so the estimator class is "
        "unchanged (probe draws differ from the single-call split of "
        "the same key -- Monte-Carlo noise, not bias).  Bounds the "
        "SLQ executable under the watchdog at large N",
    )
    parser.add_argument(
        "--cg_maxiter",
        type=int,
        default=1000,
        help="adaptive-CG iteration cap for the training solve (the "
        "per-call executable runs ~2x this many matvecs incl. the "
        "implicit-diff transpose solve; bound it at large N to stay "
        "under the executable watchdog)",
    )
    parser.add_argument("--num_partitions", type=int, required=True)
    parser.add_argument("--num_matvecs", type=int, required=True)
    parser.add_argument("--num_samples", type=int, required=True)
    parser.add_argument("--num_epochs", type=int, required=True)
    parser.add_argument("--num_data", type=int, default=-1)
    parser.add_argument("--cg_tol", type=float, default=1e-2)
    parser.add_argument("--learning_rate", type=float, default=0.05)
    parser.add_argument("--checkpoint_every", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return parser


def parse_mesh(spec: str) -> tuple:
    """'R' or 'RxS' -> (rows_way, probes_way)."""
    if "x" in spec:
        rows_way, probes_way = spec.split("x")
        return int(rows_way), int(probes_way)
    return int(spec), 1


def build_mesh(rows_way: int, probes_way: int):
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[: rows_way * probes_way]).reshape(
        rows_way, probes_way
    )
    return Mesh(devices, axis_names=("rows", "probes"))


def assemble(args, *, n_train: int, ndim: int, solver_mode: str, unflatten=None):
    """Build the full GP-training stack from parsed driver arguments.

    Returns the jittable ``mll_lanczos`` / ``mll_eval`` / ``predict_mean``
    closures plus the parameter template -- shared between ``run()`` and
    the multi-chip dry run (``__graft_entry__.dryrun_multichip``), so the
    dry run exercises exactly the driver's assembly, including the
    ``--mesh`` sharded path.
    """
    noise_minval = 1e-4

    # Device mesh: rows (operator/tensor parallelism) x probes (data
    # parallelism over SLQ probes; per-probe mode only).
    mesh = None
    probe_sharding = None
    rows_way, probes_way = parse_mesh(str(getattr(args, "mesh", "1")))
    if rows_way * probes_way > 1:
        if args.slq == "blocked" and probes_way > 1:
            msg = (
                "blocked SLQ amortises kernel tiles across probes within "
                "each device; use --mesh R (rows only) with --slq blocked"
            )
            raise ValueError(msg)
        mesh = build_mesh(rows_way, probes_way)
        if probes_way > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            probe_sharding = NamedSharding(mesh, PartitionSpec("probes"))

    # Linear algebra assembly (call stack SURVEY.md 3.1).
    if solver_mode == "adaptive":
        solve_p = solvers.pcg_adaptive(
            rtol=0.0, atol=args.cg_tol,
            maxiter=getattr(args, "cg_maxiter", 1000), miniter=10,
        )
    else:
        solve_p = solvers.pcg_fixed_step(args.num_matvecs)
    # Probes are vmapped (batched), not sequentially mapped as in the
    # reference: each partitioned Gram block is then evaluated ONCE and
    # contracted against all probes -- measured ~10x cheaper SLQ at
    # equal probe count on TPU (kernel evaluation dominates the matvec).
    from lanczos_adjoints_tpu.trace.slq import log_clipped

    train_matfun = (
        jnp.log if getattr(args, "train_log", "clipped") == "plain" else log_clipped()
    )
    sample = trace.sampler_rademacher(jnp.ones((n_train,)), num=args.num_samples)
    logdet = gp.krylov_logdet_slq(
        args.num_matvecs,
        sample=sample,
        num_batches=1,
        checkpoint=True,
        matfun=train_matfun,
        blocked=args.slq == "blocked",
        probe_sharding=probe_sharding,
    )
    rank_precon = int(min(args.rank_precon, n_train))
    if args.precon_block > 1:
        # Round the rank down to a block multiple (blocked sweeps).
        rank_precon = max(
            args.precon_block, rank_precon // args.precon_block * args.precon_block
        )
        cholesky = precond.cholesky_partial_pivot_blocked(
            rank=rank_precon, block=args.precon_block
        )
    else:
        cholesky = precond.cholesky_partial_pivot(rank=rank_precon)
    precondition = precond.preconditioner(cholesky)
    logpdf_p = gp.logpdf_krylov_p(solve_p, logdet)
    if args.matvec == "fused":
        gram_matvec = gp.gram_matvec_pallas()
    elif args.num_partitions == 1:
        gram_matvec = gp.gram_matvec()
    else:
        gram_matvec = gp.gram_matvec_partitioned(args.num_partitions, checkpoint=True)
    if mesh is not None:
        gram_matvec = parallel.sharded_gram_policy(gram_matvec, mesh)
    constrain = gp.constraint_greater_than(noise_minval)
    likelihood, p_likelihood = gp.likelihood_pdf_p(
        gram_matvec, logpdf_p, precondition, constrain=constrain
    )

    mean, p_mean = gp.mean_constant(shape_out=())
    kernel, p_kernel = gp.kernel_scaled_matern_32(shape_in=(ndim,), shape_out=())
    prior = gp.model_gp(mean, kernel)
    loss = gp.target_logml(prior, likelihood)

    ps_template = (p_mean, p_kernel, p_likelihood)
    if unflatten is None:
        _flat, unflatten = jax.flatten_util.ravel_pytree(ps_template)

    @jax.jit
    def mll_lanczos(params, key, Xs, ys):
        p1, p2, p3 = unflatten(params)
        val, info = loss(
            Xs, ys, key, params_mean=p1, params_kernel=p2, params_likelihood=p3
        )
        return -val / len(Xs), info

    @jax.jit
    def mll_eval(params, key, Xs, ys):
        # Rebuild the probe sampler/logdet for the evaluation-set size.
        p1, p2, p3 = unflatten(params)
        sample_ = trace.sampler_rademacher(
            jnp.ones((len(Xs),)), num=args.num_samples
        )
        logdet_ = gp.krylov_logdet_slq(
            args.num_matvecs,
            sample=sample_,
            num_batches=1,
            checkpoint=True,
            matfun=log_clipped(),
            # Blocked probes when the training config asked for them --
            # the vmapped per-probe composition exceeds this relay's
            # executable watchdog at probes*n beyond ~2M.
            blocked=args.slq == "blocked",
        )
        solve_ = solvers.pcg_adaptive(rtol=0.0, atol=1e-4, maxiter=10_000, miniter=10)
        likelihood_, _ = gp.likelihood_pdf_p(
            gram_matvec,
            gp.logpdf_krylov_p(solve_, logdet_),
            precondition,
            constrain=constrain,
        )
        loss_ = gp.target_logml(prior, likelihood_)
        val, info = loss_(
            Xs, ys, key, params_mean=p1, params_kernel=p2, params_likelihood=p3
        )
        return -val / len(Xs), info

    @jax.jit
    def predict_mean(params, x, Xs, ys):
        p1, p2, p3 = unflatten(params)
        solve_ = solvers.pcg_adaptive(atol=1e-2, rtol=0.0, maxiter=10_000, miniter=10)
        likelihood_, _ = gp.likelihood_condition_p(
            gram_matvec, solve_, precondition=precondition, constrain=constrain
        )
        posterior = gp.target_posterior(prior, likelihood_)
        postmean, _ = posterior(
            Xs, ys, params_mean=p1, params_kernel=p2, params_likelihood=p3
        )
        return postmean(x)

    # --split_step: the same mll value-and-gradient as three shorter
    # device calls.  The mll is a sum,
    #     logml = [-1/2 r^T Khat^{-1} r - n/2 log 2pi] + [-1/2 logdet(Khat)],
    # so value_and_grad distributes over the two bracketed terms, and the
    # preconditioner factor is non-differentiable by contract (its VJP
    # raises), so computing it in its own executable from the same
    # parameters changes nothing.  Purpose: this environment's relay
    # kills any executable running longer than ~90 s on-device; at
    # N=400,000 the single-call step is right at that boundary
    # (results/round5_logs/phase2.log: 3/3 worker crashes).
    mll_split_value_and_grad = None
    predict_mean_split = None
    if getattr(args, "split_step", False):
        from lanczos_adjoints_tpu.models.gp import _CovarianceOp, _mean_array

        @jax.jit
        def _factor(params, Xs):
            p1, p2, _p3 = unflatten(params)
            mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
            cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
            return cholesky(cov.elem, len(Xs))

        @jax.jit
        def _quad_vg(params, chol, Xs, ys):
            def quad(params):
                p1, p2, p3 = unflatten(params)
                mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
                noise = constrain(p3["raw_noise"])
                cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
                r = ys - _mean_array(mean_fn, Xs)
                sol, info = solve_p(
                    lambda v: cov.matvec(v) + noise * v,
                    r,
                    P=lambda v: precond.woodbury_solve(chol, v, noise),
                )
                n = len(Xs)
                val = -0.5 * jnp.dot(r, sol) - n / 2 * jnp.log(2 * jnp.pi)
                return val, info

            (val, info), g = jax.value_and_grad(quad, has_aux=True)(params)
            return val, info, g

        # The SLQ gradient is the longest executable of the three (fwd
        # recurrence + re-projected adjoint + wide parameter pass); at
        # N=400k even alone it exceeds the watchdog.  Split the probe
        # batch over host-level calls: the Hutchinson mean and its
        # gradient distribute over probe batches.
        slq_host_batches = max(1, int(getattr(args, "slq_host_batches", 1)))
        if args.num_samples % slq_host_batches:
            msg = (
                f"--slq_host_batches {slq_host_batches} must divide "
                f"--num_samples {args.num_samples}"
            )
            raise ValueError(msg)
        sample_small = trace.sampler_rademacher(
            jnp.ones((n_train,)), num=args.num_samples // slq_host_batches
        )
        logdet_small = gp.krylov_logdet_slq(
            args.num_matvecs,
            sample=sample_small,
            num_batches=1,
            checkpoint=True,
            matfun=train_matfun,
            blocked=args.slq == "blocked",
        )

        @jax.jit
        def _logdet_vg(params, key, Xs):
            def half_logdet(params):
                p1, p2, p3 = unflatten(params)
                _mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
                noise = constrain(p3["raw_noise"])
                cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
                val, info = logdet_small(
                    lambda v: cov.matvec(v) + noise * v, key
                )
                return -0.5 * val, info

            (val, info), g = jax.value_and_grad(half_logdet, has_aux=True)(params)
            return val, info, g

        def mll_split_value_and_grad(params, key, Xs, ys):
            chol, info_pre = _factor(params, Xs)
            qv, qinfo, qg = _quad_vg(params, chol, Xs, ys)
            keys = jax.random.split(key, slq_host_batches)
            lvs, lgs = [], []
            for k in keys:
                lv_b, _linfo_b, lg_b = _logdet_vg(params, k, Xs)
                lvs.append(lv_b)
                lgs.append(lg_b)
            lv = sum(lvs) / slq_host_batches
            lg = sum(lgs) / slq_host_batches
            if slq_host_batches > 1:
                vals = jnp.stack(lvs)
                std = jnp.std(vals)
                linfo = {
                    "std_abs": std,
                    "std_rel": std / jnp.abs(lv),
                }
            else:
                linfo = {"std_abs": 0.0, "std_rel": 0.0}
            n = len(Xs)
            value = -(qv + lv) / n
            grads = -(qg + lg) / n
            aux = {
                "precondition": info_pre,
                "logpdf": {"logdet": linfo, "solve": qinfo},
            }
            return (value, aux), grads

        # Restarted posterior-mean solve: the eval-time CG at N=400k
        # (atol 1e-2, effectively unbounded iterations) is one long
        # executable; restarting from the running iterate
        # (A dx = b - A x) splits it into bounded chunks with the same
        # fixed point.
        solve_chunk = solvers.pcg_adaptive(
            rtol=0.0, atol=1e-2, maxiter=getattr(args, "cg_maxiter", 1000),
            miniter=2,
        )

        @jax.jit
        def _predict_residual(params, chol, w, Xs, ys):
            p1, p2, p3 = unflatten(params)
            mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
            noise = constrain(p3["raw_noise"])
            cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
            b = ys - _mean_array(mean_fn, Xs)
            return b - (cov.matvec(w) + noise * w)

        @jax.jit
        def _predict_chunk(params, chol, r, Xs):
            p1, p2, p3 = unflatten(params)
            _mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
            noise = constrain(p3["raw_noise"])
            cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
            dw, info = solve_chunk(
                lambda v: cov.matvec(v) + noise * v,
                r,
                P=lambda v: precond.woodbury_solve(chol, v, noise),
            )
            return dw, info

        @jax.jit
        def _predict_cross(params, x, w, Xs):
            p1, p2, _p3 = unflatten(params)
            mean_fn, kernel_fn = prior(params_mean=p1, params_kernel=p2)
            cov = _CovarianceOp(gram_matvec, kernel_fn, Xs)
            return _mean_array(mean_fn, x) + cov.cross_matvec(x, w)

        def predict_mean_split(params, x, Xs, ys, *, restarts=20, atol=1e-2):
            chol, _info = _factor(params, Xs)
            w = jnp.zeros((len(Xs),), Xs.dtype)
            info = {}
            for _ in range(restarts):
                r = _predict_residual(params, chol, w, Xs, ys)
                if float(jnp.linalg.norm(r)) / np.sqrt(len(Xs)) <= atol:
                    break
                dw, info = _predict_chunk(params, chol, r, Xs)
                w = w + dw
            return _predict_cross(params, x, w, Xs), {"solve": info}

    return SimpleNamespace(
        mll_lanczos=mll_lanczos,
        mll_eval=mll_eval,
        predict_mean=predict_mean,
        ps_template=ps_template,
        unflatten=unflatten,
        mesh=mesh,
        constrain=constrain,
        mll_split_value_and_grad=mll_split_value_and_grad,
        predict_mean_split=predict_mean_split,
    )


def run(args, *, script_file, solver_mode: str):
    """Train GP hyperparameters; ``solver_mode`` is 'adaptive' or 'fixed'."""
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(args.seed)
    key, subkey = jax.random.split(key)

    inputs, targets = load_data(args.dataset)
    inputs = jnp.asarray(inputs, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)

    if args.num_data > 0:
        inputs, targets = inputs[: args.num_data], targets[: args.num_data]

    # Subsample so the partition count divides the train split -- and,
    # under --mesh, so the mesh rows axis divides the train split too
    # (train = 4 * coeff * partitions; rounding coeff to a rows-way
    # multiple guarantees it).
    rows_way, _probes_way = parse_mesh(str(getattr(args, "mesh", "1")))
    num_raw = len(inputs)
    coeff = num_raw // (5 * args.num_partitions)
    if rows_way > 1:
        coeff = (coeff // rows_way) * rows_way
    num_data = int(coeff * 5 * args.num_partitions)
    train, test = data_util.split_train_test_shuffle(
        subkey, inputs[:num_data], targets[:num_data], train_fraction=0.8
    )
    (train_x, train_y), (test_x, test_y) = train, test
    print(f"dataset {args.dataset}: train {train_x.shape}, test {test_x.shape}")

    stack = assemble(
        args, n_train=len(train_x), ndim=train_x.shape[-1], solver_mode=solver_mode
    )
    mll_lanczos = stack.mll_lanczos
    mll_eval = stack.mll_eval
    predict_mean = stack.predict_mean
    unflatten = stack.unflatten

    key, subkey = jax.random.split(key)
    ps = exp_util.tree_random_like(subkey, stack.ps_template)
    p_opt, _ = jax.flatten_util.ravel_pytree(ps)

    # NaN-robust: skip updates whose gradients are non-finite (loose-
    # tolerance CG + stochastic logdet can produce occasional bad steps).
    optimizer = optax.apply_if_finite(
        optax.adam(args.learning_rate), max_consecutive_errors=25
    )
    state = optimizer.init(p_opt)
    if getattr(args, "split_step", False):
        value_and_grad = stack.mll_split_value_and_grad
    else:
        value_and_grad = jax.jit(
            jax.value_and_grad(mll_lanczos, argnums=0, has_aux=True)
        )

    ckpt_dir = exp_util.matching_directory(script_file, "results/") + (
        f"checkpoints_{args.name}_{args.dataset}_s{args.seed}"
    )
    first_epoch = 0
    if args.resume:
        restored, step = ckpt_util.restore(ckpt_dir, (p_opt, state, key))
        if restored is not None:
            p_opt, state, key = restored
            first_epoch = step + 1
            print(f"resumed from checkpoint at epoch {step}")

    loss_curve, loss_timestamps = [], []
    cg_errors, cg_numsteps_all, slq_std_rels = [], [], []
    noise_curve, outputscale_curve, notfinite_curve = [], [], []

    start = time.perf_counter()
    for epoch in range(first_epoch, args.num_epochs):
        try:
            key, subkey = jax.random.split(key)
            (value, aux), grads = value_and_grad(p_opt, subkey, train_x, train_y)
            updates, state = optimizer.update(grads, state)
            p_opt = optax.apply_updates(p_opt, updates)

            residual = aux["logpdf"]["solve"]["residual_abs"]
            cg_error = float(jnp.linalg.norm(residual) / jnp.sqrt(len(residual)))
            num_steps = aux["logpdf"]["solve"].get("num_steps", args.num_matvecs)
            loss_curve.append(float(value))
            loss_timestamps.append(time.perf_counter() - start)
            cg_errors.append(cg_error)
            cg_numsteps_all.append(int(num_steps))
            slq_std_rels.append(float(aux["logpdf"]["logdet"]["std_rel"]))
            # Hyperparameter trajectory + skipped-update diagnostics
            # (apply_if_finite silently drops non-finite gradients; make
            # the drop count observable -- NLL-gap study, VERDICT r2 #4).
            _p1, p2_, p3_ = unflatten(p_opt)
            noise_curve.append(float(stack.constrain(p3_["raw_noise"])))
            outputscale_curve.append(float(stack.constrain(p2_["raw_outputscale"])))
            notfinite_curve.append(int(getattr(state, "total_notfinite", 0)))
            print(
                f"epoch {epoch}: loss {float(value):.4f} cg_error {cg_error:.1e} "
                f"cg_steps {int(num_steps)} noise {noise_curve[-1]:.4f} "
                f"skipped {notfinite_curve[-1]}",
                flush=True,
            )
            if args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0:
                ckpt_util.save(ckpt_dir, epoch, (p_opt, state, key))
        except KeyboardInterrupt:
            break

    if getattr(args, "split_step", False):
        predict_mean = stack.predict_mean_split
    predicted, _info = predict_mean(p_opt, test_x, train_x, train_y)
    test_rmse = float(rmse(predicted, target=test_y))
    key, subkey = jax.random.split(key)
    test_nll, _ = mll_eval(p_opt, subkey, test_x, test_y)
    print(f"RMSE {test_rmse:.4f}  NLL {float(test_nll):.4f}")

    directory = exp_util.matching_directory(script_file, "results/")
    os.makedirs(directory, exist_ok=True)
    path = f"{directory}{args.name}_{args.dataset}_s{args.seed}"
    np.save(f"{path}_loss_timestamps.npy", np.asarray(loss_timestamps))
    np.save(f"{path}_loss_curve.npy", np.asarray(loss_curve))
    np.save(f"{path}_cg_errors.npy", np.asarray(cg_errors))
    np.save(f"{path}_cg_numsteps_all.npy", np.asarray(cg_numsteps_all))
    np.save(f"{path}_slq_std_rels.npy", np.asarray(slq_std_rels))
    np.save(f"{path}_noise_curve.npy", np.asarray(noise_curve))
    np.save(f"{path}_outputscale_curve.npy", np.asarray(outputscale_curve))
    np.save(f"{path}_notfinite_curve.npy", np.asarray(notfinite_curve))
    np.save(f"{path}_test_rmses.npy", np.asarray(test_rmse))
    np.save(f"{path}_test_nlls.npy", np.asarray(float(test_nll)))
    # Learned hyperparameters (flat): enables post-hoc re-evaluation
    # (e.g. the NLL estimator study in nll_study.py) without retraining.
    np.save(f"{path}_params_opt.npy", np.asarray(p_opt))
    return test_rmse, float(test_nll)
