"""GPyTorch baseline driver (matched-budget settings; dependency-gated).

Counterpart of the reference's GPyTorch comparison script
(``optim_logml_gpytorch_adaptive.py:80-110`` for the matched-budget
``gpytorch.settings`` context, ``:104-118`` for the KeOps Matern-3/2
model, ``:144-178`` for the Adam loop): trains an exact GP with
GPyTorch's conjugate-gradient/SLQ machinery under EXACTLY the budget
knobs our adjoint driver exposes (``--rank_precon``, ``--cg_tol``,
``--num_samples``, ``--num_matvecs``), so the two curves are
apples-to-apples.

gpytorch/torch-cuda are NOT installed in this offline TPU environment,
so the script gates on import and exits with a clear message instead of
crashing -- run it on a CUDA host with gpytorch installed to regenerate
the baseline curves.  The reference's stored V100 curves are imported
with provenance under ``results/.../train/reference_baselines/`` and
consumed by ``show_table.py --compare_reference``.
"""

import argparse
import os
import sys
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--num_partitions", type=int, required=True)
    parser.add_argument("--rank_precon", type=int, required=True)
    parser.add_argument("--num_matvecs", type=int, required=True)
    parser.add_argument("--num_samples", type=int, required=True)
    parser.add_argument("--num_epochs", type=int, required=True)
    parser.add_argument("--cg_tol", type=float, required=True)
    return parser.parse_args()


def budget_settings(cfg, args, *, cg_tol):
    """The reference's matched-budget context stack (ref :80-92, :185-197).

    One context per solver knob our adjoint driver also exposes; CIQ and
    deterministic probes off, all fast_computations on, zero jitter --
    i.e. GPyTorch is configured to do the same work per MLL evaluation
    as ``assemble()``'s Lanczos/CG stack.
    """
    return (
        cfg.max_preconditioner_size(args.rank_precon),
        cfg.cg_tolerance(cg_tol),
        cfg.num_trace_samples(args.num_samples),
        cfg.max_lanczos_quadrature_iterations(args.num_matvecs),
        cfg.ciq_samples(False),
        cfg.deterministic_probes(False),
        cfg.skip_logdet_forward(False),
        cfg.fast_computations(True, True, True),
        cfg.max_root_decomposition_size(args.num_matvecs),
        cfg.min_preconditioning_size(10),
        cfg.tridiagonal_jitter(0.0),
    )


def main(args):
    try:
        import contextlib

        import gpytorch
        import gpytorch.settings as cfg
        import torch
    except ImportError as err:
        print(
            f"gpytorch baseline unavailable in this environment ({err}); "
            "run on a CUDA host with gpytorch installed. The reference's "
            "stored V100 curves live under results/.../reference_baselines/."
        )
        return 0

    from _common import load_data

    torch.manual_seed(args.seed)
    inputs_np, targets_np = load_data(args.dataset)
    inputs = torch.from_numpy(np.asarray(inputs_np).copy())
    targets = torch.from_numpy(np.asarray(targets_np).copy())
    idx = torch.randperm(len(inputs))
    inputs, targets = inputs[idx], targets[idx]

    # Same subsample-to-partition-multiple and 0.8 split as the adjoint
    # driver (_common.py::run), so N_train matches run-for-run.
    coeff = len(inputs) // (5 * args.num_partitions)
    num_data = int(coeff * 5 * args.num_partitions)
    inputs, targets = inputs[:num_data], targets[:num_data]
    n_train = int(0.8 * len(inputs))
    train_x = inputs[:n_train].contiguous()
    train_y = targets[:n_train].contiguous()
    test_x = inputs[n_train:].contiguous()
    test_y = targets[n_train:].contiguous()

    device = torch.device("cuda:0" if torch.cuda.is_available() else "cpu")
    train_x, train_y = train_x.to(device), train_y.to(device)
    test_x, test_y = test_x.to(device), test_y.to(device)
    use_keops = device.type == "cuda"

    class ExactGP(gpytorch.models.ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            ndims = tx.size(-1)
            if use_keops:
                base = gpytorch.kernels.keops.MaternKernel(nu=1.5, ard_num_dims=ndims)
            else:  # CPU fallback: same kernel, no KeOps
                base = gpytorch.kernels.MaternKernel(nu=1.5, ard_num_dims=ndims)
            self.covar_module = gpytorch.kernels.ScaleKernel(base)
            self.mean_module = gpytorch.means.ConstantMean()

        def forward(self, x):
            return gpytorch.distributions.MultivariateNormal(
                self.mean_module(x), self.covar_module(x)
            )

    likelihood = gpytorch.likelihoods.GaussianLikelihood(
        noise_constraint=gpytorch.constraints.GreaterThan(1e-4)
    ).to(device)
    model = ExactGP(train_x, train_y, likelihood).to(device)
    model.initialize(
        **{
            "likelihood.noise_covar.raw_noise": torch.randn(()).to(device),
            "covar_module.base_kernel.raw_lengthscale": torch.randn(
                (train_x.size(-1),)
            ).to(device),
            "covar_module.raw_outputscale": torch.randn(()).to(device),
            "mean_module.raw_constant": torch.randn(()).to(device),
        }
    )

    model.train(), likelihood.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=0.05)
    mll = gpytorch.mlls.ExactMarginalLogLikelihood(likelihood, model)

    loss_values, loss_timestamps = [], []
    with contextlib.ExitStack() as stack:
        for ctx in budget_settings(cfg, args, cg_tol=args.cg_tol):
            stack.enter_context(ctx)
        t0 = time.perf_counter()
        for epoch in range(args.num_epochs):
            optimizer.zero_grad()
            loss = -mll(model(train_x), train_y)
            loss.backward()
            optimizer.step()
            loss_values.append(float(loss))
            loss_timestamps.append(time.perf_counter() - t0)
            if epoch % 10 == 0:
                print(f"epoch {epoch}: loss {float(loss):.4f}", flush=True)

    model.eval(), likelihood.eval()
    with contextlib.ExitStack() as stack:
        stack.enter_context(torch.no_grad())
        # Tight CG at evaluation, like the reference (ref :186).
        for ctx in budget_settings(cfg, args, cg_tol=1e-4):
            stack.enter_context(ctx)
        stack.enter_context(cfg.skip_posterior_variances())
        mean = likelihood(model(test_x)).mean
        rmse = float(mean.sub(test_y).pow(2).mean().sqrt())
    print("RMSE:", rmse)

    from lanczos_adjoints_tpu.utils import exp_util

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    path = f"{directory}{args.name}_{args.dataset}_s{args.seed}"
    np.save(f"{path}_loss_values.npy", np.asarray(loss_values))
    np.save(f"{path}_loss_timestamps.npy", np.asarray(loss_timestamps))
    np.save(f"{path}_rmse.npy", np.asarray(rmse))
    return 0


if __name__ == "__main__":
    sys.exit(main(parse_args()))
