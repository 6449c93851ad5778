"""Grid-search the calibration loss over prior precisions, and plot it.

Parity with reference ``plot_callibration_loss.py``
(plot_callibration_loss.py:44-77): evaluate the Laplace marginal-
likelihood calibration loss on a fixed grid of log-precisions
``log_alpha`` and persist the curve -- plus the figure the reference's
filename promises (loss vs alpha, with the gradient-calibrated optimum
from ``callibration.py`` overlaid when its artifact exists).

The reference used VAN-tiny/ImageNet; offline, the same pipeline runs
on the in-script MLP + synthetic clusters (see ``callibration.py``).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from callibration import make_data, train_map

from lanczos_adjoints_tpu.models import bnn
from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument(
        "--log_alphas",
        type=float,
        nargs="+",
        default=[-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0],
    )
    parser.add_argument("--num_loss_samples", type=int, default=5)
    args = parser.parse_args()
    print(args)

    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_init = jax.random.split(key, 3)
    x, y = make_data(k_data)

    init, apply = bnn.model_mlp(out_dims=y.shape[-1], activation=jnp.tanh)
    variables = init(k_init, x)
    params_vec, unflatten, _ = bnn.vectorize_nn(apply, variables)
    params_vec, map_loss = train_map(key, apply, params_vec, unflatten, x, y)
    print(f"MAP training loss: {map_loss:.4f}, n_params={len(params_vec)}")

    loss = bnn.callibration_loss(apply, unflatten, jnp.exp, len(params_vec))
    loss_jit = jax.jit(loss)

    losses, stds = [], []
    for log_alpha in args.log_alphas:
        vals = []
        for _ in range(args.num_loss_samples):
            key, subkey = jax.random.split(key)
            vals.append(
                float(loss_jit(jnp.asarray(log_alpha), params_vec, x, y, subkey))
            )
        losses.append(float(np.mean(vals)))
        stds.append(float(np.std(vals)))
        print(
            f"alpha {float(jnp.exp(log_alpha)):.3f}: "
            f"loss {losses[-1]:.2f} +- {stds[-1]:.2f}"
        )

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    np.savez(
        f"{directory}s{args.seed}_gridsearch.npz",
        log_alphas=np.asarray(args.log_alphas),
        losses=np.asarray(losses),
        stds=np.asarray(stds),
    )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 3.2), constrained_layout=True)
    alphas = np.exp(np.asarray(args.log_alphas))
    ax.errorbar(alphas, losses, yerr=stds, marker="o", lw=1.2, capsize=3)
    ax.set_xscale("log")
    ax.set_xlabel(r"prior precision $\alpha$")
    ax.set_ylabel("calibration loss (-log marginal)")
    ax.set_title("Laplace calibration loss vs prior precision")

    # Overlay the gradient-calibrated optimum if callibration.py ran.
    calibrated = directory.replace(
        "plot_callibration_loss", "callibration"
    ) + f"s{args.seed}_alpha.npy"
    if os.path.exists(calibrated):
        alpha_star = float(np.load(calibrated))
        ax.axvline(alpha_star, color="tab:red", ls="--", lw=1.0)
        ax.annotate(
            f"calibrated {alpha_star:.2f}",
            (alpha_star, max(losses)),
            color="tab:red",
            fontsize=8,
            rotation=90,
            va="top",
            ha="right",
        )

    directory_fig = exp_util.matching_directory(__file__, "figures/")
    os.makedirs(directory_fig, exist_ok=True)
    fig.savefig(f"{directory_fig}s{args.seed}_callibration_loss.pdf")
    fig.savefig(f"{directory_fig}s{args.seed}_callibration_loss.png", dpi=150)
    print(f"wrote {directory_fig}s{args.seed}_callibration_loss.[pdf|png]")
