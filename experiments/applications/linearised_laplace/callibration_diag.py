"""Laplace calibration with the Hutchinson-diagonal logdet.

TPU-native re-implementation of the reference
``imagenet_callibration_diag.py`` (imagenet_callibration_diag.py:40-57):
same pipeline as callibration.py but the logdet term is
``sum(log(diag(GGN) + alpha))`` with a multi-level Hutchinson diagonal
estimate (control variates) instead of SLQ.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from callibration import make_data, train_map

from lanczos_adjoints_tpu.models import bnn
from lanczos_adjoints_tpu.utils import exp_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num_epochs", type=int, default=50)
    parser.add_argument("--hutchinson_samples", type=int, default=20)
    parser.add_argument("--num_levels", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-1)
    args = parser.parse_args()
    print(args)

    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_init = jax.random.split(key, 3)
    x, y = make_data(k_data)

    init, apply = bnn.model_mlp(out_dims=y.shape[-1], activation=jnp.tanh)
    variables = init(k_init, x)
    params_vec, unflatten, _ = bnn.vectorize_nn(apply, variables)
    params_vec, map_loss = train_map(key, apply, params_vec, unflatten, x, y)
    print(f"MAP training loss: {map_loss:.4f}")

    loss = bnn.callibration_loss_diagonal(
        apply,
        unflatten,
        jnp.exp,
        args.hutchinson_samples,
        args.num_levels,
        len(params_vec),
    )
    value_and_grad = jax.jit(jax.value_and_grad(loss, argnums=0))

    log_alpha = jnp.asarray(0.0)
    optimizer = optax.rmsprop(args.learning_rate)
    state = optimizer.init(log_alpha)

    curve = []
    for epoch in range(args.num_epochs):
        value, grad = value_and_grad(log_alpha, params_vec, x, y)
        updates, state = optimizer.update(grad, state)
        log_alpha = optax.apply_updates(log_alpha, updates)
        curve.append(float(value))
        if epoch % 10 == 0:
            print(
                f"epoch {epoch}: loss {float(value):.2f} "
                f"alpha {float(jnp.exp(log_alpha)):.4f}",
                flush=True,
            )

    print(f"calibrated alpha (diag): {float(jnp.exp(log_alpha)):.4f}")
    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    np.save(f"{directory}s{args.seed}_curve.npy", np.asarray(curve))
    np.save(f"{directory}s{args.seed}_alpha.npy", float(jnp.exp(log_alpha)))
