"""Linearised-Laplace prior-precision calibration via SLQ logdet.

TPU-native re-implementation of the reference
``imagenet_callibration.py`` (imagenet_callibration.py:62-92):
optimise the prior precision alpha by gradient descent on the Laplace
marginal likelihood, whose logdet term is an SLQ estimate over the
implicit GGN matvec of the network.

The reference used a pretrained VAN-tiny on ImageNet-1k; neither the
weights nor ImageNet are available offline, so the default data source
is CIFAR-10 (if cached) or a synthetic classification task, with an MLP
trained in-script -- the calibration pipeline (GGN matvec -> SLQ ->
RMSprop on alpha) is identical.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanczos_adjoints_tpu.models import bnn
from lanczos_adjoints_tpu.utils import exp_util


def make_data(key, *, num=512, dim=16, num_classes=4):
    """Synthetic classification clusters (offline stand-in)."""
    keys = jax.random.split(key, num_classes)
    centers = jax.vmap(lambda k: 2.0 * jax.random.normal(k, (dim,)))(keys)
    labels = jnp.arange(num) % num_classes
    noise = jax.random.normal(key, (num, dim))
    x = centers[labels] + noise
    y = jax.nn.one_hot(labels, num_classes)
    return x, y


def _parse_hidden(spec):
    """'2048,1536' -> (2048, 1536); '' -> the parity default."""
    if not spec:
        return (50, 50, 5, 5)
    return tuple(int(w) for w in spec.split(","))


def train_map(key, model_fn, params_vec, unflatten, x, y, *, num_epochs=200):
    """Quick MAP training of the network before calibration."""

    @jax.jit
    def loss_fn(p):
        logits = model_fn(unflatten(p), x)
        return bnn.loss_training_cross_entropy(logits, y)

    optimizer = optax.adam(1e-2)
    state = optimizer.init(params_vec)

    @jax.jit
    def step(p, state):
        value, grads = jax.value_and_grad(loss_fn)(p)
        updates, state = optimizer.update(grads, state)
        return optax.apply_updates(p, updates), state, value

    for _ in range(num_epochs):
        params_vec, state, value = step(params_vec, state)
    return params_vec, float(value)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num_epochs", type=int, default=50)
    parser.add_argument("--lanczos_rank", type=int, default=10)
    parser.add_argument("--slq_num_samples", type=int, default=10)
    parser.add_argument(
        "--slq_num_batches",
        type=int,
        default=1,
        help="sequential probe batches (must divide slq_num_samples): "
        "a pure memory knob -- the total probe count is fixed and the "
        "peak working set is one batch's (probes/batch, rank+1, "
        "n_params) Lanczos basis, both passes (remat per batch)",
    )
    parser.add_argument("--learning_rate", type=float, default=1e-1)
    parser.add_argument(
        "--hidden",
        type=str,
        default="",
        help="comma-separated MLP widths; e.g. '2048,1536' reaches the "
        "reference's VAN-tiny parameter class (~4M params, ref "
        "imagenet_callibration.py:30-42) on synthetic data",
    )
    parser.add_argument("--data_dim", type=int, default=16)
    parser.add_argument("--num_data", type=int, default=512)
    parser.add_argument("--num_classes", type=int, default=4)
    parser.add_argument("--map_epochs", type=int, default=200)
    parser.add_argument(
        "--time",
        action="store_true",
        help="R-slope time the calibration value_and_grad step",
    )
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()
    print(args)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_init = jax.random.split(key, 3)
    x, y = make_data(
        k_data, num=args.num_data, dim=args.data_dim, num_classes=args.num_classes
    )

    init, apply = bnn.model_mlp(
        out_dims=y.shape[-1], activation=jnp.tanh, hidden=_parse_hidden(args.hidden)
    )
    variables = init(k_init, x)
    params_vec, unflatten, _ = bnn.vectorize_nn(apply, variables)

    params_vec, map_loss = train_map(
        key, apply, params_vec, unflatten, x, y, num_epochs=args.map_epochs
    )
    print(f"MAP training loss: {map_loss:.4f}, n_params={len(params_vec)}")

    loss = bnn.callibration_loss(
        apply,
        unflatten,
        jnp.exp,
        len(params_vec),
        lanczos_rank=args.lanczos_rank,
        slq_num_samples=args.slq_num_samples,
        slq_num_batches=args.slq_num_batches,
    )
    value_and_grad = jax.jit(jax.value_and_grad(loss, argnums=0))

    log_alpha = jnp.asarray(0.0)
    optimizer = optax.rmsprop(args.learning_rate)
    state = optimizer.init(log_alpha)

    curve = []
    for epoch in range(args.num_epochs):
        key, subkey = jax.random.split(key)
        value, grad = value_and_grad(log_alpha, params_vec, x, y, subkey)
        updates, state = optimizer.update(grad, state)
        log_alpha = optax.apply_updates(log_alpha, updates)
        curve.append(float(value))
        if epoch % 10 == 0:
            print(
                f"epoch {epoch}: loss {float(value):.2f} "
                f"alpha {float(jnp.exp(log_alpha)):.4f}",
                flush=True,
            )

    print(f"calibrated alpha: {float(jnp.exp(log_alpha)):.4f}")
    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    tag = f"s{args.seed}"
    if args.hidden:
        tag += f"_p{len(params_vec)}_rank{args.lanczos_rank}"
    np.save(f"{directory}{tag}_curve.npy", np.asarray(curve))
    np.save(f"{directory}{tag}_alpha.npy", float(jnp.exp(log_alpha)))

    if args.time:
        from lanczos_adjoints_tpu.utils.timing import slope_time

        k0 = jax.random.PRNGKey(0)

        def timed(a):
            v, g = value_and_grad(a, params_vec, x, y, k0)
            return 1e-20 * (v + g)  # scalar in, scalar out (feedback-safe)

        secs = slope_time(timed, log_alpha)
        print(
            f"calibration value_and_grad: {secs*1e3:.2f} ms/step "
            f"(n_params={len(params_vec)}, rank={args.lanczos_rank}, "
            f"samples={args.slq_num_samples})"
        )
        np.save(f"{directory}{tag}_step_seconds.npy", np.asarray(secs))
