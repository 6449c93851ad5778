"""BNN baseline estimators: exact / Hutchinson GGN diagonals, last-layer GGN.

Capability parity with reference
``src/matfree_extensions/util/bnn_baselines.py``: ``exact_diagonal``
(bnn_baselines.py:9), ``hutchinson_diagonal`` with control-variate
levels (bnn_baselines.py:107), ``last_layer_ggn`` (bnn_baselines.py:168).
Written against plain pytrees (no tree_math dependency).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def exact_diagonal(model_fn, params, output_dims, x_train, likelihood="classification"):
    """Exact GGN diagonal, accumulated output-by-output, sample-by-sample.

    O(num_outputs * num_data) gradient evaluations -- the brute-force
    oracle the stochastic estimators are compared against.
    """
    params_flat, unflatten = jax.flatten_util.ravel_pytree(params)
    n_params = len(params_flat)

    def model_flat(p_flat, x):
        return model_fn(unflatten(p_flat), x)

    def per_sample_diag(x_single):
        x = x_single[None, ...]
        preds = model_flat(params_flat, x)  # (1, O)

        if likelihood == "classification":
            probs = jax.nn.softmax(preds, axis=-1)[0]
            H = jnp.diag(probs) - jnp.outer(probs, probs)
        elif likelihood == "regression":
            H = 2.0 * jnp.eye(output_dims)
        else:
            msg = f"likelihood={likelihood!r} unsupported"
            raise ValueError(msg)

        def grad_output(o):
            g = jax.grad(lambda p: model_flat(p, x)[0, o])(params_flat)
            return g

        J = jax.vmap(grad_output)(jnp.arange(output_dims))  # (O, n_params)
        # diag(J^T H J) = sum_{o,o'} J_o * H_{oo'} * J_{o'}
        return jnp.einsum("op,oq,qp->p", J, H, J)

    diag = jnp.zeros(n_params)
    for i in range(x_train.shape[0]):
        diag = diag + per_sample_diag(x_train[i])
    return unflatten(diag)


def tree_random_normal_like(key, tree):
    flat, unflatten = jax.flatten_util.ravel_pytree(tree)
    return unflatten(jax.random.normal(key, flat.shape, dtype=flat.dtype))


def tree_random_rademacher_like(key, tree):
    flat, unflatten = jax.flatten_util.ravel_pytree(tree)
    sample = jax.random.rademacher(key, flat.shape, dtype=flat.dtype)
    return unflatten(sample)


def hutchinson_diagonal(
    gvp_fn: Callable,
    params,
    n_samples: int,
    key,
    num_levels: int = 1,
    computation_type: str = "serial",
):
    """Multi-level Hutchinson estimator of diag(G) with control variates.

    Each level refines the running diagonal estimate ``D`` using
    ``E[v * (G v - D v)] = diag(G) - D`` -- the control variate shrinks
    the estimator variance level by level (reference
    bnn_baselines.py:107-165).
    """
    flat, unflatten = jax.flatten_util.ravel_pytree(params)

    def gvp_flat(v_flat):
        out = gvp_fn(v_flat)
        return jax.flatten_util.ravel_pytree(out)[0]

    def level_estimate(diag_running, level_key):
        keys = jax.random.split(level_key, n_samples)

        def single(key_single):
            v = jax.random.rademacher(key_single, flat.shape, dtype=flat.dtype)
            residual = gvp_flat(v) - diag_running * v
            return v * residual

        if computation_type == "parallel":
            samples = jax.vmap(single)(keys)
            correction = jnp.mean(samples, axis=0)
        elif computation_type == "serial":

            def body(carry, key_single):
                return carry + single(key_single), None

            total, _ = jax.lax.scan(body, jnp.zeros_like(flat), keys)
            correction = total / n_samples
        else:
            msg = f"computation_type={computation_type!r} unsupported"
            raise ValueError(msg)
        return diag_running + correction

    diag = jnp.zeros_like(flat)
    for level_key in jax.random.split(key, num_levels):
        diag = level_estimate(diag, level_key)
    return unflatten(diag)


def last_layer_ggn(model_fn, params, x_train, likelihood="classification"):
    """Materialised GGN of the last layer's parameters only.

    ``params`` must be a nested dict whose final Dense layer is the
    lexicographically last leaf group (flax convention).
    """
    flat_all, unflatten_all = jax.flatten_util.ravel_pytree(params)

    # Identify the last layer by flax naming convention.
    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    last_layer_name = max(
        {jax.tree_util.keystr(path[:-2] or path[:1]) for path, _ in leaves_with_path}
    )
    mask_tree = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.ones_like(leaf)
        if jax.tree_util.keystr(path[:-2] or path[:1]) == last_layer_name
        else jnp.zeros_like(leaf),
        params,
    )
    mask = jax.flatten_util.ravel_pytree(mask_tree)[0] > 0
    (idx,) = jnp.nonzero(mask)

    def model_last(p_last, x):
        p_full = flat_all.at[idx].set(p_last)
        return model_fn(unflatten_all(p_full), x)

    p_last = flat_all[idx]
    preds = model_last(p_last, x_train)  # (N, O)
    J = jax.jacfwd(lambda p: model_last(p, x_train))(p_last)  # (N, O, k)

    if likelihood == "classification":
        probs = jax.nn.softmax(preds, axis=-1)
        H = jax.vmap(lambda pr: jnp.diag(pr) - jnp.outer(pr, pr))(probs)
    elif likelihood == "regression":
        H = jnp.broadcast_to(
            2.0 * jnp.eye(preds.shape[-1]), (preds.shape[0], *([preds.shape[-1]] * 2))
        )
    else:
        msg = f"likelihood={likelihood!r} unsupported"
        raise ValueError(msg)

    ggn = jnp.einsum("nok,noq,nql->kl", J, H, J)
    return ggn, idx
