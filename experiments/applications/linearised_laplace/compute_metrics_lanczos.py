"""UQ metrics of the linearised-Laplace predictive with Lanczos samples.

TPU-native re-implementation of the reference
``compute_metrics_lanczos.py`` (compute_metrics_lanczos.py:100-171):
NLL / accuracy / confidence / ECE / OOD-AUROC of the Laplace predictive
with Lanczos posterior samples, compared against the MAP predictive.
In-distribution and OOD data are synthetic cluster tasks (ImageNet /
Places365 are unavailable offline).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from callibration import make_data, train_map

from lanczos_adjoints_tpu.models import bnn
from lanczos_adjoints_tpu.utils import exp_util


def auroc(scores_id, scores_ood):
    """Area under the ROC for separating ID (high) from OOD (low) scores."""
    labels = np.concatenate([np.ones_like(scores_id), np.zeros_like(scores_ood)])
    scores = np.concatenate([scores_id, scores_ood])
    order = np.argsort(-scores)
    labels = labels[order]
    tps = np.cumsum(labels)
    fps = np.cumsum(1 - labels)
    tpr = tps / max(tps[-1], 1)
    fpr = fps / max(fps[-1], 1)
    return float(np.trapezoid(tpr, fpr))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--lanczos_rank", type=int, default=20)
    parser.add_argument("--num_samples", type=int, default=16)
    parser.add_argument(
        "--hidden",
        type=str,
        default="",
        help="comma-separated MLP widths (see callibration.py --hidden)",
    )
    parser.add_argument("--data_dim", type=int, default=16)
    parser.add_argument("--num_data", type=int, default=512)
    parser.add_argument("--num_classes", type=int, default=4)
    parser.add_argument("--map_epochs", type=int, default=200)
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()
    print(args)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_init, k_ood, k_sample = jax.random.split(key, 5)
    from callibration import _parse_hidden

    x, y = make_data(
        k_data, num=args.num_data, dim=args.data_dim, num_classes=args.num_classes
    )
    x_ood = 4.0 * jax.random.normal(k_ood, x.shape)  # off-manifold inputs

    init, apply = bnn.model_mlp(
        out_dims=y.shape[-1], activation=jnp.tanh, hidden=_parse_hidden(args.hidden)
    )
    variables = init(k_init, x)
    params_vec, unflatten, _ = bnn.vectorize_nn(apply, variables)
    params_vec, _ = train_map(
        key, apply, params_vec, unflatten, x, y, num_epochs=args.map_epochs
    )
    print(f"n_params={len(params_vec)}")

    kwargs = {
        "loss_single": bnn.loss_training_cross_entropy_single,
        "model_fun": apply,
        "param_unflatten": unflatten,
    }
    gvp = bnn.ggn_vp_parallel(**kwargs)

    def ggn_vp(v):
        out = gvp(v, params_vec, x, y)
        return jax.flatten_util.ravel_pytree(out)[0] + args.alpha * v

    samples = bnn.lanczos_sampler(
        ggn_vp=ggn_vp,
        num_samples=args.num_samples,
        lanczos_rank=args.lanczos_rank,
        key=k_sample,
        params_vec=params_vec,
    )

    @jax.jit
    def predictive_probs(sample_vecs, inputs):
        def probs_one(p):
            return jax.nn.softmax(apply(unflatten(p), inputs), axis=-1)

        return jnp.mean(jax.vmap(probs_one)(sample_vecs), axis=0)

    results = {}
    for name, probs in [
        ("map", jax.nn.softmax(apply(unflatten(params_vec), x), axis=-1)),
        ("laplace", predictive_probs(samples, x)),
    ]:
        nll = bnn.metric_nll(
            logits=jnp.log(probs + 1e-12), labels_hot=y, sum_or_mean_fun=jnp.mean
        )
        acc = bnn.metric_accuracy(probs=probs, labels_hot=y)
        conf = bnn.metric_confidence(probs=probs)
        ece, _ = bnn.metric_ece(probs=probs, labels_hot=y, num_bins=10)
        if name == "map":
            probs_ood = jax.nn.softmax(apply(unflatten(params_vec), x_ood), axis=-1)
        else:
            probs_ood = predictive_probs(samples, x_ood)
        roc = auroc(
            np.asarray(jnp.max(probs, axis=-1)),
            np.asarray(jnp.max(probs_ood, axis=-1)),
        )
        results[name] = {
            "nll": float(nll),
            "accuracy": float(acc),
            "confidence": float(conf),
            "ece": float(ece),
            "ood_auroc": roc,
        }
        print(name, results[name])

    directory = exp_util.matching_directory(__file__, "results/")
    os.makedirs(directory, exist_ok=True)
    import json

    tag = f"s{args.seed}"
    if args.hidden:
        tag += f"_p{len(params_vec)}_rank{args.lanczos_rank}"
    with open(f"{directory}{tag}_metrics.json", "w") as fp:
        json.dump(results, fp, indent=2)
