"""BNN/GGN utilities: operators agree, metrics behave, calibration runs."""

import jax
import jax.numpy as jnp
import pytest

from lanczos_adjoints_tpu.models import bnn, bnn_baselines


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 3))
    labels = jax.nn.one_hot(jnp.arange(8) % 2, 2)

    init, apply = bnn.model_mlp(out_dims=2, activation=jnp.tanh)
    variables = init(jax.random.PRNGKey(1), x)
    params_vec, unflatten, _model_fn_vec = bnn.vectorize_nn(apply, variables)
    # model_fun convention: takes the unflattened parameter tree.
    return x, labels, params_vec, unflatten, apply


def test_ggn_vp_variants_agree(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    loss_single = bnn.loss_training_cross_entropy_single

    kwargs = {
        "loss_single": loss_single,
        "model_fun": model_fn,
        "param_unflatten": unflatten,
    }
    v = jax.random.normal(jax.random.PRNGKey(2), params_vec.shape)

    gvp_par = bnn.ggn_vp_parallel(**kwargs)(v, params_vec, x, labels)
    gvp_run = bnn.ggn_vp_running(**kwargs)(v, params_vec, x, labels)
    flat_par = jax.flatten_util.ravel_pytree(gvp_par)[0]
    flat_run = jax.flatten_util.ravel_pytree(gvp_run)[0]
    assert jnp.allclose(flat_par, flat_run, atol=1e-4, rtol=1e-4)

    # Against the materialised GGN (alpha=0).
    ggn = bnn.ggn_full(**kwargs)(0.0, params_vec, x, labels)
    assert jnp.allclose(ggn @ v, flat_par, atol=1e-3, rtol=1e-3)


def test_metrics(setup):
    probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    acc = bnn.metric_accuracy(probs=probs, labels_hot=labels)
    assert jnp.allclose(acc, 2.0 / 3.0)

    logits = jnp.log(probs)
    nll = bnn.metric_nll(logits=logits, labels_hot=labels)
    assert nll > 0

    conf = bnn.metric_confidence(probs=probs)
    assert jnp.allclose(conf, jnp.mean(jnp.asarray([0.9, 0.8, 0.6])))

    ce_avg, ce_max = bnn.metric_ece(probs=probs, labels_hot=labels, num_bins=5)
    assert 0 <= float(ce_avg) <= 1
    assert float(ce_max) >= float(ce_avg) - 1e-6


def test_solver_logdet_slq_matches_dense(setup):
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (6, 6))
    M = W @ W.T / 6 + jnp.eye(6)

    logdet_dense = bnn.solver_logdet_dense()(M)
    logdet_slq = bnn.solver_logdet_slq(
        lanczos_rank=6, slq_num_samples=1000, slq_num_batches=2
    )(M, jax.random.PRNGKey(1))
    assert jnp.allclose(logdet_slq, logdet_dense, rtol=0.1, atol=0.2)


def test_calibration_loss_runs_and_differentiates(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    loss = bnn.callibration_loss(model_fn, unflatten, jnp.exp, len(params_vec))
    value, grad = jax.value_and_grad(loss)(
        jnp.asarray(0.0), params_vec, x, labels, jax.random.PRNGKey(0)
    )
    assert jnp.isfinite(value)
    assert jnp.isfinite(grad)


def test_sampler_lanczos_covariance(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    kwargs = {
        "loss_single": bnn.loss_training_cross_entropy_single,
        "model_fun": model_fn,
        "param_unflatten": unflatten,
    }
    ggn_fun = bnn.ggn_full(**kwargs)
    sampler = bnn.sampler_lanczos(ggn_fun=ggn_fun, num=4, lanczos_rank=10)
    draws = sampler(jax.random.PRNGKey(3), 1.0, params_vec, x, labels)
    assert draws.shape == (4, len(params_vec))
    assert jnp.all(jnp.isfinite(draws))


def test_exact_diagonal_matches_full_ggn(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    kwargs = {
        "loss_single": bnn.loss_training_cross_entropy_single,
        "model_fun": model_fn,
        "param_unflatten": unflatten,
    }
    ggn = bnn.ggn_full(**kwargs)(0.0, params_vec, x, labels)

    diag_tree = bnn_baselines.exact_diagonal(
        model_fn, unflatten(params_vec), 2, x, likelihood="classification"
    )
    diag = jax.flatten_util.ravel_pytree(diag_tree)[0]
    assert jnp.allclose(diag, jnp.diag(ggn), atol=1e-3, rtol=1e-2)


def test_hutchinson_diagonal_approximates(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    kwargs = {
        "loss_single": bnn.loss_training_cross_entropy_single,
        "model_fun": model_fn,
        "param_unflatten": unflatten,
    }
    ggn = bnn.ggn_full(**kwargs)(0.0, params_vec, x, labels)

    gvp = bnn.ggn_vp_parallel(**kwargs)

    def gvp_flat(v):
        out = gvp(v, params_vec, x, labels)
        return jax.flatten_util.ravel_pytree(out)[0]

    diag_tree = bnn_baselines.hutchinson_diagonal(
        gvp_fn=gvp_flat,
        params=unflatten(params_vec),
        n_samples=300,
        key=jax.random.PRNGKey(0),
        num_levels=2,
        computation_type="serial",
    )
    diag = jax.flatten_util.ravel_pytree(diag_tree)[0]
    true_diag = jnp.diag(ggn)
    # Stochastic estimate: coarse agreement in norm.
    rel = jnp.linalg.norm(diag - true_diag) / jnp.linalg.norm(true_diag)
    assert rel < 0.5, rel


def test_predictive_posterior_loglikelihood(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    kwargs = {
        "loss_single": bnn.loss_training_cross_entropy_single,
        "model_fun": model_fn,
        "param_unflatten": unflatten,
    }
    ggn = bnn.ggn_full(**kwargs)(1.0, params_vec, x, labels)

    eval_logprob = bnn.predictive_posterior_loglikelihood(
        model_apply=model_fn,
        unflatten=unflatten,
        logpdf=bnn.logpdf_eigh(),
        ggn_fun=lambda v: ggn @ v,
    )
    value, _info = eval_logprob(params_vec, x[:2], labels[:2])
    assert jnp.isfinite(value)


def test_last_layer_ggn(setup):
    x, labels, params_vec, unflatten, model_fn = setup
    ggn_last, idx = bnn_baselines.last_layer_ggn(
        model_fn, unflatten(params_vec), x, likelihood="classification"
    )
    assert ggn_last.shape == (len(idx), len(idx))
    eigvals = jnp.linalg.eigvalsh(ggn_last)
    assert jnp.all(eigvals > -1e-5)  # PSD


def test_ggn_vp_dataloader_with_torch_loader():
    """Stream the GGN matvec over a real torch DataLoader.

    Reference ggn_vp_dataloader (bnn_util.py:325-346) was only ever run
    against torchvision pipelines; torch-cpu is available here, so pin
    the streamed accumulation against the single-batch batched operator
    on the full data.
    """
    torch = pytest.importorskip("torch")
    import numpy as np

    from lanczos_adjoints_tpu.utils.data import numpy_collate_fn

    key = jax.random.PRNGKey(0)
    kx, ki, kv = jax.random.split(key, 3)
    num, dim, classes = 64, 6, 3
    x = jax.random.normal(kx, (num, dim), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(num) % classes, classes)

    init, apply = bnn.model_mlp(out_dims=classes, activation=jnp.tanh)
    params_vec, unflatten, _ = bnn.vectorize_nn(apply, init(ki, x))

    dataset = [
        (np.asarray(x[i]), np.asarray(y[i]))
        for i in range(num)
    ]
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=16, shuffle=False, collate_fn=numpy_collate_fn
    )

    gvp_stream = bnn.ggn_vp_dataloader(
        params_vec,
        loss_single=bnn.loss_training_cross_entropy_single,
        model_fun=apply,
        param_unflatten=unflatten,
        data_loader=loader,
    )
    gvp_full = bnn.ggn_vp(
        loss_single=bnn.loss_training_cross_entropy_single,
        model_fun=apply,
        param_unflatten=unflatten,
    )
    v = jax.random.normal(kv, params_vec.shape, jnp.float32)
    streamed = gvp_stream(v)
    full = gvp_full(v, params_vec, x, y)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(full), rtol=1e-4, atol=1e-5
    )
