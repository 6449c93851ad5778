"""BNN / GGN Laplace utilities.

Capability parity with reference ``src/matfree_extensions/util/bnn_util.py``:
Flax MLP (bnn_util.py:21), UQ metrics (bnn_util.py:43-103), losses
(bnn_util.py:106-151), logdet solvers (bnn_util.py:155-203), GGN
matvec factories (bnn_util.py:218-358), posterior samplers
(bnn_util.py:361-409), vectorisation helpers (bnn_util.py:502-546),
memory-lean jacobians and eigh logpdfs (bnn_util.py:581-627), the
linearised-Laplace predictives (bnn_util.py:630-683), and the
calibration losses (bnn_util.py:433-499).

Fixes the reference's latent break: ``bnn_util.py:15`` imports a module
(``gp_util_linalg``) that does not exist; the CG solver it expects
(``krylov_solve_cg_fixed_step_reortho``) is a real component here
(``lanczos_adjoints_tpu.solvers``).

TPU notes: ``ggn_vp_parallel`` is the MXU-friendly per-sample
linearise/transpose form (two network passes per matvec, vmapped over
the batch); ``ggn_vp_running`` is the sequential low-memory form.
"""

import functools
import warnings
from typing import Callable

import jax
import jax.numpy as jnp

from lanczos_adjoints_tpu.krylov import lanczos
from lanczos_adjoints_tpu.models.bnn_baselines import hutchinson_diagonal
from lanczos_adjoints_tpu.solvers import cg as _cg
from lanczos_adjoints_tpu.trace.hutchinson import (
    hutchinson as _hutchinson,
    sampler_rademacher as _sampler_rademacher,
)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def model_mlp(*, out_dims, activation: Callable, hidden=(50, 50, 5, 5)):
    """Flax MLP (reference bnn_util.py:21-40, widths there fixed).

    ``hidden`` widths are configurable beyond the reference so the GGN
    + SLQ stack can be exercised at the reference's VAN-tiny parameter
    scale (millions of weights) without torchvision/ImageNet.
    """
    import flax.linen

    class _MLP(flax.linen.Module):
        out_dims: int
        activation: Callable

        @flax.linen.compact
        def __call__(self, x):
            x = x.reshape((x.shape[0], -1))
            for width in hidden:
                x = flax.linen.Dense(width)(x)
                x = self.activation(x)
            return flax.linen.Dense(self.out_dims)(x)

    model = _MLP(out_dims=out_dims, activation=activation)
    return model.init, model.apply


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def metric_accuracy(*, probs, labels_hot):
    assert probs.ndim == 2 and labels_hot.ndim == 2
    acc = jnp.argmax(probs, axis=-1) == jnp.argmax(labels_hot, axis=-1)
    return jnp.mean(acc, axis=-1)


def metric_nll(*, logits, labels_hot, sum_or_mean_fun=jnp.sum):
    assert logits.ndim == 2 and labels_hot.ndim == 2
    logprobs = jax.nn.log_softmax(logits)
    nll = jnp.sum(labels_hot * logprobs, axis=-1)
    return -sum_or_mean_fun(nll, axis=0)


def metric_confidence(*, probs):
    assert probs.ndim == 2
    return jnp.mean(jnp.max(probs, axis=-1), axis=0)


def metric_ece(*, probs, labels_hot, num_bins):
    """Expected calibration error (weighted average and max over bins).

    Vectorised with masked segment means (jit-compatible, unlike the
    reference's Python-loop version at bnn_util.py:64-103) but returns
    the same (weighted-average, max) pair over non-empty bins.
    """
    _, bins = jnp.histogram(probs, bins=num_bins, range=(0, 1))

    preds = probs.argmax(axis=1)
    labels = labels_hot.argmax(axis=1)
    confs = jnp.max(probs, axis=1)
    # digitize returns 1..num_bins for in-range values (and num_bins+1
    # for conf == 1.0 exactly); shift to 0-based and clamp so the top
    # bin keeps its members.  The reference compares the 1-based index
    # against 0-based bin ids (bnn_util.py:71-82), which silently drops
    # bin boundaries' most-confident samples -- fixed here, divergence
    # documented in COMPONENTS.md.
    conf_idxs = jnp.clip(jnp.digitize(confs, bins=bins) - 1, 0, num_bins - 1)

    bin_ids = jnp.arange(num_bins)
    member = conf_idxs[None, :] == bin_ids[:, None]  # (num_bins, n)
    counts = member.sum(axis=1)
    safe_counts = jnp.maximum(counts, 1)

    accs = (member * (preds == labels)[None, :]).sum(axis=1) / safe_counts
    mean_confs = (member * confs[None, :]).sum(axis=1) / safe_counts

    nonempty = counts > 0
    ce = jnp.abs(mean_confs - accs)
    weights = jnp.where(nonempty, counts, 0)
    weights = weights / jnp.maximum(weights.sum(), 1)
    ce_avg = jnp.sum(jnp.where(nonempty, ce * weights, 0.0))
    ce_max = jnp.max(jnp.where(nonempty, ce, -jnp.inf))
    return ce_avg, ce_max


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def loss_training_cross_entropy(logits, labels_hot):
    loss = jax.vmap(loss_training_cross_entropy_single)(logits, labels_hot)
    return jnp.mean(loss, axis=0)


def loss_training_cross_entropy_single(logits, labels_hot):
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(logprobs * labels_hot, axis=-1)


def loss_calibration(*, ggn_fun, hyperparam_unconstrain, logdet_fun):
    """Negative Laplace log-marginal for prior-precision calibration."""

    def loss(a, variables, x_train, y_train, *logdet_params):
        alpha = hyperparam_unconstrain(a)
        log_prior = len(variables) / 2 * jnp.log(alpha) - 0.5 * alpha * jnp.dot(
            variables, variables
        )
        M = ggn_fun(alpha, variables, x_train, y_train)
        logdet = logdet_fun(M, *logdet_params)
        return -(log_prior - 0.5 * logdet)

    return loss


def loss_log_prob_like_in_redux(*, ggn_fun, hyperparam_unconstrain, logdet_fun):
    def loss(a, variables, x_train, y_train, *logdet_params):
        alpha = hyperparam_unconstrain(a)
        M = ggn_fun(alpha, variables, x_train, y_train)
        logdet = logdet_fun(M, *logdet_params)
        tmp1 = -len(variables) / 2 * jnp.log(2 * jnp.pi) + logdet / 2
        return tmp1 - jnp.dot(variables, variables) / 2

    return loss


# ---------------------------------------------------------------------------
# Logdet solvers
# ---------------------------------------------------------------------------


def solver_logdet_dense():
    def logdet(M: jax.Array):
        _sign, value = jnp.linalg.slogdet(M)
        return value

    return logdet


def slq_log_clipped(*, clip_value=1.0):
    def log(x):
        eps = jnp.finfo(x.dtype).eps
        return jnp.log(jnp.where(x < eps, clip_value, x))

    return log


def _split_batches(num_samples: int, num_batches: int) -> int:
    """Probes per batch when ``num_batches`` *divides* the probe total.

    ``slq_num_batches`` is a pure memory knob: the estimator always
    draws ``slq_num_samples`` probes in total, vmapped ``per_batch`` at
    a time so one batch's Lanczos basis ``(per_batch, rank+1, n)`` is
    the peak working set.  (Round-4 semantics change: batches used to
    *multiply* the probe count, which silently scaled both cost and
    memory; a rank-50 run on the 3.7M-param GGN requested 100 probes
    and an 82 GB backward residual.)
    """
    if num_samples % num_batches:
        msg = (
            f"slq_num_samples={num_samples} must be divisible by "
            f"slq_num_batches={num_batches}"
        )
        raise ValueError(msg)
    global _WARNED_BATCH_SEMANTICS
    if num_batches > 1 and not _WARNED_BATCH_SEMANTICS:
        _WARNED_BATCH_SEMANTICS = True
        warnings.warn(
            "slq_num_batches now DIVIDES slq_num_samples (total probes "
            f"fixed at {num_samples}, {num_samples // num_batches} per "
            "batch); it previously multiplied them. Configs tuned against "
            "the old semantics draw fewer probes and higher variance.",
            stacklevel=3,
        )
    return num_samples // num_batches


_WARNED_BATCH_SEMANTICS = False


def _slq_mean(integrand, sampler, key, num_batches, *args):
    """Average a Hutchinson-SLQ estimate over sequential key batches.

    Probes within a batch are vmapped by the sampler; batches beyond
    the first run under ``lax.map`` with a ``jax.checkpoint`` boundary
    per batch (the reference remats its SLQ batches the same way,
    gp_util.py:567-568), so BOTH passes stay one batch wide: without
    the remat, scan's backward sweep stacks every batch's Lanczos basis
    as a residual (num_batches x probes x (rank+1) x n -- the 82 GB OOM
    on the 3.7M-param rank-50 GGN calibration) even though the forward
    is sequential.
    """
    estimate = _hutchinson(integrand, sampler)
    if num_batches == 1:
        return estimate(key, *args)
    keys = jax.random.split(key, num=num_batches)
    batch_fn = jax.checkpoint(lambda k, *a: estimate(k, *a))
    return jnp.mean(jax.lax.map(lambda k: batch_fn(k, *args), keys), axis=0)


def solver_logdet_slq(*, lanczos_rank, slq_num_samples, slq_num_batches):
    """SLQ logdet of a dense matrix (clipped log for robustness)."""
    per_batch = _split_batches(slq_num_samples, slq_num_batches)

    def logdet(M: jax.Array, key):
        sampler = _sampler_rademacher(jnp.ones((len(M),), dtype=M.dtype), num=per_batch)
        integrand = lanczos.integrand_spd(
            slq_log_clipped(), lanczos_rank, lambda v: M @ v
        )
        return _slq_mean(integrand, sampler, key, slq_num_batches)

    return logdet


def solver_logdet_slq_implicit(
    *, lanczos_rank, slq_num_samples, slq_num_batches, N, matfun=None
):
    """SLQ logdet of an implicit (matvec-only) operator.

    Deliberate divergence from the reference (bnn_util.py:189-204, which
    uses a plain ``jnp.log`` here): the default integrand is the clipped
    log.  On numerically rank-deficient GGNs -- e.g. a saturated-softmax
    MAP solution, where the damped GGN's Lanczos recurrence exhausts its
    Krylov space below ``lanczos_rank`` -- the happy-breakdown truncation
    (krylov/arnoldi.py) leaves an exactly-zero Ritz block whose quadrature
    weight is zero, and ``0 * log(0)`` is NaN where the clipped
    ``0 * log(1)`` is the correct 0.  Pass ``matfun=jnp.log`` for exact
    reference semantics on full-rank operators.
    """
    per_batch = _split_batches(slq_num_samples, slq_num_batches)
    sampler = _sampler_rademacher(jnp.ones((N,), dtype=float), num=per_batch)
    matfun = slq_log_clipped() if matfun is None else matfun

    def logdet(Av: Callable, key, *args):
        integrand = lanczos.integrand_spd(matfun, lanczos_rank, Av)
        return _slq_mean(integrand, sampler, key, slq_num_batches, *args)

    return logdet


def solver_clipped_mass_slq(
    *, lanczos_rank, slq_num_samples, slq_num_batches, N, eps=None
):
    """Diagnostic companion to ``solver_logdet_slq_implicit``'s clipping.

    Hutchinson-SLQ estimate of ``trace(1[A < eps])`` -- the number of
    spectral directions whose quadrature mass ``slq_log_clipped`` maps
    to ``log(1) = 0``.  Near-zero on a genuinely full-rank operator; a
    clearly positive value flags that the default clipped log is
    silently biasing the logdet (e.g. damping ``alpha`` below f32 eps)
    and the run should switch to ``matfun=jnp.log`` or re-scale.
    Same estimator plumbing as the logdet solver, so it can be evaluated
    on the identical operator/key for an apples-to-apples check.
    """
    per_batch = _split_batches(slq_num_samples, slq_num_batches)
    sampler = _sampler_rademacher(jnp.ones((N,), dtype=float), num=per_batch)

    def indicator(x):
        cut = jnp.finfo(x.dtype).eps if eps is None else eps
        return jnp.where(x < cut, 1.0, 0.0)

    def clipped_mass(Av: Callable, key, *args):
        integrand = lanczos.integrand_spd(indicator, lanczos_rank, Av)
        return _slq_mean(integrand, sampler, key, slq_num_batches, *args)

    return clipped_mass


# ---------------------------------------------------------------------------
# GGN operators
#
# The GGN of a sum-loss factorises as  G = J^T H J  with J the Jacobian
# of the *batched* network apply and H the block-diagonal of per-sample
# loss Hessians.  All operators below are built from one linearisation
# of the batched apply -- two network passes per matvec, with the batch
# dimension inside each pass so every layer runs as one large MXU
# matmul.  (The reference instead vmaps singleton-batch linearisations,
# bnn_util.py:263-293; the two are mathematically identical, and this
# framework's tests pin them against the materialised `ggn_full`.)
# ---------------------------------------------------------------------------


def _linearize_batched(model_fun, param_unflatten, params_vec, x_batch):
    """Linearise the batched apply around flat params, once.

    Returns ``(preds, jvp, vjp)`` with flat-vector calling conventions:
    ``jvp: (P,) -> (B, O)`` and ``vjp: (B, O) -> (P,)``.
    """

    def apply_flat(p_vec):
        return model_fun(param_unflatten(p_vec), x_batch)

    preds, jvp = jax.linearize(apply_flat, params_vec)
    transpose = jax.linear_transpose(jvp, params_vec)
    return preds, jvp, lambda cotangent: transpose(cotangent)[0]


def _loss_hessians(loss_single, preds, y_batch):
    """Per-sample Hessians of the loss in output space: (B, O, O)."""
    return jax.vmap(jax.hessian(loss_single, argnums=0))(preds, y_batch)


def ggn_vp(*, loss_single, model_fun, param_unflatten):
    """GGN-vector product ``v -> J^T H J v`` from one batched linearisation.

    Flat vector in, flat vector out; the sum over the batch happens
    inside the transposed Jacobian apply (no per-sample loop at all).
    """

    def gvp(v_vec, params_vec, x_batch, y_batch):
        preds, jvp, vjp = _linearize_batched(
            model_fun, param_unflatten, params_vec, x_batch
        )
        Jv = jvp(v_vec)
        H = _loss_hessians(loss_single, preds, y_batch)
        return vjp(jnp.einsum("boi,bi->bo", H, Jv))

    return gvp


# Reference-parity name (bnn_util.py:263): the "parallel" strategy is
# simply the batched operator here.
ggn_vp_parallel = ggn_vp


def ggn_vp_running(*, loss_single, model_fun, param_unflatten, chunk_size=1):
    """Low-memory GGN-vector product: scan over batch chunks.

    Splits the batch into ``chunk_size``-sized pieces, applies the
    batched operator per piece, and accumulates the flat result under
    ``lax.scan`` so peak memory is one chunk's activations.
    """
    chunked = ggn_vp(
        loss_single=loss_single, model_fun=model_fun, param_unflatten=param_unflatten
    )

    def gvp(v_vec, params_vec, x_batch, y_batch):
        num = x_batch.shape[0] // chunk_size
        x_chunks = x_batch[: num * chunk_size].reshape(num, chunk_size, *x_batch.shape[1:])
        y_chunks = y_batch[: num * chunk_size].reshape(num, chunk_size, *y_batch.shape[1:])

        def body(acc, chunk):
            x, y = chunk
            return acc + chunked(v_vec, params_vec, x, y), None

        out, _ = jax.lax.scan(body, jnp.zeros_like(v_vec), (x_chunks, y_chunks))
        return out

    return gvp


def kernel_vp(*, loss_single, model_fun, param_unflatten):
    """Batched NTK-form product: ``v -> H J J^T H^{1/2} v`` over the batch.

    Output-space operator for the kernel trick (O(B*O) instead of O(P)
    Krylov vectors).  Uses the full batched Jacobian, so cross-sample
    NTK entries are included.  The reference's `kernel_vp_parallel`
    (bnn_util.py:296-322) instead broadcasts one output cotangent to
    every sample and keeps only per-sample (block-diagonal) products;
    that variant is kept below for parity.
    """

    def kvp(v_outs, params_vec, x_batch, y_batch):
        preds, jvp, vjp = _linearize_batched(
            model_fun, param_unflatten, params_vec, x_batch
        )
        H = _loss_hessians(loss_single, preds, y_batch)
        Hv = jnp.einsum("boi,bi->bo", jnp.linalg.cholesky(H), v_outs)
        JJtHv = jvp(vjp(Hv))
        return jnp.einsum("boi,bi->bo", H, JJtHv)

    return kvp


def kernel_vp_parallel(*, loss_single, model_fun, param_unflatten):
    """Per-sample (block-diagonal) NTK product, reference semantics.

    Each sample contributes ``H_b J_b J_b^T H_b^{1/2} v`` with only its
    own Jacobian row -- no cross-sample terms.  ``v`` has the shape of
    a single sample's output.  See `kernel_vp` for the full-batch form.
    """

    def kvp_single(params, x_single, y_single, v_outs, *, get_hessian):
        # Singleton linearisation: this operator is per-sample by
        # definition, so there is no batched formulation to prefer.
        apply_one = lambda p: model_fun(p, x_single[None, ...])  # noqa: E731
        preds, jvp_one = jax.linearize(apply_one, params)
        vjp_one = jax.linear_transpose(jvp_one, params)
        H = get_hessian(preds, y_single[None, ...])
        Hv = jnp.einsum("boi,bi->bo", jnp.linalg.cholesky(H), v_outs[None, ...])
        (JtHv,) = vjp_one(Hv)
        JJtHv = jvp_one(JtHv)
        return jnp.einsum("boi,bi->bo", H, JJtHv)[0]

    def kvp(v_like_outs, params_vec, x_batch, y_batch):
        params = param_unflatten(params_vec)
        get_hessian = functools.partial(_loss_hessians, loss_single)
        single = functools.partial(
            kvp_single, params, v_outs=v_like_outs, get_hessian=get_hessian
        )
        return jax.vmap(single)(x_batch, y_batch).sum(axis=0)

    return kvp


def ggn_full(*, loss_single, model_fun, param_unflatten):
    """Materialised GGN: J^T H J + alpha I (small models only)."""

    def ggn_fun(alpha, variables, x_train, y_train):
        preds = model_fun(param_unflatten(variables), x_train)
        H = _loss_hessians(loss_single, preds, y_train)
        J = jax.jacfwd(lambda v: model_fun(param_unflatten(v), x_train))(variables)
        return jnp.einsum("bop,boq,bqr->pr", J, H, J) + alpha * jnp.eye(J.shape[-1])

    return ggn_fun


def ggn_diag(*, loss_single, model_fun, param_unflatten):
    full = ggn_full(
        loss_single=loss_single, model_fun=model_fun, param_unflatten=param_unflatten
    )

    def ggn_fun(alpha, variables, x_train, y_train):
        return jnp.diag(jnp.diag(full(alpha, variables, x_train, y_train)))

    return ggn_fun


def ggn_vp_dataloader(
    param_vec,
    loss_single,
    model_fun,
    param_unflatten,
    data_loader,
    sum_type="parallel",
    batch_fields=("image", "label"),
):
    """GGN matvec accumulated over a host-side dataloader.

    ``batch_fields`` names the input/target entries of each batch dict
    (the reference hardcodes ``image``/``label``, bnn_util.py:325-346).
    """
    make = {"parallel": ggn_vp, "running": ggn_vp_running}[sum_type]
    gvp_batch = jax.jit(
        make(
            loss_single=loss_single,
            model_fun=model_fun,
            param_unflatten=param_unflatten,
        )
    )
    x_field, y_field = batch_fields

    def ggn_vec_prod(v_vec):
        total = jnp.zeros_like(param_vec)
        for batch in data_loader:
            total = total + gvp_batch(v_vec, param_vec, batch[x_field], batch[y_field])
        return total

    return ggn_vec_prod


def predictive_cov(*, ggn_fun, model_fun, param_unflatten, hyperparam_unconstrain):
    def evaluate(a, variables, x_train, y_train, x_test):
        alpha = hyperparam_unconstrain(a)
        ggn = ggn_fun(alpha, variables, x_train, y_train)
        covariance = jnp.linalg.inv(ggn)
        J_test = jax.jacfwd(lambda v: model_fun(param_unflatten(v), x_test))(variables)
        return jax.vmap(lambda J: J @ covariance @ J.T)(J_test)

    return evaluate


# ---------------------------------------------------------------------------
# Posterior samplers
# ---------------------------------------------------------------------------


def sampler_cholesky(*, ggn_fun, num):
    def sample(key, alpha, variables, x_train, y_train):
        ggn = ggn_fun(alpha, variables, x_train, y_train)
        ggn_inv_sqrt = jnp.linalg.cholesky(jnp.linalg.inv(ggn))
        eps = jax.random.normal(key, (num, *variables.shape))
        return (ggn_inv_sqrt @ eps.T).T + variables[None, ...]

    return sample


def sampler_lanczos(*, ggn_fun, num, lanczos_rank):
    """Sample from N(variables, GGN^{-1}) via Lanczos square roots."""

    def sample(key, alpha, variables, x_train, y_train):
        ggn = ggn_fun(alpha, variables, x_train, y_train)
        factorise = lanczos.tridiag(lambda v: ggn @ v, lanczos_rank, reortho="full")
        eps = jax.random.normal(key, (num, *variables.shape))
        sample_one = functools.partial(_sample_single, factorise=factorise)
        return jax.vmap(sample_one)(eps) + variables[None, ...]

    def _sample_single(eps, *, factorise):
        (Q, tridiag_), _ = factorise(eps)
        dense = _dense_tridiag(*tridiag_)
        tri_inv_sqrt = jnp.linalg.cholesky(jnp.linalg.inv(dense))
        return Q.T @ (tri_inv_sqrt @ (Q @ eps))

    return sample


def lanczos_sampler(*, ggn_vp, num_samples, lanczos_rank, key, params_vec):
    """Matrix-free posterior sampler with eigenvalue clamping."""
    eps = jax.random.normal(key, (num_samples, *params_vec.shape))

    def posterior_sample(single):
        factorise = lanczos.tridiag(ggn_vp, lanczos_rank, reortho="full")
        (Q, tridiag_), _ = factorise(single)
        dense = _dense_tridiag(*tridiag_)
        w, V = jnp.linalg.eigh(dense)
        eigvecs = Q.T @ V
        eigvals = jnp.where(w < 1e-9, 1.0, w)
        inv_eigvals = jnp.where(w < 1e-9, 0.0, 1.0 / eigvals)
        coeffs = jnp.sqrt(inv_eigvals) * single[:lanczos_rank]
        return params_vec + eigvecs @ coeffs

    return jax.vmap(posterior_sample)(eps)


def _dense_tridiag(diagonal, off_diagonal):
    return (
        jnp.diag(diagonal) + jnp.diag(off_diagonal, 1) + jnp.diag(off_diagonal, -1)
    )


# ---------------------------------------------------------------------------
# Vectorisation helpers
# ---------------------------------------------------------------------------


def vectorize_nn(model_fn, params):
    """Flatten a parameter pytree and wrap the apply fn accordingly."""
    params_vec, unflatten_fn = jax.flatten_util.ravel_pytree(params)

    def model_apply_vec(params_vectorized, x):
        return model_fn(unflatten_fn(params_vectorized), x)

    return params_vec, unflatten_fn, model_apply_vec


def bind_model_state(model_apply, *, batch_stats=None, dropout_rng=None):
    """Wrap a flax apply into the ``(params, x) -> logits`` convention.

    Non-parameter state is bound by *what it is*, not by a model-name
    lookup table (the reference keys behaviour off hardcoded class
    names, bnn_util.py:521-546): pass ``batch_stats`` for BatchNorm
    models, ``dropout_rng`` for dropout-at-eval models, neither for
    plain ones.
    """
    if batch_stats is not None:

        def model_fn(params, x):
            variables = {"params": params, "batch_stats": batch_stats}
            return model_apply(variables, x, train=False, mutable=False)

    elif dropout_rng is not None:

        def model_fn(params, x):
            return model_apply(
                {"params": params}, x, train=False, rngs={"dropout": dropout_rng}
            )

    else:
        model_fn = model_apply
    return model_fn


def get_model_apply_fn(model_name, model_apply, batch_stats=None, rng=None):
    """Reference-parity alias for `bind_model_state` (name unused)."""
    del model_name
    return bind_model_state(model_apply, batch_stats=batch_stats, dropout_rng=rng)


def img_to_patch(x, patch_size, flatten_channels=True):
    """[B, H, W, C] image batch into a ViT patch sequence."""
    import einops

    if flatten_channels:
        pattern = "b (h p1) (w p2) c -> b (h w) (p1 p2 c)"
    else:
        pattern = "b (h p1) (w p2) c -> b (h w) p1 p2 c"
    return einops.rearrange(x, pattern, p1=patch_size, p2=patch_size)


# ---------------------------------------------------------------------------
# Memory-lean jacobians + eigh logpdf
# ---------------------------------------------------------------------------


def jacfwd_map(fun: Callable) -> Callable:
    """Forward-mode jacobian with ``lax.map`` over basis vectors.

    Same memory/runtime trade as the reference's jacfwd_map
    (bnn_util.py:581-596) but built on public JAX APIs: one JVP per
    standard-basis vector, sequentially mapped instead of vmapped.
    """

    def jacfun(x):
        flat, unflatten = jax.flatten_util.ravel_pytree(x)
        basis = jnp.eye(len(flat), dtype=flat.dtype)

        def jvp_single(e):
            return jax.jvp(fun, (unflatten(flat),), (unflatten(e),))[1]

        jac_rows = jax.lax.map(jvp_single, basis)
        # jac_rows[i] = J @ e_i: move the basis axis last.
        return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), jac_rows)

    return jacfun


def logpdf_cholesky() -> Callable:
    """Gaussian logpdf via materialised covariance + Cholesky."""

    def logpdf(y, /, *, mean, cov: Callable):
        cov_matrix = jax.jacfwd(cov)(mean)
        cholesky = jnp.linalg.cholesky(cov_matrix)
        logdet = jnp.sum(jnp.log(jnp.diag(cholesky)))
        tmp = jax.scipy.linalg.solve_triangular(cholesky, y - mean, lower=True)
        mahalanobis = jnp.dot(tmp, tmp)
        (n,) = jnp.shape(mean)
        return -logdet - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi), {}

    return logpdf


def logpdf_eigh() -> Callable:
    """Gaussian logpdf via eigendecomposition with small-eigenvalue clamping."""

    def logpdf(y, /, *, mean, cov: Callable):
        cov_matrix = jacfwd_map(cov)(mean)
        w, V = jnp.linalg.eigh(cov_matrix)

        w_safe = jnp.where(w < 1e-6, 1.0, w)
        logdet = jnp.sum(jnp.log(w_safe)) / 2

        inv_eigvals = jnp.where(w < 1e-6, 0.0, 1.0 / w)
        factor = (V * jnp.sqrt(inv_eigvals[..., None, :])) @ V.T
        tmp = factor @ (y - mean)
        mahalanobis = jnp.dot(tmp, tmp)
        (n,) = jnp.shape(mean)
        return -logdet - 0.5 * mahalanobis - n / 2 * jnp.log(2 * jnp.pi), {}

    return logpdf


# ---------------------------------------------------------------------------
# Linearised-Laplace predictives
#
# Both predictives need the same object: the linearised test-time
# covariance  C = J_test G^{-1} J_test^T  exposed as a flat matvec.
# `_laplace_predictive` builds it once (the reference duplicates the
# linearise/transpose/CG plumbing in both consumers,
# bnn_util.py:630-683).
# ---------------------------------------------------------------------------


def _laplace_predictive(model_apply, unflatten, ggn_fun, params_vec, x_test, *, solve):
    """Linearised predictive: flat mean, flat covariance matvec, unflattener."""
    mean_pred, jvp_fn = jax.linearize(
        lambda p: model_apply(unflatten(p), x_test), params_vec
    )
    vjp_fn = jax.linear_transpose(jvp_fn, params_vec)
    mean_flat, unflat_out = jax.flatten_util.ravel_pytree(mean_pred)

    def cov_matvec(v_flat):
        (Jtv,) = vjp_fn(unflat_out(v_flat))
        ginv_Jtv, _info = solve(ggn_fun, Jtv)
        return jax.flatten_util.ravel_pytree(jvp_fn(ginv_Jtv))[0]

    return mean_flat, cov_matvec, unflat_out


def predictive_posterior_loglikelihood(
    *, model_apply, unflatten, logpdf, ggn_fun, solve=None
):
    """p(y|x) = N(y | f(x), J G^{-1} J^T); inner solve injectable."""
    solve = solve or _cg.krylov_solve_cg_fixed_step_reortho(20)

    def eval_logprob(params_vec, x_test, y_test):
        mean_flat, cov_matvec, _ = _laplace_predictive(
            model_apply, unflatten, ggn_fun, params_vec, x_test, solve=solve
        )
        y_flat, _ = jax.flatten_util.ravel_pytree(y_test)
        return logpdf(y_flat, mean=mean_flat, cov=cov_matvec)

    return eval_logprob


def predictive_logit_sampler(*, model_apply, unflatten, num_samples, ggn_fun, solve=None):
    """Sample predictive logits from the linearised-Laplace posterior."""
    solve = solve or _cg.krylov_solve_cg_fixed_step_reortho(20)

    def eval_test_set(params_vec, x_test, y_test, key):
        del y_test  # kept for signature parity with the loglikelihood
        mean_flat, cov_matvec, unflat_out = _laplace_predictive(
            model_apply, unflatten, ggn_fun, params_vec, x_test, solve=solve
        )
        cov_matrix = jacfwd_map(cov_matvec)(mean_flat)
        w, V = jnp.linalg.eigh(cov_matrix)
        # Samples need the *covariance* square root C^{1/2} = V sqrt(w) V^T.
        # The reference multiplies by sqrt(1/w) instead
        # (bnn_util.py:676-679) -- i.e. it samples from N(mean, C^{-1});
        # fixed here, divergence documented in COMPONENTS.md.
        eigvals = jnp.where(w < 1e-6, 0.0, w)
        cov_sqrt = (V * jnp.sqrt(eigvals[..., None, :])) @ V.T
        eps = jax.random.normal(key, (num_samples, *mean_flat.shape))
        samples = mean_flat[None, :] + eps @ cov_sqrt.T
        return jax.vmap(unflat_out)(samples)

    return eval_test_set


# ---------------------------------------------------------------------------
# Calibration losses
#
# Both losses maximise the Laplace evidence over the prior precision
# alpha: log p(D | alpha) ~ log-prior(alpha) - 1/2 logdet(G + alpha I),
# differing only in the logdet estimator (SLQ vs diagonal).
# ---------------------------------------------------------------------------


def _damped_ggn_matvec(model_apply, unflatten):
    """Flat matvec of G + alpha I, the calibration losses' operator."""
    gvp = ggn_vp(
        loss_single=loss_training_cross_entropy_single,
        model_fun=model_apply,
        param_unflatten=unflatten,
    )

    def matvec(v_vec, alpha, params_vec, x, y):
        return gvp(v_vec, params_vec, x, y) + alpha * v_vec

    return matvec


def _log_prior(alpha, params_vec, n_params):
    return jnp.log(alpha) * n_params - alpha * jnp.dot(params_vec, params_vec)


def calibration_loss(
    model_apply,
    unflatten,
    hyperparam_unconstrain,
    n_params,
    *,
    lanczos_rank=10,
    slq_num_samples=10,
    slq_num_batches=1,
):
    """Prior-precision calibration via SLQ logdet of the implicit GGN."""
    ggn_mat = _damped_ggn_matvec(model_apply, unflatten)
    logdet_fun = solver_logdet_slq_implicit(
        lanczos_rank=lanczos_rank,
        slq_num_samples=slq_num_samples,
        slq_num_batches=slq_num_batches,
        N=n_params,
    )

    def loss(log_alpha, params_vec, img, label, key):
        alpha = hyperparam_unconstrain(log_alpha)
        logdet = logdet_fun(ggn_mat, key, alpha, params_vec, img, label)
        return -(_log_prior(alpha, params_vec, n_params) - logdet)

    return loss


def calibration_loss_diagonal(
    model_apply,
    unflatten,
    hyperparam_unconstrain,
    hutchinson_samples,
    num_levels,
    n_params,
):
    """Calibration with a multi-level Hutchinson diagonal logdet."""
    gvp = ggn_vp(
        loss_single=loss_training_cross_entropy_single,
        model_fun=model_apply,
        param_unflatten=unflatten,
    )

    def loss(log_alpha, params_vec, img, label):
        alpha = hyperparam_unconstrain(log_alpha)
        diag_tree = hutchinson_diagonal(
            gvp_fn=lambda v: gvp(v, params_vec, img, label),
            params=unflatten(params_vec),
            n_samples=hutchinson_samples,
            key=jax.random.PRNGKey(0),
            computation_type="serial",
            num_levels=num_levels,
        )
        diag = jax.flatten_util.ravel_pytree(diag_tree)[0]
        diag = jnp.where(diag < 1e-4, 0.0, diag)
        logdet = jnp.sum(jnp.log(diag + alpha))
        return -(_log_prior(alpha, params_vec, n_params) - logdet)

    return loss


# Reference-parity aliases ("callibration" typo preserved from
# bnn_util.py:433,477 so reference-written driver code keeps running).
callibration_loss = calibration_loss
callibration_loss_diagonal = calibration_loss_diagonal
