"""lanczos_adjoints_tpu: a TPU-native matrix-free linear-algebra framework.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of the
reference experiment codebase for "Gradients of functions of large matrices"
(arXiv:2405.17277): closed-form reverse-mode adjoints for Lanczos
tridiagonalisation and Arnoldi Hessenberg factorisation, stochastic Lanczos
quadrature, conjugate-gradient solvers, low-rank preconditioning, and the
GP / BNN-Laplace / wave-PDE model stacks built on top -- all designed
TPU-first:

- ``ops``:      linear-operator factories (dense, CSR/ELL sparse with Pallas
                SpMV kernels, kernel-Gram operators with a fused
                flash-style Pallas matvec).
- ``krylov``:   Lanczos ``tridiag`` and Arnoldi ``hessenberg`` with
                O(1)-decomposition custom adjoints (``jax.custom_vjp``).
- ``solvers``:  CG/PCG (fixed-step, adaptive, reorthogonalised) under
                ``lax.custom_linear_solve``.
- ``precond``:  partial Cholesky (with/without pivoting) + Woodbury
                preconditioner.
- ``trace``:    Hutchinson trace estimation and SLQ log-determinants.
- ``parallel``: row-partitioned operators and Krylov/CG/SLQ over a
                ``jax.sharding.Mesh`` (shard_map + psum/all_gather).
- ``models``:   GP marginal likelihood, BNN/GGN Laplace, wave-PDE expm.
- ``utils``:    data loading (SuiteSparse .mtx, UCI), test-matrix factories,
                experiment utilities.
"""

__version__ = "0.1.0"

from lanczos_adjoints_tpu import (  # noqa: F401
    krylov,
    ops,
    parallel,
    precond,
    solvers,
    trace,
    utils,
)
