"""Model layer: GP marginal likelihood, BNN/GGN Laplace, wave-PDE expm.

Imported lazily by submodule (``from lanczos_adjoints_tpu.models import
gp``) to keep optional dependencies (flax for bnn/pde MLPs) off the
import path of the numerics core.
"""
