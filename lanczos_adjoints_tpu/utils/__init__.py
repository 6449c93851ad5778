"""Data loading, test-matrix factories and experiment utilities."""

from lanczos_adjoints_tpu.utils import exp_util, test_util  # noqa: F401
