"""Linear-operator factories: the TPU-native foundation layer.

A "matvec" throughout this framework is a closure ``(v, *params) -> A v``
whose differentiable parameters are passed explicitly (so that
``jax.custom_vjp`` machinery above can thread parameter gradients).  This
module constructs such closures for dense matrices, CSR/ELL sparse
matrices (XLA gather path + Pallas TPU kernels), and kernel Gram matrices
(vmapped / partitioned / sequential execution policies + a fused Pallas
streaming kernel).
"""

from lanczos_adjoints_tpu.ops.dense import dense_operator  # noqa: F401
from lanczos_adjoints_tpu.ops.gram import (  # noqa: F401
    gram_matrix,
    gram_matvec,
    gram_matvec_pallas,
    gram_matvec_partitioned,
    gram_matvec_sequential,
)
from lanczos_adjoints_tpu.ops.pallas_gram import (  # noqa: F401
    gram_matvec_fused,
)
from lanczos_adjoints_tpu.ops.pallas_lanczos import (  # noqa: F401
    tridiag_dia_fused,
)
from lanczos_adjoints_tpu.ops.sparse import (  # noqa: F401
    CSRMatrix,
    csr_from_coo,
    csr_from_dense,
    sparse_operator,
)
