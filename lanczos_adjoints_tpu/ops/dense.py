"""Dense linear operators."""

import jax.numpy as jnp


def dense_operator(*, precision: str = "highest"):
    """Construct ``matvec(v, matrix) -> matrix @ v``.

    On TPU the default matmul precision is bfloat16; Krylov recurrences
    need f32 accumulation for the reference tolerances, so the matvec
    pins ``precision="highest"`` unless overridden.
    """

    def matvec(v, matrix):
        return jnp.matmul(matrix, v, precision=precision)

    return matvec
