"""Multi-device execution: row-partitioned operators over a device mesh."""

from lanczos_adjoints_tpu.parallel.pallas_halo import (  # noqa: F401
    sharded_dia_operator_pallas,
)
from lanczos_adjoints_tpu.parallel.sharded import (  # noqa: F401
    device_mesh,
    replicate,
    sharded_dense_operator,
    sharded_dia_operator,
    sharded_gram_matvec,
    sharded_gram_policy,
    shard_rows,
)
