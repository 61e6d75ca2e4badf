from clover_tpu.parallel.collectives import (  # noqa: F401
    all_gather_with_grad,
    pmean_scalar,
    psum_scalar,
)
from clover_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch_pytree,
)
