from frozenbilm_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated,
    host_gather_results,
)
