from thunder_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    hemi_data_sharding,
    replicated_per_hemi,
)
from thunder_tpu.parallel.distributed import (  # noqa: F401
    default_mesh,
    init_multihost,
)
