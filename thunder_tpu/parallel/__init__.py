from thunder_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    hemi_data_sharding,
    replicated_per_hemi,
    sharded_em_step,
)
