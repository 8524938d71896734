from quantum_compute_dft_tpu.parallel.mesh import (  # noqa: F401
    GRID_AXIS,
    grid_mesh,
    pad_to_multiple,
    shard_grid_arrays,
)
from quantum_compute_dft_tpu.parallel.sharded import (  # noqa: F401
    sharded_df_builders,
    sharded_fock_builders,
    sharded_xc_step,
)
