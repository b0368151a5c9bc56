from .mesh import ROWS, initialize_distributed, make_row_mesh
from .distributed import (
    EllHaloOperator,
    lanczos_sharded,
    shard_ell_halo,
    shard_operator,
)
