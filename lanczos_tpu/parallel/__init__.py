from .mesh import ROWS, make_row_mesh
from .distributed import lanczos_sharded, shard_operator
