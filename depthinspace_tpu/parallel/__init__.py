from .mesh import (make_mesh, batch_shardings, replicated, replicate_pytree,
                   put_batch, pad_batch, DATA_AXIS)
from .multihost import (init_multihost, is_primary, process_batch_bounds,
                        put_batch_global)
