from .mesh import (make_mesh, batch_shardings, replicated, put_batch,
                   pad_batch, DATA_AXIS)
