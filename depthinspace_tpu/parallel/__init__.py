from .mesh import make_mesh, batch_shardings, replicated, put_batch, DATA_AXIS
