from .mesh import (CELLS, GENES, make_mesh, single_device_mesh,
                   cells_sharding, replicated, pad_to_multiple,
                   initialize_distributed)

__all__ = ["CELLS", "GENES", "make_mesh", "single_device_mesh",
           "cells_sharding", "replicated", "pad_to_multiple",
           "initialize_distributed"]
