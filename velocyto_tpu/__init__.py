"""velocyto_tpu: a TPU-native RNA-velocity framework.

Two pipelines sharing one package (mirroring the reference's structure,
velocyto-team/velocyto.py, but re-designed for JAX/XLA/Pallas on TPU):

  - counting:  BAM + GTF -> 4-layer .loom of spliced/unspliced/ambiguous
               molecule counts (velocyto_tpu.counting, velocyto_tpu.commands)
  - estimation: .loom -> velocity field on an embedding
               (velocyto_tpu.analysis and the TPU kernels in velocyto_tpu.ops)

The loom file on disk is the contract between the halves.
"""
from ._version import __version__
from .constants import *  # noqa: F401,F403

from .ops import (col_delta_cor, col_delta_cor_partial,
                  col_delta_cor_partial_compact, col_delta_cor_partial_sharded,
                  knn_search, knn_balance, balance_knn_loop, BalancedKNN,
                  knn_distance_matrix, make_mutual, take_top, min_n,
                  connectivity_to_weights, convolve_by_sparse_weights,
                  fit_slope, fit_slope_offset, fit_slope_weighted,
                  fit_slope_weighted_offset, clusters_stats, PCA)
from .parallel import (CELLS, GENES, make_mesh, single_device_mesh,
                       initialize_distributed)

# Reference-parity API (estimation.py names, velocyto/estimation.py:11-170)
from .estimation import (colDeltaCor, colDeltaCorSqrt, colDeltaCorLog10,
                         colDeltaCorpartial, colDeltaCorSqrtpartial,
                         colDeltaCorLog10partial)
from .serialization import dump_hdf5, load_hdf5
from .diffusion import Diffusion
from .metadata import Metadata, MetadataCollection
