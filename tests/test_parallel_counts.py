import numpy as np
import jax
from velocyto_tpu.parallel.mesh import make_mesh
from velocyto_tpu.parallel.counts import merge_feeder_counts, merge_feeder_counts_np

def test_merge_feeder_counts():
    rng = np.random.default_rng(0)
    partials = rng.integers(0, 5, (6, 20, 30)).astype(np.uint32)
    mesh = make_mesh()   # all devices on cells
    got = np.asarray(merge_feeder_counts(mesh, partials))
    np.testing.assert_array_equal(got, merge_feeder_counts_np(partials))
