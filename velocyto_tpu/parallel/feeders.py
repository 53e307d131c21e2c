"""Multi-host counting orchestration: feeder processes over barcode ranges.

The reference's counting loop is single-threaded by design (its `pcount`
is a NotImplementedError stub, reference counter.py:1256-1265).  Here the
TPU-native scale-out layout (SURVEY "Parallelism inventory"): the valid
barcode set is split into contiguous ranges; one FEEDER per range decodes
the cell-sorted BAM with the native reader, counts only its own cells
(the GTF-derived interval index is replicated per feeder, replacing the
reference's per-process FeatureIndex sweep), and scatters its columns
into the global (genes, cells) frame.  Because every feeder's non-owned
columns are zero, the global matrix is the elementwise SUM of the feeder
partials -- which is exactly `merge_feeder_counts`' shard_map psum over
the device mesh (ICI within a slice, DCN across hosts).

Cell-ownership partitioning keeps molecules whole (a molecule is one
(bc, umi): it never spans feeders), so the result is bit-identical to
the serial pass; validated in tests/test_feeders.py and in the
multichip dryrun (__graft_entry__.py) end-to-end from BAM bytes.

Feeders run as SPAWNED processes (fork is unsafe in a JAX-threaded
parent): each worker receives (bam paths, gtf path, config) and builds
its own engine, mirroring what a real multi-host deployment does.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _feeder_worker(args) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """One feeder: parse the GTF (replicated index), count the BAM(s)
    restricted to the owned barcodes, return (layers, owned-cell order).
    Runs in a spawned process; imports happen here."""
    (bamfiles, markup_bamfiles, gtffile, maskfile, logic_name, owned_bcs,
     all_bcs, umi_extension, onefilepercell, multimap,
     cell_batch_size) = args
    from ..counting.counter import ExInCounter
    from ..counting import logics as _logics

    logic = getattr(_logics, logic_name)
    # intron-validation markup must see ALL whitelisted cells' reads
    # (barcode filtering applies to markup in the reference too,
    # counter.py:262-306) or feeders would validate fewer introns than
    # the serial pass; the feeder's own range only restricts counting.
    counter = ExInCounter(sampleid="feeder", logic=logic,
                          valid_bcset=set(all_bcs),
                          umi_extension=umi_extension,
                          onefilepercell=onefilepercell)
    counter.peek(bamfiles[0])
    counter.read_transcriptmodels(gtffile)
    if maskfile:
        counter.read_repeats(maskfile)
    if counter.logic.perform_validation_markup:
        counter.mark_up_introns(markup_bamfiles or bamfiles, multimap)
    counter.valid_bcset = set(owned_bcs)
    counter._soa = None       # reset the engine's barcode-decision cache
    layers_lists, order = counter.count(bamfiles, multimap, cell_batch_size)
    layers = {k: (np.concatenate(v, axis=1) if v else
                  np.zeros((len(counter.geneid2ix), 0), dtype=np.uint32))
              for k, v in layers_lists.items()}
    return layers, order


def count_distributed(bamfiles: Sequence[str], gtffile: str,
                      valid_bcs: Sequence[str], logic_name: str = "Default",
                      maskfile: Optional[str] = None,
                      markup_bamfiles: Optional[Sequence[str]] = None,
                      umi_extension: str = "no",
                      onefilepercell: bool = False, multimap: bool = False,
                      n_feeders: int = 2, cell_batch_size: int = 100,
                      mesh=None, in_process: bool = False
                      ) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Count `bamfiles` with `n_feeders` feeder processes partitioned by
    barcode range, merging partials on the device mesh.

    Returns (layers dict of (genes, n_cells) arrays, cell order =
    `valid_bcs` order restricted to observed cells).

    bamfiles: cell-sorted BAM(s) for the counting pass;
    markup_bamfiles: position-sorted BAM(s) for intron validation
    (defaults to bamfiles).  mesh: jax Mesh for the psum merge (None ->
    host-side sum, identical result).  in_process=True runs feeders
    sequentially in this process (used by the dryrun to avoid worker
    startup cost).
    """
    valid_bcs = list(valid_bcs)
    n_feeders = max(1, min(n_feeders, len(valid_bcs)))
    ranges = np.array_split(np.arange(len(valid_bcs)), n_feeders)
    jobs = [([str(b) for b in bamfiles],
             [str(b) for b in markup_bamfiles] if markup_bamfiles else None,
             gtffile, maskfile, logic_name,
             [valid_bcs[i] for i in r], valid_bcs, umi_extension,
             onefilepercell, multimap, cell_batch_size) for r in ranges]

    if in_process or n_feeders == 1:
        results = [_feeder_worker(j) for j in jobs]
    else:
        import concurrent.futures as cf
        import multiprocessing as mp
        ctx = mp.get_context("spawn")      # fork-unsafe JAX parent
        with cf.ProcessPoolExecutor(max_workers=n_feeders,
                                    mp_context=ctx) as pool:
            results = list(pool.map(_feeder_worker, jobs))

    # global frame: valid_bcs order restricted to cells any feeder saw
    seen = set()
    for _layers, order in results:
        seen.update(order)
    global_order = [bc for bc in valid_bcs if bc in seen]
    col_of = {bc: i for i, bc in enumerate(global_order)}
    layer_names = list(results[0][0].keys())
    n_genes = results[0][0][layer_names[0]].shape[0]

    # per-feeder partials scattered into the global frame (non-owned
    # columns zero), stacked per layer
    merged: Dict[str, np.ndarray] = {}
    for layer in layer_names:
        stack = np.zeros((len(results), n_genes, len(global_order)),
                         dtype=np.uint32)
        for f, (layers, order) in enumerate(results):
            m = layers[layer]
            for j, bc in enumerate(order):
                stack[f, :, col_of[bc]] = m[:, j]
        if mesh is not None:
            from .counts import merge_feeder_counts
            merged[layer] = np.asarray(merge_feeder_counts(mesh, stack))
        else:
            merged[layer] = stack.sum(axis=0)
    logging.debug(f"count_distributed: {len(results)} feeders, "
                  f"{len(global_order)} cells")
    return merged, global_order
