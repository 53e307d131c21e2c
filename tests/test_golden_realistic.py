"""Genome-realistic counting golden: our engine vs reference-engine
matrix digests on a 2,500-gene / 250k-read fixture with multi-isoform
overlap, opposite-strand genes, >1.2 Mbp-intron chops, chr/chrM naming,
and a merge-tolerance repeat mask
(tests/golden/realistic.py; digests frozen by generate_realistic.py).

The full-size config (12k genes / 1.2M reads) runs the same comparison
when VTPU_FULL_GOLDEN=1; its result is recorded in PARITY.md.
"""
import json
import os
import sys

import numpy as np
import pytest

HERE = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, HERE)
GOLDEN = os.path.join(HERE, "realistic_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("realistic_golden.npz not generated")
    return np.load(GOLDEN, allow_pickle=True)


def _run_ours(config, logic_name, use_mask, workdir):
    import realistic
    from velocyto_tpu.counting.counter import ExInCounter
    from velocyto_tpu.counting.logics import LOGICS

    paths = realistic.build(workdir, config)
    cfg = realistic.CONFIGS[config]
    bcs = {realistic._bc(c) for c in range(cfg["n_cells"])}
    counter = ExInCounter("s", LOGICS[logic_name], valid_bcset=set(bcs))
    counter.peek(paths["bam"])
    counter.read_transcriptmodels(paths["gtf"])
    if use_mask:
        counter.read_repeats(paths["mask"])
    counter.mark_up_introns([paths["bam"]], multimap=False)
    d, cells = counter.count([paths["cs"]], multimap=False,
                             cell_batch_size=100)
    layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                      else np.zeros((len(counter.geneid2ix), 0),
                                    np.uint32))
              for layer, arrs in d.items()}
    return realistic.matrix_digest(layers, list(cells))


def _configs():
    out = [("mid", HERE)]
    if os.environ.get("VTPU_FULL_GOLDEN"):
        out.append(("full", "/tmp"))
    return out


@pytest.mark.parametrize("use_mask", [False, True], ids=["nomask", "mask"])
@pytest.mark.parametrize("logic_name",
                         ["Permissive10X", "ValidatedIntrons10X",
                          "Discordant10X", "Stricter10X",
                          "Intermediate10X", "ObservedSpanning10X"])
def test_realistic_matches_reference_engine(golden, logic_name, use_mask):
    for config, workdir in _configs():
        key = f"{config}__{logic_name}" + ("_mask" if use_mask else "")
        if key not in golden:
            pytest.skip(f"{key} not in golden archive")
        want = json.loads(str(golden[key]))
        got = _run_ours(config, logic_name, use_mask, workdir)
        assert got == want, (
            f"{key}: digests differ\nours:      {got}\nreference: {want}")


def test_realistic_umi_extension_chr(golden):
    """umi_extension='chr' (the dropest mode): UMIs extend with the
    chromosome id + 10Mb bin (reference counter.py:209)."""
    import realistic
    from velocyto_tpu.counting.counter import ExInCounter
    from velocyto_tpu.counting.logics import LOGICS

    for config, workdir in _configs():
        key = f"{config}__Permissive10X_umichr"
        if key not in golden:
            pytest.skip(f"{key} not in golden archive")
        want = json.loads(str(golden[key]))
        paths = realistic.build(workdir, config)
        cfg = realistic.CONFIGS[config]
        bcs = {realistic._bc(c) for c in range(cfg["n_cells"])}
        counter = ExInCounter("s", LOGICS["Permissive10X"],
                              valid_bcset=set(bcs), umi_extension="chr")
        counter.peek(paths["bam"])
        counter.read_transcriptmodels(paths["gtf"])
        counter.mark_up_introns([paths["bam"]], multimap=False)
        d, cells = counter.count([paths["cs"]], multimap=False,
                                 cell_batch_size=100)
        layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                          else np.zeros((len(counter.geneid2ix), 0),
                                        np.uint32))
                  for layer, arrs in d.items()}
        got = realistic.matrix_digest(layers, list(cells))
        assert got == want, (
            f"{key}: digests differ\nours:      {got}\nreference: {want}")


def test_realistic_smartseq2_onefilepercell(golden):
    """SmartSeq2 / onefilepercell: one position-sorted BAM per cell,
    bam path as barcode, placeholder UMIs, unstranded counting with the
    4th 'spanning' layer (reference run_smartseq2.py:70-74,
    logic.py:1031-1142)."""
    import os as _os
    import realistic
    from velocyto_tpu.counting.counter import ExInCounter
    from velocyto_tpu.counting.logics import LOGICS

    for config, workdir in _configs():
        key = f"{config}__SmartSeq2_ofpc"
        if key not in golden:
            pytest.skip(f"{key} not in golden archive")
        want = json.loads(str(golden[key]))
        gtf_path, percell = realistic.build_percell(workdir, config)
        counter = ExInCounter("s", LOGICS["SmartSeq2"], valid_bcset=None,
                              onefilepercell=True,
                              umi_extension="without_umi")
        counter.read_transcriptmodels(gtf_path)
        counter.mark_up_introns(percell, multimap=False)
        d, cells = counter.count(percell, multimap=False,
                                 cell_batch_size=100)
        layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                          else np.zeros((len(counter.geneid2ix), 0),
                                        np.uint32))
                  for layer, arrs in d.items()}
        cellnames = [_os.path.basename(str(c)) for c in cells]
        got = realistic.matrix_digest(layers, cellnames)
        assert got == want, (
            f"{key}: digests differ\nours:      {got}\nreference: {want}")
