"""Counting golden parity: velocyto_tpu's counting engine against
count matrices produced by the REFERENCE ExInCounter itself (run via
tests/golden/pysam_shim.py - see tests/golden/generate_counting.py)."""
import os

import numpy as np
import pytest

from velocyto_tpu.counting.counter import ExInCounter
from velocyto_tpu.counting.logics import LOGICS

HERE = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(HERE, "counting_golden.npz")

ALL = ["Permissive10X", "Intermediate10X", "ValidatedIntrons10X",
       "Stricter10X", "ObservedSpanning10X", "Discordant10X", "SmartSeq2"]


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("counting_golden.npz not generated")
    return np.load(GOLDEN)


def _run_ours(logic_name, use_mask):
    gtf = os.path.join(HERE, "cnt_ann.gtf")
    bam = os.path.join(HERE, "cnt_fix.bam")
    cs = os.path.join(HERE, "cnt_fix_cellsorted.bam")
    mask = os.path.join(HERE, "cnt_mask.gtf")
    bcs = {f"C{c:03d}" for c in range(15)}
    counter = ExInCounter("s", LOGICS[logic_name], valid_bcset=set(bcs))
    counter.peek(bam)
    counter.read_transcriptmodels(gtf)
    if use_mask:
        counter.read_repeats(mask)
    counter.mark_up_introns([bam], multimap=False)
    d, cell_order = counter.count([cs], multimap=False, cell_batch_size=5)
    order = np.argsort(cell_order)
    return ({layer: np.concatenate(arrs, axis=1)[:, order]
             for layer, arrs in d.items()},
            np.array(cell_order)[order])


@pytest.mark.parametrize("use_mask", [False, True],
                         ids=["nomask", "mask"])
@pytest.mark.parametrize("logic_name", ALL)
def test_counting_matches_reference_engine(golden, logic_name, use_mask):
    key = logic_name + ("_mask" if use_mask else "")
    ours, cells = _run_ours(logic_name, use_mask)
    np.testing.assert_array_equal(cells, golden[f"{key}__cells"])
    total = 0
    for layer, m in ours.items():
        np.testing.assert_array_equal(
            m, golden[f"{key}__{layer}"],
            err_msg=f"{key} layer {layer}")
        total += int(m.sum())
    assert total > 0, "vacuous comparison"


def test_umi_chr_extension_matches_reference_engine(golden):
    gtf = os.path.join(HERE, "cnt_ann.gtf")
    bam = os.path.join(HERE, "cnt_fix.bam")
    cs = os.path.join(HERE, "cnt_fix_cellsorted.bam")
    bcs = {f"C{c:03d}" for c in range(15)}
    counter = ExInCounter("s", LOGICS["Permissive10X"],
                          valid_bcset=set(bcs), umi_extension="chr")
    counter.peek(bam)
    counter.read_transcriptmodels(gtf)
    counter.mark_up_introns([bam], multimap=False)
    d, cell_order = counter.count([cs], multimap=False, cell_batch_size=5)
    order = np.argsort(cell_order)
    np.testing.assert_array_equal(np.array(cell_order)[order],
                                  golden["ext_chr__cells"])
    for layer, arrs in d.items():
        np.testing.assert_array_equal(
            np.concatenate(arrs, axis=1)[:, order],
            golden[f"ext_chr__{layer}"], err_msg=layer)


def test_discovery_mode_matches_reference_engine(golden):
    gtf = os.path.join(HERE, "cnt_ann.gtf")
    bam = os.path.join(HERE, "cnt_fix.bam")
    cs = os.path.join(HERE, "cnt_fix_cellsorted.bam")
    counter = ExInCounter("s", LOGICS["Permissive10X"])
    counter.peek(bam)
    counter.read_transcriptmodels(gtf)
    counter.mark_up_introns([bam], multimap=False)
    d, cell_order = counter.count([cs], multimap=False, cell_batch_size=5)
    order = np.argsort(cell_order)
    np.testing.assert_array_equal(np.array(cell_order)[order],
                                  golden["discovery__cells"])
    for layer, arrs in d.items():
        got = (np.concatenate(arrs, axis=1)[:, order] if arrs
               else np.zeros((0, 0)))
        np.testing.assert_array_equal(got, golden[f"discovery__{layer}"],
                                      err_msg=layer)
