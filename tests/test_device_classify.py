"""Differential test: the jitted device classification program against
the numpy engine, on randomized record sets across all logics."""
import numpy as np
import pytest

from velocyto_tpu.counting.device_classify import assemble_and_classify_device
from velocyto_tpu.counting.logics import LOGICS
from velocyto_tpu.counting.molecules import (RecordArrays,
                                             assemble_and_classify,
                                             F_INTRON, F_EXON, F_VALID,
                                             F_SPAN_GATED, F_SPAN_UNGATED)

ALL_LOGICS = ["Permissive10X", "Intermediate10X", "ValidatedIntrons10X",
              "Stricter10X", "ObservedSpanning10X", "Discordant10X",
              "SmartSeq2"]


def _random_records(rng, n_mol=60, n_tm=25, n_gene=8, n_pairs=400):
    """Random but structurally-consistent record sets: each (read, tm)
    appears once; each read belongs to one molecule."""
    n_reads = n_mol + rng.randint(0, n_mol)          # some multi-read mols
    mol_of_read = rng.randint(0, n_mol, size=n_reads)
    gene_of_tm = rng.randint(0, n_gene, size=n_tm)
    seen = set()
    rows = []
    for _ in range(n_pairs):
        r = rng.randint(0, n_reads)
        t = rng.randint(0, n_tm)
        if (r, t) in seen:
            continue
        seen.add((r, t))
        flags = 0
        if rng.rand() < 0.7:
            flags |= F_EXON
        if rng.rand() < 0.5:
            flags |= F_INTRON
        if not flags:
            flags = F_EXON
        if flags & F_INTRON and rng.rand() < 0.5:
            flags |= F_VALID
        if flags & F_INTRON and rng.rand() < 0.3:
            flags |= F_SPAN_UNGATED
            if flags & F_VALID:
                flags |= F_SPAN_GATED
        rows.append((r, mol_of_read[r], t, gene_of_tm[t], flags,
                     rng.randint(1, 4)))
    rows.sort()
    a = np.array(rows, dtype=np.int64).reshape(-1, 6)
    return RecordArrays(a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                        a[:, 4].astype(np.int32),
                        a[:, 5].astype(np.int32)), n_mol


@pytest.mark.parametrize("logic_name", ALL_LOGICS)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_numpy(logic_name, seed):
    rng = np.random.RandomState(seed)
    records, n_mol = _random_records(rng)
    logic = LOGICS[logic_name]
    a1, g1, c1 = assemble_and_classify(records, logic, n_mol)
    a2, g2, c2 = assemble_and_classify_device(records, logic, n_mol)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(c1, c2)


def test_device_empty_records():
    z = np.zeros(0, np.int64)
    records = RecordArrays(z, z, z, z, z.astype(np.int32),
                           z.astype(np.int32))
    a, g, c = assemble_and_classify_device(records,
                                           LOGICS["Permissive10X"], 5)
    assert (a == 0).all() and (g == -1).all() and (c == 2).all()
