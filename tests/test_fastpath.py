"""Differential tests of the SoA fast path (native decoder + vectorized
passes) against the object-mode pipeline on synthesized BAM files."""
import numpy as np
import pytest

import velocyto_tpu as vt
from velocyto_tpu import native
from velocyto_tpu.counting import bamio
from velocyto_tpu.counting.counter import ExInCounter
from velocyto_tpu.counting.fastio import (NativeBamReader, PythonBamReader,
                                          ReadBatch)
from velocyto_tpu.counting.logics import LOGICS


def _gtf_line(chrom, start, end, strand, trid, gene, exno):
    tags = (f'gene_id "{gene}"; transcript_id "{trid}"; '
            f'gene_name "{gene}_n"; exon_number "{exno}";')
    return f"{chrom}\ttest\texon\t{start}\t{end}\t.\t{strand}\t.\t{tags}\n"


@pytest.fixture
def annotation(tmp_path):
    rng = np.random.RandomState(7)
    lines = []
    pos = 1000
    genes = []
    for g in range(12):
        chrom = "1" if g < 8 else "2"
        strand = "+" if g % 2 == 0 else "-"
        nex = rng.randint(2, 5)
        exons = []
        p = pos
        for _ in range(nex):
            ln = rng.randint(100, 300)
            exons.append((p, p + ln - 1))
            p += ln + rng.randint(150, 900)
        for i, (s, e) in enumerate(exons):
            exno = i + 1 if strand == "+" else nex - i
            lines.append(_gtf_line(chrom, s, e, strand, f"T{g}", f"G{g}",
                                   exno))
        genes.append((chrom, strand, exons))
        pos = p + 2000
    path = str(tmp_path / "ann.gtf")
    with open(path, "w") as f:
        f.writelines(lines)
    return path, genes


def _random_bam(tmp_path, genes, seed, n_reads=600, n_cells=12,
                suffix=False, name="t.bam"):
    rng = np.random.RandomState(seed)
    bcs = [f"C{c:03d}" + ("-1" if suffix else "") for c in range(n_cells)]
    recs = []
    for n in range(n_reads):
        bc = bcs[rng.randint(n_cells)]
        umi = f"U{rng.randint(300):04d}"
        chrom, strand, exons = genes[rng.randint(len(genes))]
        flag = 0 if rng.rand() < 0.5 else 16
        tags = {"CB": bc, "UB": umi, "NH": 1}
        kind = rng.rand()
        ref_id = 0 if chrom == "1" else 1
        if kind < 0.4 and len(exons) >= 2:
            ei = rng.randint(len(exons) - 1)
            s0, e0 = exons[ei]
            s1, e1 = exons[ei + 1]
            half = rng.randint(15, min(48, e0 - s0))
            cig = [(0, half), (3, s1 - e0 - 1), (0, 98 - half)]
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id,
                                        e0 - half, cig, tags))
        elif kind < 0.75:
            ei = rng.randint(len(exons) - 1)
            istart, iend = exons[ei][1] + 1, exons[ei + 1][0] - 1
            if iend - istart < 110:
                continue
            recs.append(bamio.BamRecord(
                f"r{n}", flag, ref_id,
                rng.randint(istart, iend - 100), [(0, 98)], tags))
        elif kind < 0.9:
            ei = rng.randint(len(exons))
            s0, e0 = exons[ei]
            start = s0 if e0 - s0 < 110 else rng.randint(s0, e0 - 100)
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id, start,
                                        [(0, 98)], tags))
        else:
            # boundary-spanning read (validates introns), some soft-clipped
            ei = rng.randint(len(exons))
            s0, e0 = exons[ei]
            cig = [(4, 5), (0, 90)] if rng.rand() < 0.3 else [(0, 95)]
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id,
                                        max(0, e0 - 40), cig, tags))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    path = str(tmp_path / name)
    bamio.write_bam(path, [("1", 200000), ("2", 200000)], recs)
    return path, [b.split("-")[0] for b in bcs]


def _cellsort(tmp_path, bam, name="cs.bam"):
    from velocyto_tpu.commands._run import _internal_cellsort
    out = str(tmp_path / name)
    _internal_cellsort(bam, out, "CB")
    return out


def _run_two_pass(counter_args, gtf, bam_sorted, bam_pos, mask_gtf=None,
                  force_object=False):
    counter = ExInCounter(**counter_args)
    if force_object:
        counter._fastpath_ok = lambda: False
    counter.peek(bam_pos)
    counter.read_transcriptmodels(gtf)
    if mask_gtf:
        counter.read_repeats(mask_gtf)
    counter.mark_up_introns([bam_pos], multimap=False)
    d, bcs = counter.count([bam_sorted], multimap=False, cell_batch_size=5)
    layers = {k: (np.concatenate(v, axis=1) if v else
                  np.zeros((len(counter.geneid2ix), 0)))
              for k, v in d.items()}
    return layers, bcs


def _assert_equal_runs(fast, obj, expect_molecules=True):
    lf, bf = fast
    lo, bo = obj
    assert sorted(bf) == sorted(bo)
    pf = np.argsort(np.array(bf))
    po = np.argsort(np.array(bo))
    total = 0
    for layer in lf:
        np.testing.assert_array_equal(lf[layer][:, pf], lo[layer][:, po],
                                      err_msg=f"layer {layer}")
        total += int(lf[layer].sum())
    if expect_molecules:
        assert len(bf) > 0 and total > 0, \
            "differential comparison is vacuous (no molecules counted)"


@pytest.mark.skipif(not native.available(), reason="libvtpu not built")
def test_native_matches_python_soa(tmp_path, annotation):
    gtf, genes = annotation
    bam, _ = _random_bam(tmp_path, genes, seed=0)
    rn = NativeBamReader(bam, "CB", "UB", True)
    rp = PythonBamReader(bam, "CB", "UB", True)
    assert rn.references == rp.references
    while True:
        bn = rn.read_batch(128)
        bp = rp.read_batch(128)
        if bn is None or bp is None:
            assert bn is None and bp is None
            break
        assert len(bn) == len(bp)
        for f in ("chrom_id", "strand", "pos", "n_segs", "clip5", "clip3",
                  "ref_skip", "ok", "bc", "umi"):
            np.testing.assert_array_equal(getattr(bn, f), getattr(bp, f),
                                          err_msg=f)
        m = bn.seg_mask
        np.testing.assert_array_equal(bn.seg_start[m], bp.seg_start[m])
        np.testing.assert_array_equal(bn.seg_end[m], bp.seg_end[m])
    rn.close()


@pytest.mark.parametrize("logic_name", ["Permissive10X", "Intermediate10X",
                                        "ValidatedIntrons10X", "Stricter10X",
                                        "ObservedSpanning10X",
                                        "Discordant10X", "SmartSeq2"])
def test_fastpath_matches_object_logics(tmp_path, annotation, logic_name):
    gtf, genes = annotation
    bam, bcs = _random_bam(tmp_path, genes, seed=1, suffix=True)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS[logic_name],
                valid_bcset=set(bcs))
    fast = _run_two_pass(args, gtf, cs, bam)
    obj = _run_two_pass(args, gtf, cs, bam, force_object=True)
    _assert_equal_runs(fast, obj)


def test_fastpath_matches_object_discovery_mode(tmp_path, annotation):
    """No whitelist: bc accretion + the >80-molecule cell filter."""
    gtf, genes = annotation
    bam, _ = _random_bam(tmp_path, genes, seed=2, n_reads=3000, n_cells=6)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"])
    fast = _run_two_pass(args, gtf, cs, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"])
    obj = _run_two_pass(args, gtf, cs, bam, force_object=True)
    _assert_equal_runs(fast, obj)


def test_fastpath_matches_object_umi_chr(tmp_path, annotation):
    gtf, genes = annotation
    bam, bcs = _random_bam(tmp_path, genes, seed=3)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"],
                valid_bcset=set(bcs), umi_extension="chr")
    fast = _run_two_pass(args, gtf, cs, bam)
    obj = _run_two_pass(args, gtf, cs, bam, force_object=True)
    _assert_equal_runs(fast, obj)


def test_fastpath_matches_object_with_mask(tmp_path, annotation):
    gtf, genes = annotation
    # mask covering one exon region of gene 0 on both strands
    chrom, strand, exons = genes[0]
    s0, e0 = exons[0]
    mask_lines = [
        f'{chrom}\tmask\texon\t{s0 - 20}\t{e0 + 20}\t.\t+\t.\tgene_id "rep1";\n',
        f'{chrom}\tmask\texon\t{s0 - 20}\t{e0 + 20}\t.\t-\t.\tgene_id "rep2";\n',
    ]
    mask = str(tmp_path / "mask.gtf")
    with open(mask, "w") as f:
        f.writelines(mask_lines)
    bam, bcs = _random_bam(tmp_path, genes, seed=4)
    cs = _cellsort(tmp_path, bam)
    for logic in ("Permissive10X", "Discordant10X", "SmartSeq2"):
        args = dict(sampleid="s", logic=LOGICS[logic], valid_bcset=set(bcs))
        fast = _run_two_pass(args, gtf, cs, bam, mask_gtf=mask)
        obj = _run_two_pass(args, gtf, cs, bam, mask_gtf=mask,
                            force_object=True)
        _assert_equal_runs(fast, obj)


def test_fastpath_onefilepercell_without_umi(tmp_path, annotation):
    """SmartSeq2 mode: one BAM per cell, placeholder UMIs."""
    gtf, genes = annotation
    bams = []
    for i in range(3):
        bam, _ = _random_bam(tmp_path, genes, seed=10 + i, n_reads=200,
                             n_cells=1, name=f"cell{i}.bam")
        bams.append(bam)
    args = dict(sampleid="s", logic=LOGICS["SmartSeq2"],
                umi_extension="without_umi", onefilepercell=True)
    c_fast = ExInCounter(**args)
    c_fast.read_transcriptmodels(gtf)
    c_fast.mark_up_introns(bams, multimap=False)
    d_f, bcs_f = c_fast.count(bams, multimap=False, cell_batch_size=5)
    c_obj = ExInCounter(**args)
    c_obj._fastpath_ok = lambda: False
    c_obj.read_transcriptmodels(gtf)
    c_obj.mark_up_introns(bams, multimap=False)
    d_o, bcs_o = c_obj.count(bams, multimap=False, cell_batch_size=5)
    assert sorted(bcs_f) == sorted(bcs_o)
    pf = np.argsort(np.array(bcs_f))
    po = np.argsort(np.array(bcs_o))
    for layer in d_f:
        lf = np.concatenate(d_f[layer], axis=1) if d_f[layer] else None
        lo = np.concatenate(d_o[layer], axis=1) if d_o[layer] else None
        # placeholder UMIs are random in object mode: each read is its own
        # molecule in both engines, so totals must agree exactly
        np.testing.assert_array_equal(lf[:, pf], lo[:, po],
                                      err_msg=f"layer {layer}")


def test_pcount_matches_count(tmp_path, annotation):
    gtf, genes = annotation
    bam, bcs = _random_bam(tmp_path, genes, seed=5, n_reads=1200,
                           n_cells=20)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"],
                valid_bcset=set(bcs))
    c1 = ExInCounter(**args)
    c1.peek(bam)
    c1.read_transcriptmodels(gtf)
    c1.mark_up_introns([bam], multimap=False)
    d1, b1 = c1.count([cs], multimap=False, cell_batch_size=4)
    c2 = ExInCounter(**args)
    c2.peek(bam)
    c2.read_transcriptmodels(gtf)
    c2.mark_up_introns([bam], multimap=False)
    d2, b2 = c2.pcount([cs], multimap=False, cell_batch_size=4,
                       n_processes=2)
    assert b1 == b2 and len(b1) == 20
    total = 0
    for layer in d1:
        m1 = np.concatenate(d1[layer], axis=1)
        np.testing.assert_array_equal(m1, np.concatenate(d2[layer], axis=1))
        total += int(m1.sum())
    assert total > 0


def test_pcount_multifile_and_discovery(tmp_path, annotation):
    """pcount column-order restoration across the hard cases: two input
    files sharing barcodes (one column per (file, cell), reference
    counter.py:783-788 per-file flush) and discovery mode (<80-molecule
    filter applied per cell)."""
    gtf, genes = annotation
    bam1, bcs = _random_bam(tmp_path, genes, seed=6, n_reads=2500,
                            n_cells=6, name="a.bam")
    bam2, _ = _random_bam(tmp_path, genes, seed=7, n_reads=2500,
                          n_cells=6, name="b.bam")
    cs1 = _cellsort(tmp_path, bam1, "cs1.bam")
    cs2 = _cellsort(tmp_path, bam2, "cs2.bam")
    for valid in (set(bcs), None):      # whitelist and discovery mode
        runs = []
        for nproc in (1, 3):
            c = ExInCounter(sampleid="s", logic=LOGICS["Permissive10X"],
                            valid_bcset=set(valid) if valid else None)
            c.peek(bam1)
            c.read_transcriptmodels(gtf)
            c.mark_up_introns([bam1, bam2], multimap=False)
            if nproc == 1:
                d, b = c.count([cs1, cs2], multimap=False,
                               cell_batch_size=4)
            else:
                d, b = c.pcount([cs1, cs2], multimap=False,
                                cell_batch_size=4, n_processes=nproc)
            mats = {layer: np.concatenate(arrs, axis=1) if arrs else
                    np.zeros((0, 0)) for layer, arrs in d.items()}
            runs.append((mats, b))

        (m1, b1), (m2, b2) = runs
        assert b1 == b2
        if valid:
            assert len(b1) == 12   # 6 cells x 2 files
        for layer in m1:
            np.testing.assert_array_equal(m1[layer], m2[layer],
                                          err_msg=layer)


def test_fastpath_matches_object_umi_gene(tmp_path, annotation):
    """Gene umi extension: the GX tag joins the molecule key."""
    gtf, genes = annotation
    rng = np.random.RandomState(11)
    bcs = [f"C{c:03d}" for c in range(8)]
    recs = []
    for n in range(500):
        bc = bcs[rng.randint(8)]
        umi = f"U{rng.randint(60):03d}"     # heavy umi collisions
        chrom, strand, exons = genes[rng.randint(len(genes))]
        ei = rng.randint(len(exons))
        s0, e0 = exons[ei]
        start = s0 if e0 - s0 < 110 else rng.randint(s0, e0 - 100)
        tags = {"CB": bc, "UB": umi, "NH": 1}
        if rng.rand() < 0.7:                # GX sometimes present
            tags["GX"] = f"G{rng.randint(12)}"
        recs.append(bamio.BamRecord(f"r{n}", 0 if strand == "+" else 16,
                                    0 if chrom == "1" else 1, start,
                                    [(0, 98)], tags))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    bam = str(tmp_path / "gx.bam")
    bamio.write_bam(bam, [("1", 200000), ("2", 200000)], recs)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"],
                valid_bcset=set(bcs), umi_extension="Gene")
    fast = _run_two_pass(args, gtf, cs, bam)
    obj = _run_two_pass(args, gtf, cs, bam, force_object=True)
    _assert_equal_runs(fast, obj)


def test_fastpath_matches_object_umi_nbp(tmp_path, annotation):
    """[N]bp umi extension: the read-sequence prefix joins the key."""
    gtf, genes = annotation
    rng = np.random.RandomState(13)
    bcs = [f"C{c:03d}" for c in range(6)]
    recs = []
    for n in range(400):
        bc = bcs[rng.randint(6)]
        umi = f"U{rng.randint(40):02d}"     # heavy collisions
        chrom, strand, exons = genes[rng.randint(len(genes))]
        ei = rng.randint(len(exons))
        s0, e0 = exons[ei]
        start = s0 if e0 - s0 < 110 else rng.randint(s0, e0 - 100)
        seq = "".join(rng.choice(list("ACGT"), 98))
        recs.append(bamio.BamRecord(f"r{n}", 0 if strand == "+" else 16,
                                    0 if chrom == "1" else 1, start,
                                    [(0, 98)],
                                    {"CB": bc, "UB": umi, "NH": 1},
                                    seq=seq))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    bam = str(tmp_path / "nbp.bam")
    bamio.write_bam(bam, [("1", 200000), ("2", 200000)], recs)
    cs = _cellsort(tmp_path, bam)
    args = dict(sampleid="s", logic=LOGICS["Permissive10X"],
                valid_bcset=set(bcs), umi_extension="4bp")
    fast = _run_two_pass(args, gtf, cs, bam)
    obj = _run_two_pass(args, gtf, cs, bam, force_object=True)
    _assert_equal_runs(fast, obj)
