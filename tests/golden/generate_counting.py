"""Counting golden generator: runs the REFERENCE ExInCounter
(velocyto/counter.py, via the pysam shim over our BAM reader) on
synthetic BAM+GTF fixtures and freezes the per-logic count matrices.

Run:  python tests/golden/generate_counting.py
Writes tests/golden/counting_golden.npz + the fixture bam/gtf files.
"""
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))        # tests/
sys.path.insert(0, os.path.join(HERE, "..", ".."))  # repo root

LOGICS = ["Permissive10X", "Intermediate10X", "ValidatedIntrons10X",
          "Stricter10X", "ObservedSpanning10X", "Discordant10X",
          "SmartSeq2"]


def _install_stubs():
    import pysam_shim
    sys.modules["pysam"] = pysam_shim
    loompy = types.ModuleType("loompy")
    sys.modules["loompy"] = loompy
    numba = types.ModuleType("numba")

    def jit(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    class _Ty:
        def __call__(self, *a):
            return None

        def __getitem__(self, x):
            return None

    numba.jit = jit
    for n in ("float64", "float32", "int64", "int32", "intp", "boolean",
              "void", "int_"):
        setattr(numba, n, _Ty())
    sys.modules["numba"] = numba
    sb = types.ModuleType("velocyto.speedboosted")
    for fn in ("_colDeltaCor", "_colDeltaCorLog10", "_colDeltaCorSqrt",
               "_colDeltaCorpartial", "_colDeltaCorLog10partial",
               "_colDeltaCorSqrtpartial"):
        setattr(sb, fn, lambda *a, **k: None)
    sys.modules["velocyto.speedboosted"] = sb


def make_fixtures():
    """Synthetic annotation + position-sorted and cell-sorted BAMs,
    written into tests/golden/ (reused by the parity test)."""
    from test_fastpath import _random_bam, _gtf_line

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

    class _P(str):
        def __truediv__(self, other):
            return _P(os.path.join(self, other))

    tdir = _P(HERE)
    gtf = os.path.join(HERE, "cnt_ann.gtf")
    with open(gtf, "w") as f:
        f.writelines(lines)
    bam, bcs = _random_bam(tdir, genes, seed=21, n_reads=1500, n_cells=15,
                           suffix=True, name="cnt_fix.bam")
    from velocyto_tpu.commands._run import _internal_cellsort
    cs = os.path.join(HERE, "cnt_fix_cellsorted.bam")
    _internal_cellsort(bam, cs, "CB")
    # repeat mask over one exon of gene 0, both strands
    chrom, strand, exons = genes[0]
    s0, e0 = exons[0]
    mask = os.path.join(HERE, "cnt_mask.gtf")
    with open(mask, "w") as f:
        f.write(f'{chrom}\tmk\texon\t{s0 - 20}\t{e0 + 20}\t.\t+\t.\t'
                f'gene_id "r1";\n')
        f.write(f'{chrom}\tmk\texon\t{s0 - 20}\t{e0 + 20}\t.\t-\t.\t'
                f'gene_id "r2";\n')
    return gtf, bam, cs, mask, bcs


def main():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import velocyto as rvcy

    gtf, bam, cs, mask, bcs = make_fixtures()
    out = {}

    # umi-extension + discovery-mode goldens (Permissive10X)
    def run_ref(umi_extension="no", whitelist=True):
        counter = rvcy.ExInCounter(
            "s", rvcy.Permissive10X,
            valid_bcset=set(bcs) if whitelist else None,
            umi_extension=umi_extension)
        counter.peek(bam)
        counter.read_transcriptmodels(gtf)
        counter.mark_up_introns((bam,), multimap=False)
        d, cell_order = counter.count((cs,), multimap=False,
                                      cell_batch_size=5)
        order = np.argsort(cell_order)
        return ({layer: np.concatenate(arrs, axis=1)[:, order]
                 if arrs else np.zeros((0, 0))
                 for layer, arrs in d.items()},
                np.array(cell_order)[order])

    for ext in ("chr",):
        d, cells = run_ref(umi_extension=ext)
        for layer, m in d.items():
            out[f"ext_{ext}__{layer}"] = m
        out[f"ext_{ext}__cells"] = cells
    d, cells = run_ref(whitelist=False)
    for layer, m in d.items():
        out[f"discovery__{layer}"] = m
    out["discovery__cells"] = cells

    for logic_name in LOGICS:
        for use_mask in (False, True):
            counter = rvcy.ExInCounter(
                "s", getattr(rvcy, logic_name), valid_bcset=set(bcs))
            counter.peek(bam)
            counter.read_transcriptmodels(gtf)
            if use_mask:
                counter.read_repeats(mask)
            counter.mark_up_introns((bam,), multimap=False)
            d, cell_order = counter.count((cs,), multimap=False,
                                          cell_batch_size=5)
            key = logic_name + ("_mask" if use_mask else "")
            order = np.argsort(cell_order)
            for layer, arrs in d.items():
                m = np.concatenate(arrs, axis=1)[:, order]
                out[f"{key}__{layer}"] = m
            out[f"{key}__cells"] = np.array(cell_order)[order]
    np.savez_compressed(os.path.join(HERE, "counting_golden.npz"), **out)
    print("counting_golden.npz:", len(out), "arrays")


if __name__ == "__main__":
    main()
