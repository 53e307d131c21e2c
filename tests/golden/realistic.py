"""Deterministic genome-realistic counting fixture builder.

Unlike the toy golden fixture (31-line GTF, 15 cells), this models the
pathologies of a real annotation that only show up at scale
(VERDICT r2 "missing #1"):

  * thousands of genes, multi-isoform transcript models sharing exon
    subsets (the Molitem transcript-model intersection actually prunes)
  * overlapping genes on the SAME and the OPPOSITE strand (stranded
    disambiguation + Discordant semantics)
  * genes with > 1.2 Mbp introns (chop_if_long_intron,
    reference transcript_model.py:78-132)
  * chr-prefixed GTF chromosomes vs bare BAM reference names, incl.
    chrM -> MT (reference counter.py:275-283 normalization)
  * a repeat mask with intervals within the 5 bp merge tolerance
    (reference counter.py:308-420)
  * reads exercising junctions (1-2 gaps), intron bodies,
    exon/intron boundaries, soft clips, <=3 bp indel patching AND
    >3 bp deletions, NH>1 skips, unmapped skips, PCR duplicates

Everything derives from one seed, so the fixture regenerates
bit-identically anywhere; goldens store reference-engine matrix
hashes, not matrices.
"""
import hashlib
import os
from typing import Dict, List, Tuple

import numpy as np

CONFIGS = {
    "mid": dict(n_genes=2500, n_reads=250_000, n_cells=200, seed=2024),
    "full": dict(n_genes=12_000, n_reads=1_200_000, n_cells=500, seed=2024),
}

CHROMS = [("chr1", "1"), ("chr2", "2"), ("chr3", "3"), ("chrX", "X"),
          ("chrM", "MT")]
READ_LEN = 98


def _bc(i: int, width: int = 12) -> str:
    alphabet = "ACGT"
    out = []
    for _ in range(width):
        out.append(alphabet[i % 4])
        i //= 4
    return "".join(out)


def build_annotation(rng: np.random.RandomState, n_genes: int):
    """Returns (gtf_lines, mask_lines, genes) where genes[i] =
    (chrom_bam, strand, isoforms: list of exon lists, master_exons)."""
    genes = []
    gtf_lines: List[str] = []
    mask_lines: List[str] = []
    # chrM gets a fixed small count of tiny genes; the rest spread over
    # the big chromosomes
    per_chrom = [0] * len(CHROMS)
    n_m = min(30, max(4, n_genes // 400))
    rest = n_genes - n_m
    for ci in range(4):
        per_chrom[ci] = rest // 4
    per_chrom[0] += rest - 4 * (rest // 4)
    per_chrom[4] = n_m

    gid = 0
    for ci, (chrom_gtf, chrom_bam) in enumerate(CHROMS):
        pos = 2000
        prev_end = 0
        # exon_number is mandatory: the reference raises without it
        # (reference counter.py:520-524)
        with_exno = True
        tiny = chrom_gtf == "chrM"
        for gi in range(per_chrom[ci]):
            strand = "+" if rng.rand() < 0.5 else "-"
            # ~8% of genes overlap the previous gene's span
            if gi and rng.rand() < 0.08 and prev_end - 3000 > pos - 20000:
                start = rng.randint(max(2000, prev_end - 8000),
                                    prev_end - 100)
            else:
                start = pos
            nex = rng.randint(2, 5) if tiny else rng.randint(3, 13)
            # master exon chain
            exons = []
            p = start
            long_intron = (not tiny) and rng.rand() < 0.002
            for e in range(nex):
                ln = rng.randint(60, 120) if tiny else rng.randint(80, 400)
                exons.append((p, p + ln - 1))
                gap = rng.randint(80, 300) if tiny else \
                    rng.randint(200, 4000)
                if long_intron and e == nex // 2:
                    gap = rng.randint(1_250_000, 1_500_000)
                p += ln + gap
            end = exons[-1][1]
            # isoforms: master + up to 4 ordered exon subsets (>= 2 exons)
            n_iso = 1 + (0 if tiny else rng.randint(0, 5))
            isoforms = [exons]
            for _ in range(n_iso - 1):
                keep = sorted(rng.choice(
                    nex, size=rng.randint(2, nex + 1), replace=False))
                isoforms.append([exons[i] for i in keep])
            for t, iso in enumerate(isoforms):
                trid = f"T{gid}.{t}"
                niso = len(iso)
                for i, (s, e) in enumerate(iso):
                    exno = i + 1 if strand == "+" else niso - i
                    attrs = (f'gene_id "G{gid}"; transcript_id "{trid}"; '
                             f'gene_name "GN{gid}"; ')
                    if with_exno:
                        attrs += f'exon_number "{exno}"; '
                    gtf_lines.append(
                        f"{chrom_gtf}\tsyn\texon\t{s}\t{e}\t.\t{strand}"
                        f"\t.\t{attrs}\n")
            # repeat mask: ~6% of genes get a repeat near an exon; some
            # masks come in close pairs (within 5 bp -> merged)
            if rng.rand() < 0.06 and len(exons) >= 2:
                ms, me = exons[1]
                half = (me - ms) // 2
                mask_lines.append(
                    f"{chrom_gtf}\tmask\texon\t{ms}\t{ms + half}\t.\t+\t.\t"
                    f'gene_id "rep{gid}"; transcript_id "rep{gid}";\n')
                if rng.rand() < 0.5:
                    mask_lines.append(
                        f"{chrom_gtf}\tmask\texon\t{ms + half + 3}\t{me}"
                        f'\t.\t+\t.\tgene_id "rep{gid}b"; '
                        f'transcript_id "rep{gid}b";\n')
            genes.append((chrom_bam, strand, isoforms, exons))
            prev_end = max(prev_end, end)
            pos = max(pos, end) + rng.randint(1500, 9000)
            gid += 1
    return gtf_lines, mask_lines, genes


def synthesize_reads(rng: np.random.RandomState, genes, n_reads: int,
                     n_cells: int, ref_of: Dict[str, int]):
    """Molecule pool -> BamRecords (PCR duplication, CIGAR variety)."""
    from velocyto_tpu.counting import bamio

    n_mol = max(1, n_reads // 3)
    mol_cell = rng.randint(n_cells, size=n_mol)
    mol_gene = rng.randint(len(genes), size=n_mol)
    mol_iso = rng.randint(1 << 16, size=n_mol)
    mol_umi = rng.randint(1 << 24, size=n_mol)
    read_mol = rng.randint(n_mol, size=n_reads)
    kinds = rng.rand(n_reads)
    flips = rng.rand(n_reads)
    aux = rng.randint(1 << 30, size=n_reads)

    recs = []
    for n in range(n_reads):
        m = read_mol[n]
        chrom, strand, isoforms, _master = genes[mol_gene[m]]
        iso = isoforms[mol_iso[m] % len(isoforms)]
        r = np.random.RandomState(aux[n])     # per-read local stream
        tags = {"CB": _bc(mol_cell[m]) + "-1", "UB": _bc(mol_umi[m], 10),
                "NH": 1}
        flag = 0 if flips[n] < 0.5 else 16
        # the molecule's strand should mostly agree with the gene
        if strand == "-":
            flag ^= 16
        ref_id = ref_of[chrom]
        kind = kinds[n]
        if kind < 0.004:
            tags["NH"] = 2                     # skipped (unique-only)
            ei = r.randint(len(iso))
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id,
                                        iso[ei][0], [(0, READ_LEN)], tags))
        elif kind < 0.006:
            recs.append(bamio.BamRecord(f"r{n}", flag | 4, ref_id,
                                        iso[0][0], [(0, READ_LEN)], tags))
        elif kind < 0.30 and len(iso) >= 2:
            # junction read, 1 or (rarely) 2 gaps
            ei = r.randint(len(iso) - 1)
            s0, e0 = iso[ei]
            s1, e1 = iso[ei + 1]
            half = r.randint(12, min(50, e0 - s0))
            rest = READ_LEN - half
            two = kind < 0.04 and ei + 2 < len(iso) and \
                rest > e1 - s1 + 10
            if two:
                s2 = iso[ei + 2][0]
                seg2 = e1 - s1 + 1
                cig = [(0, half), (3, s1 - e0 - 1), (0, seg2),
                       (3, s2 - e1 - 1), (0, rest - seg2)]
            else:
                cig = [(0, half), (3, s1 - e0 - 1), (0, rest)]
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id,
                                        e0 - half + 1, cig, tags))
        elif kind < 0.52 and len(iso) >= 2:
            # intron body
            ei = r.randint(len(iso) - 1)
            istart, iend = iso[ei][1] + 1, iso[ei + 1][0] - 1
            if iend - istart < READ_LEN + 4:
                continue
            recs.append(bamio.BamRecord(
                f"r{n}", flag, ref_id,
                r.randint(istart, iend - READ_LEN), [(0, READ_LEN)], tags))
        elif kind < 0.62 and len(iso) >= 2:
            # exon/intron boundary spanning (validates the intron)
            ei = r.randint(len(iso) - 1)
            s0, e0 = iso[ei]
            start = max(s0, e0 - r.randint(20, READ_LEN - 20))
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id, start,
                                        [(0, READ_LEN)], tags))
        elif kind < 0.90:
            # exon body; occasional soft clips and small indels
            ei = r.randint(len(iso))
            s0, e0 = iso[ei]
            start = s0 if e0 - s0 < READ_LEN + 6 else \
                r.randint(s0, e0 - READ_LEN)
            sub = kind
            if sub < 0.66:
                cig = [(4, 6), (0, READ_LEN - 6)]
            elif sub < 0.70:
                cig = [(0, 40), (1, 2), (0, READ_LEN - 42)]   # ins <= 3
            elif sub < 0.74:
                cig = [(0, 40), (2, 2), (0, READ_LEN - 40)]   # del <= 3
            elif sub < 0.77:
                cig = [(0, 40), (2, 8), (0, READ_LEN - 40)]   # del > 3
            else:
                cig = [(0, READ_LEN)]
            recs.append(bamio.BamRecord(f"r{n}", flag, ref_id, start,
                                        cig, tags))
        else:
            # last-exon 3' pileup (10x-like)
            s0, e0 = iso[-1]
            recs.append(bamio.BamRecord(
                f"r{n}", flag, ref_id, max(s0, e0 - READ_LEN // 2),
                [(0, READ_LEN)], tags))
    return recs


def build(workdir: str, config: str = "mid"):
    """Build (gtf, mask_gtf, bam, cellsorted_bam, barcodes) fixture files
    into workdir; deterministic for a given config."""
    from velocyto_tpu.counting import bamio
    from velocyto_tpu.commands._run import _internal_cellsort

    cfg = CONFIGS[config]
    tagp = f"{config}_{cfg['n_genes']}_{cfg['n_reads']}_{cfg['n_cells']}"
    paths = {n: os.path.join(workdir, f"real_{tagp}.{ext}")
             for n, ext in (("gtf", "gtf"), ("mask", "mask.gtf"),
                            ("bam", "bam"), ("cs", "cellsorted.bam"),
                            ("bcs", "tsv"))}
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    rng = np.random.RandomState(cfg["seed"])
    gtf_lines, mask_lines, genes = build_annotation(rng, cfg["n_genes"])
    with open(paths["gtf"], "w") as f:
        f.writelines(gtf_lines)
    with open(paths["mask"], "w") as f:
        f.writelines(mask_lines)
    with open(paths["bcs"], "w") as f:
        f.write("\n".join(_bc(c) + "-1" for c in range(cfg["n_cells"])))

    max_end = {}
    for chrom, _strand, _isos, master in genes:
        max_end[chrom] = max(max_end.get(chrom, 0), master[-1][1])
    refs = [(bam_name, max_end.get(bam_name, 1000) + 10_000)
            for _gtf_name, bam_name in CHROMS]
    ref_of = {name: i for i, (name, _l) in enumerate(refs)}

    recs = synthesize_reads(rng, genes, cfg["n_reads"], cfg["n_cells"],
                            ref_of)
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    bamio.write_bam(paths["bam"], refs, recs)
    _internal_cellsort(paths["bam"], paths["cs"], "CB")
    return paths


def build_percell(workdir: str, config: str = "mid"):
    """SmartSeq2 / onefilepercell variant of the fixture: the same
    deterministic read pool split into one position-sorted BAM per cell
    (reference run_smartseq2 semantics: each input file IS a cell, the
    barcode is the bam path, UMIs are placeholders;
    reference commands/run_smartseq2.py:70-74, counter.py:214-215).
    Returns (gtf_path, [bam paths] sorted by cell index)."""
    from velocyto_tpu.counting import bamio

    cfg = CONFIGS[config]
    tagp = f"{config}_{cfg['n_genes']}_{cfg['n_reads']}_{cfg['n_cells']}"
    celldir = os.path.join(workdir, f"real_{tagp}_percell")
    gtf_path = os.path.join(workdir, f"real_{tagp}.gtf")
    paths = [os.path.join(celldir, f"cell{c:04d}.bam")
             for c in range(cfg["n_cells"])]
    if os.path.exists(gtf_path) and all(os.path.exists(p) for p in paths):
        return gtf_path, paths
    build(workdir, config)      # writes the gtf + shared fixture

    rng = np.random.RandomState(cfg["seed"])
    _gtf_lines, _mask_lines, genes = build_annotation(rng, cfg["n_genes"])
    max_end = {}
    for chrom, _strand, _isos, master in genes:
        max_end[chrom] = max(max_end.get(chrom, 0), master[-1][1])
    refs = [(bam_name, max_end.get(bam_name, 1000) + 10_000)
            for _gtf_name, bam_name in CHROMS]
    ref_of = {name: i for i, (name, _l) in enumerate(refs)}
    recs = synthesize_reads(rng, genes, cfg["n_reads"], cfg["n_cells"],
                            ref_of)

    os.makedirs(celldir, exist_ok=True)
    by_cell: Dict[str, list] = {}
    for r in recs:
        by_cell.setdefault(r.tags["CB"].split("-")[0], []).append(r)
    for c in range(cfg["n_cells"]):
        cell_recs = by_cell.get(_bc(c), [])
        cell_recs.sort(key=lambda r: (r.ref_id, r.pos))
        bamio.write_bam(paths[c], refs, cell_recs)
    return gtf_path, paths


def matrix_digest(layers: Dict[str, np.ndarray], cells: List[str]) -> Dict:
    """Stable digests of a counting result: per-layer sha256 over C-order
    uint32 bytes with columns sorted by cell id, plus sums."""
    order = np.argsort(np.asarray(cells))
    out = {"cells": hashlib.sha256(
        ("\n".join(np.asarray(cells)[order])).encode()).hexdigest()}
    for layer, m in layers.items():
        ms = np.ascontiguousarray(m[:, order].astype(np.uint32))
        out[f"{layer}_sha"] = hashlib.sha256(ms.tobytes()).hexdigest()
        out[f"{layer}_sum"] = int(ms.sum())
        out[f"{layer}_shape"] = list(ms.shape)
    return out
