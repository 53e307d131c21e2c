"""Counting-stage head-to-head benchmark: velocyto_tpu's SoA engine vs
the REFERENCE ExInCounter (velocyto/counter.py @ /root/reference) on the
same synthetic BAM+GTF, same two-pass protocol (intron markup + count).

The reference runs through a thin pysam shim backed by our pure-python
BAM reader (there is no pysam in this image).  To keep the comparison
honest the shim's decode-only wall time is measured separately and
subtracted from the reference's total ("adjusted" = what the reference
would score with a free BAM decoder; real pysam sits in between).

Prints one JSON line per engine plus a summary line:
  {"metric": "counting_reads_per_sec", "value": ..., "vs_baseline": ...}

Env knobs: VTPU_BENCH_READS (default 600000), VTPU_BENCH_CELLS (400).
"""
import json
import os
import sys
import time
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

N_READS = int(os.environ.get("VTPU_BENCH_READS", "600000"))
N_CELLS = int(os.environ.get("VTPU_BENCH_CELLS", "400"))
N_GENES = 64
READS_PER_MOL = 6.0


def _b4(n: int, width: int = 10) -> str:
    s = []
    for _ in range(width):
        s.append("ACGT"[n & 3])
        n >>= 2
    return "".join(s)


def make_fixture(work: str):
    """Synthetic annotation + position/cell-sorted BAMs, cached in
    `work` (key = sizes)."""
    from velocyto_tpu.counting import bamio

    tag = f"{N_READS}_{N_CELLS}_{N_GENES}"
    gtf = os.path.join(work, f"ann_{tag}.gtf")
    bam = os.path.join(work, f"pos_{tag}.bam")
    cs = os.path.join(work, f"cell_{tag}.bam")
    bcf = os.path.join(work, f"bc_{tag}.tsv")
    if all(os.path.exists(p) for p in (gtf, bam, cs, bcf)):
        return gtf, bam, cs, bcf

    rng = np.random.RandomState(11)
    lines, genes, pos = [], [], 1000
    for g in range(N_GENES):
        chrom = "1" if g < N_GENES // 2 else "2"
        strand = "+" if g % 2 == 0 else "-"
        nex = rng.randint(2, 8)
        exons, p = [], pos
        for _ in range(nex):
            ln = rng.randint(100, 300)
            exons.append((p, p + ln - 1))
            p += ln + rng.randint(150, 900)
        for i, (s, e) in enumerate(exons):
            exno = i + 1 if strand == "+" else nex - i
            lines.append(
                f'{chrom}\tsyn\texon\t{s}\t{e}\t.\t{strand}\t.\t'
                f'gene_id "G{g}"; transcript_id "T{g}"; '
                f'gene_name "G{g}_n"; exon_number "{exno}";\n')
        genes.append((chrom, strand, exons))
        pos = p + 2000
    with open(gtf, "w") as f:
        f.writelines(lines)

    bcs = [_b4(c, 8) for c in range(N_CELLS)]
    with open(bcf, "w") as f:
        f.write("\n".join(f"{b}-1" for b in bcs))

    # molecule pool -> reads (realistic UMI duplication)
    n_mol = max(1, int(N_READS / READS_PER_MOL))
    mol_cell = rng.randint(N_CELLS, size=n_mol)
    mol_gene = rng.randint(N_GENES, size=n_mol)
    mol_umi = rng.randint(1 << 20, size=n_mol)
    read_mol = rng.randint(n_mol, size=N_READS)
    kinds = rng.rand(N_READS)
    flags = np.where(rng.rand(N_READS) < 0.5, 0, 16)

    recs = []
    for n in range(N_READS):
        m = read_mol[n]
        chrom, strand, exons = genes[mol_gene[m]]
        tags = {"CB": bcs[mol_cell[m]] + "-1", "UB": _b4(mol_umi[m]),
                "NH": 1}
        ref_id = 0 if chrom == "1" else 1
        kind = kinds[n]
        if kind < 0.35 and len(exons) >= 2:
            ei = rng.randint(len(exons) - 1)
            s0, e0 = exons[ei]
            s1, e1 = exons[ei + 1]
            half = rng.randint(15, min(48, e0 - s0))
            cig = [(0, half), (3, s1 - e0 - 1), (0, 98 - half)]
            recs.append(bamio.BamRecord(f"r{n}", flags[n], ref_id,
                                        e0 - half, cig, tags))
        elif kind < 0.6:
            ei = rng.randint(len(exons) - 1)
            istart, iend = exons[ei][1] + 1, exons[ei + 1][0] - 1
            if iend - istart < 110:
                continue
            recs.append(bamio.BamRecord(
                f"r{n}", flags[n], ref_id,
                rng.randint(istart, iend - 100), [(0, 98)], tags))
        elif kind < 0.88:
            ei = rng.randint(len(exons))
            s0, e0 = exons[ei]
            start = s0 if e0 - s0 < 110 else rng.randint(s0, e0 - 100)
            recs.append(bamio.BamRecord(f"r{n}", flags[n], ref_id, start,
                                        [(0, 98)], tags))
        else:
            ei = rng.randint(len(exons))
            s0, e0 = exons[ei]
            cig = [(4, 5), (0, 90)] if kind > 0.96 else [(0, 95)]
            recs.append(bamio.BamRecord(f"r{n}", flags[n], ref_id,
                                        max(0, e0 - 40), cig, tags))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    refs = [("1", 50_000_000), ("2", 50_000_000)]
    bamio.write_bam(bam, refs, recs)
    from velocyto_tpu.commands._run import _internal_cellsort
    _internal_cellsort(bam, cs, "CB")
    return gtf, bam, cs, bcf


def _load_bcs(bcf):
    return set(line.strip().split("-")[0]
               for line in open(bcf) if line.strip())


def run_ours(gtf, bam, cs, bcs) -> float:
    from velocyto_tpu.counting.counter import ExInCounter
    from velocyto_tpu.counting import logics
    c = ExInCounter("s", logics.Permissive10X, valid_bcset=bcs)
    c.peek(bam)
    c.read_transcriptmodels(gtf)
    t0 = time.perf_counter()
    c.mark_up_introns((bam,), multimap=False)
    d, order = c.count((cs,), multimap=False)
    wall = time.perf_counter() - t0
    tot = sum(int(np.concatenate(v, axis=1).sum()) for v in d.values() if v)
    print(f"# ours: {wall:.2f}s  molecules counted sum={tot} "
          f"cells={len(order)}", file=sys.stderr)
    return wall


def _install_ref_stubs():
    sys.path.insert(0, os.path.join(HERE, "tests", "golden"))
    import pysam_shim
    sys.modules["pysam"] = pysam_shim
    sys.modules["loompy"] = types.ModuleType("loompy")
    numba = types.ModuleType("numba")
    numba.jit = (lambda *a, **k: a[0] if (a and callable(a[0]))
                 else (lambda f: f))

    class _Ty:
        def __call__(self, *a):
            return None

        def __getitem__(self, x):
            return None

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
    sys.path.insert(0, "/root/reference")


def run_reference(gtf, bam, cs, bcs) -> float:
    _install_ref_stubs()
    import velocyto as rvcy
    c = rvcy.ExInCounter("s", rvcy.Permissive10X, valid_bcset=set(bcs))
    c.peek(bam)
    c.read_transcriptmodels(gtf)
    t0 = time.perf_counter()
    c.mark_up_introns((bam,), multimap=False)
    d, order = c.count((cs,), multimap=False)
    wall = time.perf_counter() - t0
    tot = sum(int(np.concatenate(v, axis=1).sum()) for v in d.values() if v)
    print(f"# reference: {wall:.2f}s  molecules counted sum={tot} "
          f"cells={len(order)}", file=sys.stderr)
    return wall


def decode_only(bam, cs) -> float:
    """Wall time of the python BAM decode the shim feeds the reference
    with (both passes), to adjust for the missing C pysam."""
    from velocyto_tpu.counting import bamio
    t0 = time.perf_counter()
    for path in (bam, cs):
        r = bamio.BamReader(path)
        for rec in r:
            rec.cigar
            rec.tags
    return time.perf_counter() - t0


def feeder_scaling(gtf, bam, cs, bcs, counts=(1, 2, 4)) -> dict:
    """Counting-pass reads/s at 1/2/4 feeder processes via the unified
    owner-pool mechanism (GTF parse + markup once, spawned workers).
    Only the COUNT pass is timed -- the prepared counter is shared."""
    from velocyto_tpu.parallel.feeders import (prepare_counter,
                                               feeder_byte_ranges)
    from velocyto_tpu.counting import soa_engine
    import numpy as np

    counter = prepare_counter([cs], gtf, valid_bcs=sorted(bcs),
                              markup_bamfiles=[bam])
    sorted_bcs = sorted(bcs)
    out = {}
    base = None
    for n in counts:
        splits = np.array_split(np.arange(len(sorted_bcs)), n)
        owners = [frozenset(sorted_bcs[i] for i in r) for r in splits]
        plan = feeder_byte_ranges(cs, owners)
        byte_ranges = plan[0] if plan else None
        t0 = time.perf_counter()
        results = soa_engine.run_owner_pool(counter, [cs], False, 100,
                                            owners, in_process=(n == 1),
                                            byte_ranges=byte_ranges)
        wall = time.perf_counter() - t0
        total = sum(int(m.sum()) for mats, *_ in results
                    for m in mats.values())
        # steady-state throughput: slowest worker's own count-pass time
        # (each worker reports it) -- spawn/import/unpickle startup is a
        # per-deployment constant, not per-BAM work
        work = max(r[5] for r in results)
        rps = N_READS / work
        if base is None:
            base = rps
        out[n] = {"reads_per_sec": round(rps, 1),
                  "speedup_vs_1": round(rps / base, 2),
                  "wall_incl_startup_s": round(wall, 2),
                  "molecules": total}
        print(f"# feeders={n}: work={work:.2f}s wall={wall:.2f}s "
              f"{rps:,.0f} reads/s (x{rps/base:.2f})", file=sys.stderr)

    # contention-free per-feeder work: ONE worker counting ONE 1/n slice
    # (what each host of an n-host deployment actually does)
    for n in counts:
        if n == 1:
            continue
        splits = np.array_split(np.arange(len(sorted_bcs)), n)
        owners = [frozenset(sorted_bcs[i] for i in r) for r in splits]
        plan = feeder_byte_ranges(cs, owners)
        if plan is None:
            break
        t0 = time.perf_counter()
        soa_engine.run_owner_pool(counter, [cs], False, 100, [owners[0]],
                                  in_process=True,
                                  byte_ranges=[plan[0][0]])
        solo = time.perf_counter() - t0
        out[n]["solo_slice_seconds"] = round(solo, 2)
        print(f"# solo 1/{n} slice: {solo:.2f}s "
              f"(serial/{n} = {out[1]['wall_incl_startup_s']/n:.2f}s ideal)",
              file=sys.stderr)
    return out


def markup_scaling(gtf, bam, bcs, counts=(1, 2, 4)) -> dict:
    """Pass-1 (intron-validation markup) scaling via ranged decode over
    native record-boundary splits.  Reports, per worker count: the
    slowest worker's own scan time (steady-state work; spawn/import
    startup is a per-deployment constant reported separately) and the
    solo time of one 1/n slice (the contention-free per-host work of an
    n-host deployment -- this 2-core VM cannot run n scans at full
    speed: the serial scan itself already uses ~1.6 cores via the
    inflate pipeline)."""
    from velocyto_tpu.counting.counter import ExInCounter
    from velocyto_tpu.counting import logics, soa_engine
    from velocyto_tpu import native

    def build():
        c = ExInCounter("s", logics.Permissive10X, valid_bcset=set(bcs))
        c.peek(bam)
        c.read_transcriptmodels(gtf)
        return c

    out = {}
    # serial baseline: best of 3 (page-cache warm)
    walls = []
    for _ in range(3):
        c = build()
        t0 = time.perf_counter()
        c.mark_up_introns((bam,), multimap=False)
        walls.append(time.perf_counter() - t0)
    serial = min(walls)
    marks_ser = {k: fa.is_validated.copy()
                 for k, fa in c.feature_indexes.items()}
    out[1] = {"seconds": round(serial, 3), "speedup_vs_1": 1.0}
    print(f"# markup serial: {serial:.2f}s", file=sys.stderr)
    for n in counts:
        if n == 1:
            continue
        c = build()
        t0 = time.perf_counter()
        c.mark_up_introns((bam,), multimap=False, n_workers=n)
        wall = time.perf_counter() - t0
        for k in marks_ser:
            assert np.array_equal(marks_ser[k],
                                  c.feature_indexes[k].is_validated), k
        # per-slice work: time ONE 1/n slice in-process (ranged); best
        # of 2 (the first call pays one-time buffer allocation)
        ranges = native.bam_record_ranges(bam, n)
        c2 = build()
        soa_engine._init_pool_worker(__import__("pickle").dumps(c2))
        solos = []
        for _ in range(2):
            t0 = time.perf_counter()
            soa_engine._pool_markup_task(bam, False, ranges[0])
            solos.append(time.perf_counter() - t0)
        solo = min(solos)
        out[n] = {"wall_incl_startup_s": round(wall, 2),
                  "solo_slice_seconds": round(solo, 3),
                  "speedup_per_worker_work": round(serial / solo, 2),
                  "ideal_slice_seconds": round(serial / n, 3)}
        print(f"# markup workers={n}: wall={wall:.2f}s solo 1/{n} slice "
              f"{solo:.2f}s (ideal {serial/n:.2f}s)", file=sys.stderr)
    return out


def main():
    work = os.environ.get("VTPU_BENCH_DIR",
                          os.path.join("/tmp", "vtpu_bench_counting"))
    os.makedirs(work, exist_ok=True)
    t0 = time.perf_counter()
    gtf, bam, cs, bcf = make_fixture(work)
    print(f"# fixture ready in {time.perf_counter()-t0:.1f}s "
          f"({N_READS} reads, {N_CELLS} cells)", file=sys.stderr)
    bcs = _load_bcs(bcf)

    if os.environ.get("VTPU_BENCH_FEEDERS"):
        print(json.dumps({"metric": "feeder_scaling_reads_per_sec",
                          "unit": f"reads/s ({N_READS} reads, count pass)",
                          "feeders": feeder_scaling(gtf, bam, cs, bcs),
                          "markup": markup_scaling(gtf, bam, bcs)}))
        return

    ours = run_ours(gtf, bam, cs, bcs)
    ref = run_reference(gtf, bam, cs, bcs)
    dec = decode_only(bam, cs)
    ref_adj = max(ref - dec, 1e-9)

    ours_rps = N_READS / ours
    ref_rps = N_READS / ref
    ref_adj_rps = N_READS / ref_adj
    print(json.dumps({"metric": "counting_reads_per_sec",
                      "value": round(ours_rps, 1),
                      "unit": f"reads/s ({N_READS} reads, two-pass)",
                      "vs_baseline": round(ref_rps, 1),
                      "vs_baseline_decode_adjusted": round(ref_adj_rps, 1),
                      "speedup": round(ours_rps / ref_rps, 2),
                      "speedup_adjusted": round(ours_rps / ref_adj_rps, 2)}))


if __name__ == "__main__":
    main()
