"""Counting engine tests: CIGAR, GTF parsing, BAM roundtrip, and
differential validation of the vectorized engine against the literal
object-mode oracle."""
import os

import numpy as np
import pytest

import velocyto_tpu as vt
from velocyto_tpu.counting import bamio
from velocyto_tpu.counting.reads import Read, parse_cigar_tuple
from velocyto_tpu.counting.counter import ExInCounter
from velocyto_tpu.counting.logics import LOGICS

from counting_oracle import oracle_count_batch, oracle_markup


# ---------------------------------------------------------------------------
# CIGAR
# ---------------------------------------------------------------------------

def test_cigar_basic_match():
    segs, skip, c5, c3 = parse_cigar_tuple([(0, 100)], 1000)
    assert segs == [(1000, 1099)] and not skip and c5 == 0 and c3 == 0


def test_cigar_ref_skip():
    segs, skip, c5, c3 = parse_cigar_tuple([(0, 50), (3, 200), (0, 50)], 1000)
    assert segs == [(1000, 1049), (1250, 1299)]
    assert skip


def test_cigar_small_deletion_merges():
    segs, skip, *_ = parse_cigar_tuple([(0, 50), (2, 2), (0, 50)], 1000)
    assert segs == [(1000, 1101)]           # merged across the 2bp deletion
    segs, *_ = parse_cigar_tuple([(0, 50), (2, 10), (0, 50)], 1000)
    assert segs == [(1000, 1049), (1060, 1109)]  # large deletion not merged


def test_cigar_insertion_merges():
    segs, *_ = parse_cigar_tuple([(0, 50), (1, 2), (0, 50)], 1000)
    assert segs == [(1000, 1099)]


def test_cigar_softclip_advances_cursor():
    # reference quirk: soft clips advance the position cursor
    segs, skip, c5, c3 = parse_cigar_tuple([(4, 10), (0, 50), (4, 5)], 1000)
    assert c5 == 10 and c3 == 5
    assert segs == [(1010, 1059)]


# ---------------------------------------------------------------------------
# BAM roundtrip
# ---------------------------------------------------------------------------

def test_bam_roundtrip(tmp_path):
    recs = [
        bamio.BamRecord("r1", 0, 0, 999, [(0, 100)],
                        {"CB": "AAACCC-1", "UB": "CATCAT", "NH": 1},
                        seq="A" * 100),
        bamio.BamRecord("r2", 16, 1, 500, [(0, 30), (3, 100), (0, 20)],
                        {"CB": "GGGTTT-1", "UB": "TGCTGC", "NH": 1},
                        seq="C" * 50),
    ]
    path = str(tmp_path / "t.bam")
    bamio.write_bam(path, [("chr1", 10000), ("chr2", 5000)], recs)
    reader = bamio.BamReader(path)
    assert reader.references == ["chr1", "chr2"]
    got = list(reader)
    assert len(got) == 2
    assert got[0].name == "r1" and got[0].pos == 999
    assert got[0].tags["CB"] == "AAACCC-1"
    assert got[1].is_reverse
    assert got[1].cigar == [(0, 30), (3, 100), (0, 20)]
    assert got[0].seq == "A" * 100


# ---------------------------------------------------------------------------
# GTF fixture
# ---------------------------------------------------------------------------

def _gtf_line(chrom, ftype, start, end, strand, trid, gene, exno):
    tags = (f'gene_id "{gene}"; transcript_id "{trid}"; '
            f'gene_name "{gene}_name"; transcript_name "{trid}_name"; '
            f'exon_number "{exno}";')
    return f"{chrom}\ttest\t{ftype}\t{start}\t{end}\t.\t{strand}\t.\t{tags}\n"


@pytest.fixture
def small_gtf(tmp_path):
    lines = [
        # gene A (+): A1 three exons, A2 skips the middle one
        _gtf_line("1", "exon", 1000, 1200, "+", "A1", "GA", 1),
        _gtf_line("1", "exon", 2000, 2200, "+", "A1", "GA", 2),
        _gtf_line("1", "exon", 3000, 3200, "+", "A1", "GA", 3),
        _gtf_line("1", "exon", 1000, 1200, "+", "A2", "GA", 1),
        _gtf_line("1", "exon", 3000, 3200, "+", "A2", "GA", 2),
        # gene B (-): two exons, numbering follows the minus strand
        _gtf_line("1", "exon", 6000, 6200, "-", "B1", "GB", 1),
        _gtf_line("1", "exon", 5000, 5200, "-", "B1", "GB", 2),
        # gene C on chr2 (+): single exon
        _gtf_line("2", "exon", 100, 900, "+", "C1", "GC", 1),
        # gene E (+) far away on chr1 so it does not overlap gene A
        _gtf_line("1", "exon", 50000, 50500, "+", "E1", "GE", 1),
        _gtf_line("1", "exon", 51000, 51400, "+", "E1", "GE", 2),
    ]
    path = str(tmp_path / "ann.gtf")
    with open(path, "w") as f:
        f.writelines(lines)
    return path


def test_gtf_parsing(small_gtf):
    counter = ExInCounter("s", vt.Permissive10X)
    ann = counter.read_transcriptmodels(small_gtf)
    assert set(ann.keys()) == {"1+", "1-", "2+"}
    a1 = ann["1+"]["A1"]
    kinds = [chr(f.kind) + str(f.exin_no) for f in a1.list_features]
    assert kinds == ["e1", "i1", "e2", "i2", "e3"]
    assert a1.list_features[1].start == 1201
    assert a1.list_features[1].end == 1999
    a2 = ann["1+"]["A2"]
    kinds2 = [chr(f.kind) + str(f.exin_no) for f in a2.list_features]
    assert kinds2 == ["e1", "i1", "e2"]
    b1 = ann["1-"]["B1"]
    # minus strand: intron numbering decrements from the last exon
    kinds_b = [chr(f.kind) + str(f.exin_no) for f in b1.list_features]
    assert kinds_b == ["e2", "i1", "e1"]
    # the reference sort key orders "-" before "+" within a chromosome
    # (counter.py:465-468: x[6]=="+" is False<True), so GB precedes GA
    assert counter.geneid2ix["GB"] == 0
    assert counter.geneid2ix["GA"] == 1
    # intron neighbor navigation
    i1 = a1.list_features[1]
    assert i1.get_upstream_exon() is a1.list_features[0]
    assert i1.get_downstream_exon() is a1.list_features[2]
    bi = b1.list_features[1]
    # minus strand (reference feature.py:45-75): downstream of intron n is
    # exon n = the genomically-right feature, upstream is the left one
    assert bi.get_downstream_exon() is b1.list_features[2]
    assert bi.get_upstream_exon() is b1.list_features[0]


# ---------------------------------------------------------------------------
# markup + counting vs oracle
# ---------------------------------------------------------------------------

def _mk_read(bc, umi, chrom, strand, segments, spliced=False):
    return Read(bc, umi, chrom, strand, segments[0][0], list(segments),
                0, 0, spliced)


def _hand_reads():
    return [
        # pure exonic in A exon1 -> spliced
        _mk_read("c1", "u1", "1", "+", [(1050, 1150)]),
        # intronic in A1 intron1 (inside A2 intron too) -> unspliced
        _mk_read("c1", "u2", "1", "+", [(1300, 1400)]),
        # exon-intron spanning (validates A intron1) -> spanning/unspliced
        _mk_read("c1", "u3", "1", "+", [(1150, 1260)]),
        # read in A1 exon2 (2000-2200): exon for A1, intron for A2 ->
        # ambiguous candidate
        _mk_read("c2", "u4", "1", "+", [(2050, 2150)]),
        # spliced junction read matching both A1 (e1-e3?) and A2
        _mk_read("c2", "u5", "1", "+", [(1150, 1200), (3000, 3050)], True),
        # minus-strand gene B exonic
        _mk_read("c2", "u6", "1", "-", [(6050, 6150)]),
        # chr2 single-exon gene C
        _mk_read("c3", "u7", "2", "+", [(200, 300)]),
        # read on unannotated chromosome
        _mk_read("c3", "u8", "9", "+", [(100, 200)]),
        # two reads same molecule: one exonic one intronic (intersection)
        _mk_read("c3", "u9", "1", "+", [(1050, 1150)]),
        _mk_read("c3", "u9", "1", "+", [(1300, 1400)]),
    ]


@pytest.mark.parametrize("logic_name", ["Permissive10X", "Intermediate10X",
                                        "ValidatedIntrons10X", "Stricter10X",
                                        "ObservedSpanning10X",
                                        "Discordant10X", "SmartSeq2"])
def test_count_matches_oracle_hand_reads(small_gtf, logic_name):
    logic = LOGICS[logic_name]
    counter = ExInCounter("s", logic)
    counter.read_transcriptmodels(small_gtf)
    reads = _hand_reads()

    # markup from the spanning reads (both engines)
    segs = {}
    for r in reads:
        if not r.is_spliced:
            segs.setdefault(r.chrom + r.strand, []).extend(r.segments)
    for cs, ss in segs.items():
        if cs in counter.feature_indexes:
            arr = np.asarray(ss, dtype=np.int64)
            counter.feature_indexes[cs].mark_overlapping(arr[:, 0], arr[:, 1])
    oracle_markup(sorted(reads), counter.annotations_by_chrm_strand)

    bcs = sorted({r.bc for r in reads})
    bc2idx = {b: i for i, b in enumerate(bcs)}
    shape = (len(counter.geneid2ix), len(bcs))
    expected = oracle_count_batch(reads, counter.annotations_by_chrm_strand,
                                  counter.mask_ivls_by_chromstrand, logic,
                                  counter.geneid2ix, shape, bc2idx)

    counter.reads_to_count = list(reads)
    counter.cell_batch = set(bcs)
    got, got_bcs = counter.count_cell_batch()
    perm = [got_bcs.index(b) for b in bcs]
    for layer in logic.layers:
        np.testing.assert_array_equal(got[layer][:, perm], expected[layer],
                                      err_msg=f"layer {layer}")


def test_basic_classification(small_gtf):
    """Sanity-check absolute outcomes for Permissive10X."""
    counter = ExInCounter("s", vt.Permissive10X)
    counter.read_transcriptmodels(small_gtf)
    reads = _hand_reads()
    counter.reads_to_count = list(reads)
    counter.cell_batch = {r.bc for r in reads}
    got, bcs = counter.count_cell_batch()
    ga = counter.geneid2ix["GA"]
    gb = counter.geneid2ix["GB"]
    gc = counter.geneid2ix["GC"]
    c = {b: i for i, b in enumerate(bcs)}
    assert got["spliced"][ga, c["c1"]] == 1        # u1
    assert got["unspliced"][ga, c["c1"]] >= 1      # u2 intronic
    assert got["ambiguous"][ga, c["c2"]] == 1      # u4 exon-of-A1/intron-of-A2
    assert got["spliced"][ga, c["c2"]] == 1        # u5 junction
    # u6 hits ONLY the last feature of the 1- index: the reference scan
    # (`while i < maxiidx`, indexes.py:236) never examines the last
    # feature, so the molecule is dropped -- replicated for parity
    assert got["spliced"][gb, c["c2"]] == 0
    # u7: gene C is a single-exon gene = the only feature on 2+, and the
    # same off-by-one drops it too (maxiidx == 0)
    assert got["spliced"][gc, c["c3"]] == 0


def _random_models(rng, chrom, strand, n_genes=4, tx_per_gene=2):
    lines = []
    pos = 1000
    for g in range(n_genes):
        gene = f"G{chrom}{strand}{g}"
        n_ex = rng.randint(2, 5)
        exons = []
        p = pos
        for _ in range(n_ex):
            length = rng.randint(80, 300)
            gap = rng.randint(60, 500)
            exons.append((p, p + length))
            p += length + gap
        pos = p + rng.randint(200, 1500)
        for t in range(tx_per_gene):
            trid = f"T{gene}_{t}"
            keep = sorted(rng.choice(len(exons),
                                     size=max(2, rng.randint(2, len(exons) + 1)),
                                     replace=False))
            if strand == "+":
                for i, e in enumerate(keep):
                    lines.append(_gtf_line(chrom, "exon", exons[e][0],
                                           exons[e][1], strand, trid, gene,
                                           i + 1))
            else:
                for i, e in enumerate(keep):
                    lines.append(_gtf_line(chrom, "exon", exons[e][0],
                                           exons[e][1], strand, trid, gene,
                                           len(keep) - i))
    return lines


def _random_reads(rng, lo, hi, chroms, n=300):
    reads = []
    for i in range(n):
        chrom = chroms[rng.randint(len(chroms))]
        strand = "+-"[rng.randint(2)]
        bc = f"c{rng.randint(6)}"
        umi = f"u{rng.randint(60)}"
        start = rng.randint(lo, hi)
        if rng.rand() < 0.25:   # spliced two-segment read
            l1 = rng.randint(20, 120)
            gap = rng.randint(50, 800)
            l2 = rng.randint(20, 120)
            segs = [(start, start + l1), (start + l1 + gap,
                                          start + l1 + gap + l2)]
            spliced = True
        else:
            segs = [(start, start + rng.randint(20, 400))]
            spliced = False
        reads.append(_mk_read(bc, umi, chrom, strand, segs, spliced))
    return reads


@pytest.mark.parametrize("logic_name", ["Permissive10X", "ValidatedIntrons10X",
                                        "Stricter10X", "Discordant10X",
                                        "SmartSeq2"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_count_matches_oracle_fuzz(tmp_path, logic_name, seed):
    rng = np.random.RandomState(seed)
    lines = (_random_models(rng, "1", "+") + _random_models(rng, "1", "-") +
             _random_models(rng, "2", "+", n_genes=2))
    path = str(tmp_path / f"fuzz{seed}.gtf")
    with open(path, "w") as f:
        f.writelines(lines)
    logic = LOGICS[logic_name]
    counter = ExInCounter("s", logic)
    counter.read_transcriptmodels(path)

    reads = _random_reads(rng, 900, 9000, ["1", "2"], n=400)

    # markup (both engines share Feature objects: run vectorized first,
    # then verify the oracle agrees on is_validated)
    segs = {}
    for r in sorted(reads):
        if not r.is_spliced:
            segs.setdefault(r.chrom + r.strand, []).extend(r.segments)
    before = {cs: fa.is_validated.copy()
              for cs, fa in counter.feature_indexes.items()}
    for cs, ss in segs.items():
        if cs in counter.feature_indexes:
            arr = np.asarray(ss, dtype=np.int64)
            counter.feature_indexes[cs].mark_overlapping(arr[:, 0], arr[:, 1])
    # snapshot vectorized result, reset object flags, run oracle, compare
    vec_valid = {cs: np.array([f.is_validated for f in fa.features])
                 for cs, fa in counter.feature_indexes.items()}
    for fa in counter.feature_indexes.values():
        for f in fa.features:
            f.is_validated = False
    oracle_markup(sorted(reads), counter.annotations_by_chrm_strand)
    for cs, fa in counter.feature_indexes.items():
        orc = np.array([f.is_validated for f in fa.features])
        np.testing.assert_array_equal(vec_valid[cs], orc,
                                      err_msg=f"markup mismatch {cs}")
        # restore (object flags already set by oracle; sync array flags)
        fa.is_validated[:] = orc

    bcs = sorted({r.bc for r in reads})
    bc2idx = {b: i for i, b in enumerate(bcs)}
    shape = (len(counter.geneid2ix), len(bcs))
    expected = oracle_count_batch(reads, counter.annotations_by_chrm_strand,
                                  counter.mask_ivls_by_chromstrand, logic,
                                  counter.geneid2ix, shape, bc2idx)
    counter.reads_to_count = list(reads)
    counter.cell_batch = set(bcs)
    got, got_bcs = counter.count_cell_batch()
    perm = [got_bcs.index(b) for b in bcs]
    for layer in logic.layers:
        np.testing.assert_array_equal(got[layer][:, perm], expected[layer],
                                      err_msg=f"layer {layer} seed {seed}")


# ---------------------------------------------------------------------------
# dump reports + 3' utils
# ---------------------------------------------------------------------------

def test_dump_report(small_gtf, tmp_path):
    import h5py
    counter = ExInCounter("dumpsample", vt.Permissive10X, dump_option="1",
                          outputfolder=str(tmp_path))
    counter.read_transcriptmodels(small_gtf)
    reads = _hand_reads()
    counter.reads_to_count = list(reads)
    counter.cell_batch = {r.bc for r in reads}
    counter.count_cell_batch()
    path = tmp_path / "dump" / "dumpsample.hdf5"
    assert path.exists()
    with h5py.File(path, "r") as f:
        assert "info/tr_id" in f
        n = f["info/tr_id"].shape[0]
        assert f["info/start_end"].shape == (n, 2)
        cells = list(f.get("cells", {}))
        assert len(cells) >= 1
        c0 = cells[0]
        assert f[f"cells/{c0}/pos"].shape[1] == 2
        assert (f[f"cells/{c0}/ixs"][:] < n).all()


def test_closest_3prime(small_gtf):
    from velocyto_tpu.counting.threeprime import closest_3prime
    from velocyto_tpu.counting.molecules import SegmentMatch
    counter = ExInCounter("s", vt.Permissive10X)
    ann = counter.read_transcriptmodels(small_gtf)
    a1 = ann["1+"]["A1"]
    e1, i1, e2, i2, e3 = a1.list_features
    # from position 1100 in exon1: 101 bases of e1 + e2 (201) + e3 (201)
    d = closest_3prime(SegmentMatch((1100, 1150), e1))
    assert d == (1200 - 1100 + 1) + 201 + 201
    # from the middle of intron1: rest of intron + downstream e2 + e3
    d = closest_3prime(SegmentMatch((1500, 1550), i1))
    assert d == (1999 - 1500 + 1) + 201 + 201
    b1 = ann["1-"]["B1"]
    eb2, ib1, eb1 = b1.list_features
    # minus strand: from 5100 in eb2 (the 3'-most exon on minus is eb2?
    # exon numbering: eb1 is exon 1 (rightmost); walking 3' goes left)
    d = closest_3prime(SegmentMatch((5050, 5100), eb2))
    assert d == (5100 - 5000 + 1)


def test_objectmode_matches_array_mode(small_gtf):
    """The packaged object-mode engine agrees with the array engine."""
    from velocyto_tpu.counting.objectmode import build_molitems, count_molitems
    counter = ExInCounter("s", vt.Permissive10X)
    counter.read_transcriptmodels(small_gtf)
    reads = _hand_reads()
    bcs = sorted({r.bc for r in reads})
    bc2idx = {b: i for i, b in enumerate(bcs)}
    shape = (len(counter.geneid2ix), len(bcs))
    molitems = build_molitems(reads, counter.annotations_by_chrm_strand,
                              counter.mask_ivls_by_chromstrand,
                              vt.Permissive10X)
    exp = count_molitems(molitems, vt.Permissive10X, counter.geneid2ix,
                         bc2idx, shape)
    counter.reads_to_count = list(reads)
    counter.cell_batch = set(bcs)
    got, got_bcs = counter.count_cell_batch()
    perm = [got_bcs.index(b) for b in bcs]
    for layer in vt.Permissive10X.layers:
        np.testing.assert_array_equal(got[layer][:, perm], exp[layer])
