"""ExInCounter: the two-pass exon/intron molecule-counting engine.

API parity with the reference counter (velocyto/counter.py:20-798), with
a different execution model: instead of per-read Python object walks,
reads are decoded in batches (C++ BGZF/BAM decoder with a pure-python
fallback), matched against the flattened feature index with vectorized
window predicates, and classified with grouped array ops
(velocyto_tpu.counting.molecules.assemble_and_classify).

Pass 1 (mark_up_introns) validates introns via exon-intron boundary
spanning reads; pass 2 (count) runs on the cell-sorted BAM in batches of
`cell_batch_size` cells.
"""
from __future__ import annotations

import logging
import os
import random
import string
from collections import defaultdict
from itertools import chain
from typing import Any, Dict, Iterable, List, Optional, Set, Tuple

import numpy as np

from ..constants import (MATCH_INSIDE, PLACEHOLDER_UMI_LEN, MAX_READ_SPAN,
                         LOOM_NUMERIC_DTYPE)
from . import bamio
from .gtf import GeneInfo, TranscriptModel, read_repeats, read_transcriptmodels
from .features import (FeatureArrays, build_feature_arrays, build_mask_arrays)
from .logics import Logic, LOGICS, NONE, _LAYER_OF_ACTION
from .molecules import (RecordArrays, build_read_records,
                        assemble_and_classify,
                        F_INTRON, F_EXON, F_VALID, F_SPAN_GATED,
                        F_SPAN_UNGATED)
from .reads import Read, parse_cigar_tuple, normalize_chrom


def reverse(strand: str) -> str:
    if strand == "+":
        return "-"
    if strand == "-":
        return "+"
    raise ValueError(f"Unknown strand {strand}")


class ExInCounter:
    """Main counting engine (reference counter.py:20-76 constructor)."""

    def __init__(self, sampleid: str, logic: Any,
                 valid_bcset: Optional[Set[str]] = None,
                 umi_extension: str = "no", onefilepercell: bool = False,
                 dump_option: str = "0", outputfolder: str = "./",
                 loom_numeric_dtype: str = LOOM_NUMERIC_DTYPE) -> None:
        self.outputfolder = outputfolder
        self.sampleid = sampleid
        self.loom_numeric_dtype = loom_numeric_dtype
        self.logic: Logic = logic() if isinstance(logic, type) else logic
        if valid_bcset is None:
            self.valid_bcset: Set[str] = set()
            self.filter_mode = False
        else:
            self.valid_bcset = valid_bcset
            self.filter_mode = True
        self.annotations_by_chrm_strand: Dict[str, Dict[str, TranscriptModel]] = {}
        self.mask_ivls_by_chromstrand: Dict[str, List] = defaultdict(list)
        self.geneid2ix: Dict[str, int] = {}
        self.genes: Dict[str, GeneInfo] = {}
        self.feature_indexes: Dict[str, FeatureArrays] = {}
        self.mask_indexes: Dict[str, FeatureArrays] = {}

        umi_low = umi_extension.lower()
        if umi_low == "no":
            self.umi_extension = "no"
        elif umi_low == "chr":
            self.umi_extension = "chr"
        elif umi_low in ("gene", "gx"):
            self.umi_extension = "Gene"
        elif umi_extension[-2:] == "bp":
            self.umi_extension = "Nbp"
            self.umi_bp = int(umi_extension[:-2])
        elif umi_low == "without_umi":
            self.umi_extension = "without_umi"
        else:
            raise ValueError(f"umi_extension {umi_extension} is not allowed. "
                             "Use `no`, `chr`, `Gene` or `[N]bp`")
        self.onefilepercell = onefilepercell
        self.dump_option = dump_option
        from .dump import DumpWriter
        self.dump_writer = DumpWriter(dump_option, sampleid, outputfolder)
        self.cellbarcode_str = "NULL_BC"
        self.umibarcode_str = "NULL_UB"

    # ------------------------------------------------------------------
    # tag sniffing (reference counter.py:131-191)
    # ------------------------------------------------------------------

    def peek(self, bamfile: str, lines: int = 1000) -> None:
        cellranger = dropseq = failed = 0
        for i, rec in enumerate(bamio.BamReader(bamfile)):
            if rec.is_unmapped:
                continue
            if "CB" in rec.tags and "UB" in rec.tags:
                cellranger += 1
            elif "XC" in rec.tags and "XM" in rec.tags:
                dropseq += 1
            else:
                failed += 1
            if cellranger > lines:
                self.cellbarcode_str, self.umibarcode_str = "CB", "UB"
                return
            if dropseq > lines:
                self.cellbarcode_str, self.umibarcode_str = "XC", "XM"
                return
            if failed > 5 * lines:
                raise IOError(
                    "The bam file does not contain cell and umi barcodes "
                    "appropriately formatted. If you are running UMI-less "
                    "data you should use the -U flag.")
        # small files: pick whichever was seen
        if cellranger >= dropseq and cellranger > 0:
            self.cellbarcode_str, self.umibarcode_str = "CB", "UB"
        elif dropseq > 0:
            self.cellbarcode_str, self.umibarcode_str = "XC", "XM"
        else:
            raise IOError("No cell/umi barcodes found in the bam file")

    def peek_umi_only(self, bamfile: str, lines: int = 30) -> None:
        cellranger = dropseq = failed = 0
        for rec in bamio.BamReader(bamfile):
            if rec.is_unmapped:
                continue
            if "UB" in rec.tags:
                cellranger += 1
            elif "XM" in rec.tags:
                dropseq += 1
            else:
                failed += 1
            if cellranger > lines:
                self.umibarcode_str = "UB"
                return
            if dropseq > lines:
                self.umibarcode_str = "XM"
                return
            if failed > 5 * lines:
                raise IOError("The bam file does not contain umi barcodes "
                              "appropriately formatted.")
        if cellranger >= dropseq and cellranger > 0:
            self.umibarcode_str = "UB"
        elif dropseq > 0:
            self.umibarcode_str = "XM"

    # ------------------------------------------------------------------
    # umi/barcode extraction (reference counter.py:193-215)
    # ------------------------------------------------------------------

    def _umi_of(self, rec: bamio.BamRecord) -> Optional[str]:
        if self.umi_extension == "without_umi":
            return "".join(random.choice(string.ascii_uppercase + string.digits)
                           for _ in range(PLACEHOLDER_UMI_LEN))
        umi = rec.tags.get(self.umibarcode_str)
        if umi is None:
            return None
        if self.umi_extension == "no":
            return umi
        if self.umi_extension == "chr":
            return f"{umi}_{rec.ref_id}:{rec.pos // 10000000}"
        if self.umi_extension == "Gene":
            gx = rec.tags.get("GX")
            return f"{umi}_{gx}" if gx is not None else f"{umi}_withoutGX"
        if self.umi_extension == "Nbp":
            return umi + rec.seq[:self.umi_bp]
        return umi

    def _bc_of(self, rec: bamio.BamRecord, bamfile_label: str) -> Optional[str]:
        if self.onefilepercell:
            return bamfile_label
        bc = rec.tags.get(self.cellbarcode_str)
        if bc is None:
            return None
        return bc.split("-")[0]

    # ------------------------------------------------------------------
    # annotation loading (reference counter.py:308-552)
    # ------------------------------------------------------------------

    def read_transcriptmodels(self, gtf_file: str):
        self.annotations_by_chrm_strand = read_transcriptmodels(
            gtf_file, self.geneid2ix, self.genes)
        self.feature_indexes = build_feature_arrays(
            self.annotations_by_chrm_strand, self.geneid2ix)
        # global tm id offsets per chromstrand
        self._tm_offset: Dict[str, int] = {}
        off = 0
        for cs, fa in self.feature_indexes.items():
            self._tm_offset[cs] = off
            off += len(fa.tm_list)
        return self.annotations_by_chrm_strand

    def read_repeats(self, gtf_file: str, tolerance: int = 5):
        self.mask_ivls_by_chromstrand = read_repeats(gtf_file, tolerance)
        self.mask_indexes = build_mask_arrays(self.mask_ivls_by_chromstrand)
        return self.mask_ivls_by_chromstrand

    # ------------------------------------------------------------------
    # read iteration (reference counter.py:217-306)
    # ------------------------------------------------------------------

    def iter_alignments(self, bamfiles: Iterable[str], unique: bool = True
                        ) -> Iterable[Optional[Read]]:
        """Yield Read objects; None at each file boundary."""
        bamfiles = list(bamfiles)
        from collections import Counter as _Counter
        use_basename = _Counter(bamfiles).most_common(1)[0][1] == 1
        skipped_no_barcode = 0
        for bamfile in bamfiles:
            label = os.path.basename(bamfile) if use_basename else str(bamfile)
            reader = bamio.BamReader(bamfile)
            refs = [normalize_chrom(r) for r in reader.references]
            for rec in reader:
                if rec.is_unmapped:
                    continue
                if unique and rec.tags.get("NH", 1) != 1:
                    continue
                bc = self._bc_of(rec, label)
                umi = self._umi_of(rec)
                if bc is None or umi is None:
                    skipped_no_barcode += 1
                    continue
                if bc not in self.valid_bcset:
                    if self.filter_mode:
                        continue
                    self.valid_bcset.add(bc)
                strand = "-" if rec.is_reverse else "+"
                chrom = refs[rec.ref_id]
                pos = rec.pos + 1
                segments, ref_skipped, clip5, clip3 = parse_cigar_tuple(
                    rec.cigar, pos)
                if not segments:
                    continue
                read = Read(bc, umi, chrom, strand, pos, segments, clip5,
                            clip3, ref_skipped)
                if read.span > MAX_READ_SPAN:
                    logging.warning("Trashing read, too long span")
                    continue
                yield read
            yield None
        logging.debug(f"{skipped_no_barcode} reads without barcode skipped")

    # ------------------------------------------------------------------
    # pass 1: intron validation markup (reference counter.py:622-699)
    # ------------------------------------------------------------------

    def _fastpath_ok(self) -> bool:
        """The SoA engine covers every umi-extension mode; only --dump
        reports fall back to object mode (they need the per-molecule
        object graph)."""
        return not self.dump_writer.active

    def _soa_engine(self):
        if getattr(self, "_soa", None) is None:
            from .soa_engine import SoaEngine
            self._soa = SoaEngine(self)
        return self._soa

    def _append_batch_result(self, dict_layer_columns, list_bcs,
                             dict_list_arrays, cell_bcs_order) -> None:
        """Accumulate one cell batch's count columns, applying the
        <=80-molecule cell filter in discovery mode
        (reference counter.py:764-781)."""
        if not len(list_bcs):
            return
        if not self.filter_mode:
            tot_mol = dict_layer_columns["spliced"].sum(0) + \
                dict_layer_columns["unspliced"].sum(0)
            keep = tot_mol > 80
            cell_bcs_order += list(np.array(list_bcs)[keep])
            for layer_name, cols in dict_layer_columns.items():
                dict_list_arrays[layer_name].append(cols[:, keep])
        else:
            cell_bcs_order += list_bcs
            for layer_name, cols in dict_layer_columns.items():
                dict_list_arrays[layer_name].append(cols)

    def mark_up_introns(self, bamfile: Iterable[str], multimap: bool,
                        n_workers: int = 1) -> None:
        """Pass-1 intron-validation scan.  n_workers > 1 splits each BAM
        into record-boundary byte ranges (native scan) and marks them in
        parallel spawned workers with OR-merged flags -- bit-identical
        to the serial scan (marking is order-independent; the
        chromosome-sorted check composes across slices).  The reference
        has no parallel pass 1 (reference counter.py:622-699)."""
        if not self.logic.perform_validation_markup:
            return
        if self._fastpath_ok():
            if n_workers > 1:
                from .soa_engine import run_markup_pool
                if run_markup_pool(self, [str(b) for b in bamfile],
                                   multimap, n_workers):
                    self._log_markup_summary()
                    return
            self._soa_engine().mark_up_introns(bamfile, multimap)
            self._log_markup_summary()
            return
        buffers: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
        currchrom = ""
        chromosomes_seen: Set[str] = set()

        def flush(cs: Optional[str] = None) -> None:
            keys = [cs] if cs is not None else list(buffers.keys())
            for k in keys:
                segs = buffers.pop(k, [])
                if not segs or k not in self.feature_indexes:
                    continue
                arr = np.asarray(segs, dtype=np.int64)
                self.feature_indexes[k].mark_overlapping(arr[:, 0], arr[:, 1])

        for r in self.iter_alignments(bamfile, unique=not multimap):
            if r is None:
                flush()
                currchrom = ""
                chromosomes_seen = set()
                continue
            if r.is_spliced:
                # spliced reads are not considered for validation
                continue
            if r.chrom != currchrom:
                if r.chrom in chromosomes_seen:
                    raise IOError("Input .bam file should be "
                                  "chromosome-sorted. (Hint: samtools sort)")
                chromosomes_seen.add(r.chrom)
                currchrom = r.chrom
            cs = r.chrom + r.strand
            buf = buffers[cs]
            buf.extend(r.segments)
            if len(buf) >= 200_000:
                flush(cs)
        flush()
        self._log_markup_summary()

    def _log_markup_summary(self) -> None:
        n_introns = sum(int((fa.kind == ord("i")).sum())
                        for fa in self.feature_indexes.values())
        n_valid = sum(int(fa.is_validated.sum())
                      for fa in self.feature_indexes.values())
        logging.debug(f"Validated {n_valid} introns out of {n_introns}")

    # ------------------------------------------------------------------
    # pass 2: molecule counting (reference counter.py:701-1254)
    # ------------------------------------------------------------------

    def pcount(self, bamfile: Iterable[str], multimap: bool,
               cell_batch_size: int = 100, n_processes: int = 2
               ) -> Tuple[Dict[str, List[np.ndarray]], List[str]]:
        """Parallel molecule counting over independent cell batches.

        The reference declares this API but never implemented it
        (reference counter.py:1256-1265, NotImplementedError); here the
        SoA engine fans cell batches out to a fork-based worker pool.
        Falls back to the serial path when the fast path is unavailable.
        """
        if self._fastpath_ok() and n_processes > 1:
            return self._soa_engine().pcount(bamfile, multimap,
                                             cell_batch_size, n_processes)
        return self.count(bamfile, multimap, cell_batch_size)

    def count(self, bamfile: Iterable[str], multimap: bool,
              cell_batch_size: int = 100, molecules_report: bool = False
              ) -> Tuple[Dict[str, List[np.ndarray]], List[str]]:
        if self._fastpath_ok():
            return self._soa_engine().count(bamfile, multimap,
                                            cell_batch_size)
        # Encounter-ordered (the reference uses a set here,
        # counter.py:760-787 + :847, which makes its loom column order
        # hash-randomized across processes; we keep it deterministic and
        # identical to the SoA fast path).
        self.cell_batch: Dict[str, None] = {}
        self.reads_to_count: List[Read] = []
        cell_bcs_order: List[str] = []
        dict_list_arrays: Dict[str, List[np.ndarray]] = {
            layer: [] for layer in self.logic.layers}
        nth = 0
        for r in self.iter_alignments(bamfile, unique=not multimap):
            if (r is None) or (len(self.cell_batch) == cell_batch_size and
                               r.bc not in self.cell_batch):
                nth += 1
                if self.reads_to_count:
                    logging.debug(f"Counting batch {nth}: "
                                  f"{len(self.cell_batch)} cells, "
                                  f"{len(self.reads_to_count)} reads")
                dict_layer_columns, list_bcs = self.count_cell_batch()
                self._append_batch_result(dict_layer_columns, list_bcs,
                                          dict_list_arrays, cell_bcs_order)
                self.cell_batch = {}
                self.reads_to_count = []
            if r is not None:
                self.cell_batch[r.bc] = None
                self.reads_to_count.append(r)
        logging.debug("Counting done!")
        return dict_list_arrays, cell_bcs_order

    # ---- batch processing (array mode) --------------------------------

    def count_cell_batch(self) -> Tuple[Dict[str, np.ndarray], List[str]]:
        reads = self.reads_to_count
        reads.sort()
        bc_list = list(self.cell_batch)
        bc2idx = {bc: i for i, bc in enumerate(bc_list)}
        shape = (len(self.geneid2ix), len(bc_list))
        dict_layers_columns: Dict[str, np.ndarray] = {
            layer: np.zeros(shape, dtype=self.loom_numeric_dtype, order="C")
            for layer in self.logic.layers}
        if not reads:
            return dict_layers_columns, bc_list

        # molecule ids
        mol_key2id: Dict[Tuple[str, str], int] = {}
        mol_of_read = np.empty(len(reads), dtype=np.int64)
        mol_bcidx: List[int] = []
        for i, r in enumerate(reads):
            key = (r.bc, r.umi)
            mid = mol_key2id.get(key)
            if mid is None:
                mid = len(mol_key2id)
                mol_key2id[key] = mid
                mol_bcidx.append(bc2idx[r.bc])
            mol_of_read[i] = mid
        n_mol = len(mol_key2id)
        mol_bcidx_arr = np.asarray(mol_bcidx, dtype=np.int64)

        # group reads by chromstrand (reads already sorted by chrom/pos)
        groups: Dict[str, List[int]] = defaultdict(list)
        for i, r in enumerate(reads):
            groups[r.chrom + r.strand].append(i)

        stranded = self.logic.stranded
        discordant = self.logic.accept_discordant
        record_parts: List[RecordArrays] = []
        for cs, idxs in groups.items():
            chrom, strand = cs[:-1], cs[-1]
            rcs = cs
            rev_cs = chrom + reverse(strand)
            own = [self.feature_indexes.get(rcs)]
            if not stranded:
                own.append(self.feature_indexes.get(rev_cs))

            # repeat-mask filtering
            keep_idxs, rescue_reverse = self._mask_filter(
                idxs, reads, rcs, rev_cs, stranded, discordant)

            if stranded and not discordant:
                record_parts.append(self._match_group(
                    keep_idxs, reads, self.feature_indexes.get(rcs), rcs,
                    mol_of_read, pseudo_offset=0))
            elif discordant:
                record_parts.append(self._match_group(
                    keep_idxs, reads, self.feature_indexes.get(rcs), rcs,
                    mol_of_read, pseudo_offset=0))
                record_parts.append(self._match_group(
                    rescue_reverse, reads, self.feature_indexes.get(rev_cs),
                    rev_cs, mol_of_read, pseudo_offset=len(reads)))
            else:  # non-stranded: search both strands, separate records
                record_parts.append(self._match_group(
                    keep_idxs, reads, self.feature_indexes.get(rcs), rcs,
                    mol_of_read, pseudo_offset=0))
                record_parts.append(self._match_group(
                    keep_idxs, reads, self.feature_indexes.get(rev_cs),
                    rev_cs, mol_of_read, pseudo_offset=len(reads)))

        records = RecordArrays.concatenate(record_parts)
        actions, genes, codes = assemble_and_classify(records, self.logic,
                                                      n_mol)
        counted = actions != NONE
        for action_code, layer in _LAYER_OF_ACTION.items():
            if layer not in dict_layers_columns:
                continue
            sel = counted & (actions == action_code)
            if sel.any():
                np.add.at(dict_layers_columns[layer],
                          (genes[sel], mol_bcidx_arr[sel]), 1)

        failures = int(((codes != 0) & (codes != 2)).sum())
        if n_mol and failures > 0.25 * n_mol:
            logging.warning(f"More than 25% of molitems trashed "
                            f"({100 * failures / n_mol:.1f}%)")

        if self.dump_writer.active:
            # dumps need the per-molecule object graph: re-run this batch
            # through the object-mode engine (debug feature, speed is moot)
            from .objectmode import build_molitems
            molitems = build_molitems(reads, self.annotations_by_chrm_strand,
                                      self.mask_ivls_by_chromstrand,
                                      self.logic)
            self.dump_writer.maybe_dump(molitems, reads,
                                        self.annotations_by_chrm_strand)
        return dict_layers_columns, bc_list

    def _mask_filter(self, idxs, reads, cs, rev_cs, stranded, discordant):
        """Repeat-mask enclosure check (reference counter.py:824-827,
        977-982, 1124-1127).  Returns (kept indices, discordant rescues)."""
        ma = self.mask_indexes.get(cs)
        mar = self.mask_indexes.get(rev_cs)
        if ma is None and mar is None:
            return list(idxs), []

        def enclosed(index_arrays, idx_list):
            if index_arrays is None or not idx_list:
                return np.zeros(len(idx_list), dtype=bool)
            segs = []
            counts = []
            for i in idx_list:
                counts.append(len(reads[i].segments))
                segs.extend(reads[i].segments)
            segs = np.asarray(segs, dtype=np.int64)
            mt = index_arrays.segment_matchtype(segs[:, 0], segs[:, 1])
            out = np.empty(len(idx_list), dtype=bool)
            p = 0
            for j, c in enumerate(counts):
                # reference indexes.py:126: EVERY segment must match
                # exactly MATCH_INSIDE
                out[j] = bool(np.all(mt[p:p + c] == MATCH_INSIDE))
                p += c
            return out

        own_enc = enclosed(ma, idxs)
        if stranded and not discordant:
            return [i for i, e in zip(idxs, own_enc) if not e], []
        if discordant:
            enc_idx = [i for i, e in zip(idxs, own_enc) if e]
            rev_enc = enclosed(mar, enc_idx)
            rescue = [i for i, e in zip(enc_idx, rev_enc) if not e]
            keep = [i for i, e in zip(idxs, own_enc) if not e]
            return keep, rescue
        # non-stranded: skip if enclosed on either strand
        rev_enc = enclosed(mar, idxs)
        return [i for i, (e1, e2) in zip(idxs, zip(own_enc, rev_enc))
                if not (e1 or e2)], []

    def _match_group(self, idx_list: List[int], reads: List[Read],
                     fa: Optional[FeatureArrays], cs: str,
                     mol_of_read: np.ndarray,
                     pseudo_offset: int) -> RecordArrays:
        """Match one chromstrand group of reads against a feature index and
        build the per-read mapping records."""
        empty = RecordArrays(*(np.zeros(0, np.int64),) * 4 +
                             (np.zeros(0, np.int32), np.zeros(0, np.int32)))
        if fa is None or fa.n == 0 or not idx_list:
            return empty
        seg_start: List[int] = []
        seg_end: List[int] = []
        seg_read: List[int] = []
        spliced: List[bool] = []
        for i in idx_list:
            r = reads[i]
            for s in r.segments:
                seg_start.append(s[0])
                seg_end.append(s[1])
                seg_read.append(i)
            spliced.append(r.ref_skipped)
        seg_start = np.asarray(seg_start, dtype=np.int64)
        seg_end = np.asarray(seg_end, dtype=np.int64)
        seg_read = np.asarray(seg_read, dtype=np.int64)
        read_spliced = np.zeros(len(reads) + 1, dtype=bool)
        for i, sp in zip(idx_list, spliced):
            read_spliced[i] = sp

        srow, feat = fa.match_segments(seg_start, seg_end)
        if len(feat) == 0:
            return empty
        pairs_read = seg_read[srow]
        tm_local = fa.tm_idx[feat].astype(np.int64)
        pairs_tm = tm_local + self._tm_offset.get(cs, 0)
        pairs_gene = fa.tm_gene_ix[tm_local]
        span_ungated = fa.exin_span_flags(srow, feat, seg_start, seg_end)
        validated = fa.is_validated[feat]
        flags = ((fa.kind[feat] == ord("i")) * F_INTRON +
                 (fa.kind[feat] == ord("e")) * F_EXON +
                 validated * F_VALID +
                 (span_ungated & validated) * F_SPAN_GATED +
                 span_ungated * F_SPAN_UNGATED).astype(np.int32)
        seg_spliced = read_spliced[seg_read]   # per-segment spliced flag
        skip_ok = fa.skip_makes_sense(srow, feat, seg_start, seg_end,
                                      seg_spliced)
        # pseudo-read ids separate the two strand searches of a read in
        # non-stranded/discordant modes: each nonempty per-strand record is
        # its own intersection step (reference counter.py:1129-1146)
        rec = build_read_records(pairs_read + pseudo_offset, pairs_tm,
                                 pairs_gene, flags, skip_ok,
                                 _extend_mol_map(mol_of_read, pseudo_offset))
        return rec


def _extend_mol_map(mol_of_read: np.ndarray, pseudo_offset: int) -> np.ndarray:
    if pseudo_offset == 0:
        return np.concatenate([mol_of_read, mol_of_read])
    return np.concatenate([mol_of_read, mol_of_read])
