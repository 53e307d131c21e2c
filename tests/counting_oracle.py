"""Literal object-mode oracle of the reference counting semantics.

A straight transcription of the reference's per-read index scan
(velocyto/indexes.py:63-269) and batch counting loop
(velocyto/counter.py:800-1254), operating on velocyto_tpu's Feature /
Molitem / Logic objects.  Used to differentially validate the vectorized
array-mode engine.
"""
from collections import defaultdict

import numpy as np

from velocyto_tpu.constants import (MATCH_INSIDE, MATCH_OVER5END,
                                    MATCH_OVER3END, MIN_FLANK, KIND_INTRON,
                                    KIND_EXON)
from velocyto_tpu.counting.molecules import Molitem, SegmentMatch


class OracleFeatureIndex:
    def __init__(self, ivls):
        self.ivls = sorted(ivls)
        self.iidx = 0
        self.maxiidx = len(self.ivls) - 1

    @property
    def last_interval_not_reached(self):
        return self.iidx < self.maxiidx

    def reset(self):
        self.iidx = 0

    def has_ivls_enclosing(self, read):
        if len(self.ivls) == 0:
            return False
        ivl = self.ivls[self.iidx]
        while self.last_interval_not_reached and ivl.ends_upstream_of(read):
            self.iidx += 1
            ivl = self.ivls[self.iidx]
        for segment in read.segments:
            segment_matchtype = 0
            i = self.iidx
            ivl = self.ivls[self.iidx]
            while i < self.maxiidx and ivl.doesnt_start_after(segment):
                matchtype = 0
                if ivl.contains(segment):
                    matchtype = MATCH_INSIDE
                if ivl.start_overlaps_with_part_of(segment):
                    matchtype |= MATCH_OVER5END
                if ivl.end_overlaps_with_part_of(segment):
                    matchtype |= MATCH_OVER3END
                segment_matchtype |= matchtype
                i += 1
                ivl = self.ivls[i]
            if segment_matchtype ^ MATCH_INSIDE:
                return False
        return True

    def mark_overlapping_ivls(self, read):
        if len(self.ivls) == 0:
            return
        feature = self.ivls[self.iidx]
        while self.last_interval_not_reached and feature.ends_upstream_of(read):
            self.iidx += 1
            feature = self.ivls[self.iidx]
        for segment in read.segments:
            i = self.iidx
            feature = self.ivls[self.iidx]
            while i < self.maxiidx and feature.doesnt_start_after(segment):
                if feature.kind == KIND_INTRON:
                    if feature.end_overlaps_with_part_of(segment):
                        downstream_exon = feature.get_downstream_exon()
                        if downstream_exon.start_overlaps_with_part_of(segment):
                            feature.is_validated = True
                    if feature.start_overlaps_with_part_of(segment):
                        upstream_exon = feature.get_upstream_exon()
                        if upstream_exon.end_overlaps_with_part_of(segment):
                            feature.is_validated = True
                i += 1
                feature = self.ivls[i]

    def find_overlapping_ivls(self, read):
        mapping_record = defaultdict(list)
        if len(self.ivls) == 0:
            return mapping_record
        feature = self.ivls[self.iidx]
        while self.last_interval_not_reached and feature.ends_upstream_of(read):
            self.iidx += 1
            feature = self.ivls[self.iidx]
        for segment in read.segments:
            i = self.iidx
            feature = self.ivls[i]
            while i < self.maxiidx and feature.doesnt_start_after(segment):
                if feature.intersects(segment) and \
                        (segment[-1] - segment[0]) > MIN_FLANK:
                    mapping_record[feature.transcript_model].append(
                        SegmentMatch(segment, feature, read.is_spliced))
                i += 1
                feature = self.ivls[i]
        if len(mapping_record) != 0:
            max_n_segments = len(max(mapping_record.values(), key=len))
            for tm, seglist in list(mapping_record.items()):
                if len(seglist) < max_n_segments:
                    del mapping_record[tm]
        if len(mapping_record) != 0:
            for tm, seglist in list(mapping_record.items()):
                for sm in seglist:
                    if not sm.skip_makes_sense:
                        del mapping_record[tm]
                        break
        return mapping_record


def oracle_count_batch(reads, annotations, mask_ivls, logic, geneid2ix,
                       layers_shape, bc2idx, dtype="uint32"):
    """Reference counter.py:800-949 / :1097-1254 batch counting."""
    from itertools import chain
    feature_indexes = {}
    for cs, tm_dict in annotations.items():
        feature_indexes[cs] = OracleFeatureIndex(
            sorted(chain.from_iterable(tm.list_features
                                       for tm in tm_dict.values())))
    mask_indexes = {cs: OracleFeatureIndex(fl)
                    for cs, fl in mask_ivls.items()}

    def get_fi(cs):
        if cs not in feature_indexes:
            feature_indexes[cs] = OracleFeatureIndex([])
        return feature_indexes[cs]

    def get_mi(cs):
        if cs not in mask_indexes:
            mask_indexes[cs] = OracleFeatureIndex([])
        return mask_indexes[cs]

    def rev(s):
        return "-" if s == "+" else "+"

    molitems = defaultdict(Molitem)
    reads = sorted(reads)
    logic_obj = logic() if isinstance(logic, type) else logic
    for r in reads:
        ii = get_fi(r.chrom + r.strand)
        iir = get_fi(r.chrom + rev(r.strand))
        iim = get_mi(r.chrom + r.strand)
        iimr = get_mi(r.chrom + rev(r.strand))
        if logic_obj.stranded and not logic_obj.accept_discordant:
            if iim.has_ivls_enclosing(r):
                continue
            mapping_record = ii.find_overlapping_ivls(r)
            if len(mapping_record):
                molitems[f"{r.bc}${r.umi}"].add_mappings_record(mapping_record)
        elif logic_obj.accept_discordant:
            if iim.has_ivls_enclosing(r):
                if not iimr.has_ivls_enclosing(r):
                    mapping_record = iir.find_overlapping_ivls(r)
                else:
                    continue
            else:
                mapping_record = ii.find_overlapping_ivls(r)
            if len(mapping_record):
                molitems[f"{r.bc}${r.umi}"].add_mappings_record(mapping_record)
        else:  # non-stranded
            if iim.has_ivls_enclosing(r) or iimr.has_ivls_enclosing(r):
                continue
            mapping_record = ii.find_overlapping_ivls(r)
            if len(mapping_record):
                molitems[f"{r.bc}${r.umi}"].add_mappings_record(mapping_record)
            mapping_record_r = iir.find_overlapping_ivls(r)
            if len(mapping_record_r):
                molitems[f"{r.bc}${r.umi}"].add_mappings_record(mapping_record_r)

    dict_layers_columns = {layer: np.zeros(layers_shape, dtype=dtype)
                           for layer in logic_obj.layers}
    for bcumi, molitem in molitems.items():
        bc = bcumi.split("$")[0]
        if molitem.mappings_record is None:
            continue
        logic_obj.count(molitem, bc2idx[bc], dict_layers_columns, geneid2ix)
    return dict_layers_columns


def oracle_markup(reads, annotations):
    """Reference counter.py:622-699 intron-validation pass."""
    from itertools import chain
    feature_indexes = {}
    for cs, tm_dict in annotations.items():
        feature_indexes[cs] = OracleFeatureIndex(
            sorted(chain.from_iterable(tm.list_features
                                       for tm in tm_dict.values())))
    for r in reads:
        if r.is_spliced:
            continue
        cs = r.chrom + r.strand
        if cs in feature_indexes:
            feature_indexes[cs].mark_overlapping_ivls(r)
    return feature_indexes
