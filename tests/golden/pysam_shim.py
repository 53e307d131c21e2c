"""Minimal pysam shim over velocyto_tpu.counting.bamio, sufficient to run
the REFERENCE counting engine (velocyto/counter.py) as a golden-number
generator in an environment without pysam.

Only the API surface the reference counter touches is implemented:
AlignmentFile iteration + get_reference_name, and AlignedSegment's
is_unmapped / is_reverse / rname / reference_start / cigartuples /
qname / query_alignment_sequence / get_tag / has_tag / tostring.
"""
from __future__ import annotations


class AlignedSegment:
    def __init__(self, rec) -> None:
        self._rec = rec

    @property
    def is_unmapped(self):
        return self._rec.is_unmapped

    @property
    def is_reverse(self):
        return self._rec.is_reverse

    @property
    def rname(self):
        return self._rec.ref_id

    @property
    def reference_start(self):
        return self._rec.pos

    @property
    def cigartuples(self):
        return self._rec.cigar

    @property
    def qname(self):
        return self._rec.name

    @property
    def query_alignment_sequence(self):
        return self._rec.seq

    def get_tag(self, tag):
        try:
            return self._rec.tags[tag]
        except KeyError:
            raise KeyError(f"tag {tag} not present")

    def has_tag(self, tag):
        return tag in self._rec.tags

    def tostring(self, _fin=None):
        return f"{self._rec.name}\t{self._rec.ref_id}:{self._rec.pos}"


class AlignmentFile:
    def __init__(self, path, mode="r", template=None) -> None:
        from velocyto_tpu.counting import bamio
        self._reader = bamio.BamReader(str(path))

    def __iter__(self):
        for rec in self._reader:
            yield AlignedSegment(rec)

    def get_reference_name(self, i):
        return self._reader.references[i]

    def close(self):
        pass
