"""Test-facing adapter over the object-mode counting engine.

The literal transcription of the reference counting semantics lives in
ONE place: velocyto_tpu/counting/objectmode.py (it is also the engine
behind `--dump`).  This module only adapts its API to the historical
oracle_* signatures the differential tests use.
"""
from velocyto_tpu.counting.objectmode import (build_molitems,
                                              count_molitems,
                                              markup_features)


def oracle_count_batch(reads, annotations, mask_ivls, logic, geneid2ix,
                       layers_shape, bc2idx, dtype="uint32"):
    """Reference counter.py:800-949 / :1097-1254 batch counting."""
    molitems = build_molitems(reads, annotations, mask_ivls, logic)
    return count_molitems(molitems, logic, geneid2ix, bc2idx,
                          layers_shape, dtype)


def oracle_markup(reads, annotations):
    """Reference counter.py:622-699 intron-validation pass."""
    return markup_features(reads, annotations)
