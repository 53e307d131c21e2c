"""Molecule assembly + classification as a single jitted XLA program.

`molecules.assemble_and_classify` is grouped array math: sort the
per-(read, transcript-model) records by (molecule, tm), reduce flags per
group, intersect across reads, aggregate per molecule, and evaluate the
logic decision table.  This module runs that dataflow on the accelerator
(sort + segment reductions compile to one fused program), which is the
TPU-resident variant promised by the counting design: feeders decode on
host CPUs, classification rides the device.

Shapes are padded to power-of-two buckets so recompilation is bounded;
results are bit-identical to the numpy engine (differential tests in
tests/test_device_classify.py).

Enable with counter kwarg or VELOCYTO_DEVICE_CLASSIFY=1; host numpy
remains the default (for small batches and remote-attached chips the
transfer latency exceeds the compute).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from .logics import NONE
from .molecules import RecordArrays, F_INTRON, F_EXON, F_VALID, \
    F_SPAN_GATED, F_SPAN_UNGATED


def _bucket(n: int, lo: int = 256) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_mol_max", "gated"))
def _assemble_flags_impl(rec_read, rec_mol, rec_tm, rec_gene, rec_flags,
                         rec_nseg, valid, n_mol_max: int, gated: bool):
    import jax
    import jax.numpy as jnp
    P = rec_read.shape[0]
    M = n_mol_max

    big = jnp.asarray(1 << 30, rec_mol.dtype)   # > any real id, int32-safe
    mol_k = jnp.where(valid, rec_mol, big)
    tm_k = jnp.where(valid, rec_tm, big)
    read_k = jnp.where(valid, rec_read, big)

    # ---- reads-with-records per molecule: distinct (mol, read) pairs ----
    order_r = jnp.lexsort((read_k, mol_k))
    m_r = mol_k[order_r]
    r_r = read_k[order_r]
    v_r = valid[order_r]
    new_pair = v_r & jnp.concatenate(
        [jnp.ones(1, bool), (m_r[1:] != m_r[:-1]) | (r_r[1:] != r_r[:-1])])
    seg_mol_r = jnp.where(v_r, m_r, M).astype(jnp.int32)
    reads_per_mol = jax.ops.segment_sum(new_pair.astype(jnp.int32),
                                        seg_mol_r, num_segments=M + 1)[:M]

    # ---- (mol, tm) groups ----
    order = jnp.lexsort((tm_k, mol_k))
    m = mol_k[order]
    t = tm_k[order]
    g = rec_gene[order]
    f = rec_flags[order]
    c = rec_nseg[order]
    v = valid[order]
    new_grp = v & jnp.concatenate(
        [jnp.ones(1, bool), (m[1:] != m[:-1]) | (t[1:] != t[:-1])])
    grp_id = jnp.cumsum(new_grp.astype(jnp.int32)) - 1
    seg_grp = jnp.where(v, grp_id, P).astype(jnp.int32)

    grp_mol = jax.ops.segment_max(jnp.where(v, m, -1), seg_grp,
                                  num_segments=P + 1)[:P]
    grp_gene = jax.ops.segment_max(jnp.where(v, g, -1), seg_grp,
                                   num_segments=P + 1)[:P]
    grp_rows = jax.ops.segment_sum(v.astype(jnp.int32), seg_grp,
                                   num_segments=P + 1)[:P]
    # OR of the flag bits across a group's rows, one bit at a time
    # (segment_max of the bit-presence indicator == OR)
    def or_bit(bit):
        has = ((jnp.where(v, f, 0) & bit) != 0).astype(jnp.int32)
        return (jax.ops.segment_max(has, seg_grp,
                                    num_segments=P + 1)[:P] > 0)
    b_in = or_bit(F_INTRON)
    b_ex = or_bit(F_EXON)
    b_va = or_bit(F_VALID)
    b_sg = or_bit(F_SPAN_GATED)
    b_su = or_bit(F_SPAN_UNGATED)
    grp_nseg = jax.ops.segment_sum(jnp.where(v, c, 0), seg_grp,
                                   num_segments=P + 1)[:P]

    n_grp_valid = grp_rows > 0
    survive = n_grp_valid & (grp_rows == jnp.where(
        grp_mol >= 0, reads_per_mol[jnp.clip(grp_mol, 0, M - 1)], -1))

    seg_mol = jnp.where(survive, jnp.clip(grp_mol, 0, M - 1), M) \
        .astype(jnp.int32)

    def agg_or(vals):
        return jax.ops.segment_max(vals.astype(jnp.int32), seg_mol,
                                   num_segments=M + 1)[:M] > 0

    def agg_min(vals, fill):
        return jax.ops.segment_min(jnp.where(survive, vals, fill), seg_mol,
                                   num_segments=M + 1)[:M]

    big_gene = jnp.asarray(1 << 30, rec_gene.dtype)

    tm_span = b_sg if gated else b_su
    OI = agg_or(b_in & ~b_ex)
    OE = agg_or(b_ex & ~b_in)
    OIV = agg_or(b_va & ~b_ex)
    if gated:
        IM = agg_or(b_ex & b_in & ~b_va & ~tm_span)
        VM = agg_or(b_ex & b_in & b_va & ~tm_span)
    else:
        IM = jnp.zeros(M, bool)
        VM = agg_or(b_ex & b_in & ~tm_span)
    has_rec = agg_or(survive)
    not_span = agg_or(~tm_span)          # any surviving tm without span
    OS = has_rec & ~not_span
    nseg_per_mol = jax.ops.segment_max(jnp.where(survive, grp_nseg, 0),
                                       seg_mol, num_segments=M + 1)[:M]
    singleton = nseg_per_mol == 1
    gmin = agg_min(grp_gene, big_gene)
    gmax = jax.ops.segment_max(jnp.where(survive, grp_gene, -1), seg_mol,
                               num_segments=M + 1)[:M]
    return OI, OS, OIV, VM, IM, OE, has_rec, singleton, gmin, gmax


def assemble_and_classify_device(records: RecordArrays, logic,
                                 n_molecules: int
                                 ) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """Drop-in twin of molecules.assemble_and_classify with the grouping
    and reductions executed on the accelerator."""
    if isinstance(logic, type):
        logic = logic()
    actions = np.zeros(n_molecules, dtype=np.int8)
    genes = np.full(n_molecules, -1, dtype=np.int64)
    codes = np.full(n_molecules, 2, dtype=np.int8)
    n = len(records.rec_read)
    if n == 0:
        return actions, genes, codes

    P = _bucket(n)
    M = _bucket(max(n_molecules, 1))

    def pad(a, fill=0):
        out = np.full(P, fill, dtype=np.int64)
        out[:n] = a
        return out

    valid = np.zeros(P, dtype=bool)
    valid[:n] = True
    OI, OS, OIV, VM, IM, OE, has_rec, singleton, gmin, gmax = (
        np.asarray(x) for x in _assemble_flags_impl(
            pad(records.rec_read), pad(records.rec_mol),
            pad(records.rec_tm), pad(records.rec_gene),
            pad(records.rec_flags), pad(records.rec_nseg), valid,
            n_mol_max=M, gated=logic.span_gated_on_validation))
    OI = OI[:n_molecules]
    OS = OS[:n_molecules]
    OIV = OIV[:n_molecules]
    VM = VM[:n_molecules]
    IM = IM[:n_molecules]
    OE = OE[:n_molecules]
    has_rec = has_rec[:n_molecules]
    singleton = singleton[:n_molecules]
    gmin = gmin[:n_molecules]
    gmax = gmax[:n_molecules]

    single_gene = has_rec & (gmin == gmax)
    act = logic.decide_batch(OI, OS, OIV, VM, IM, OE, singleton)
    act = np.where(single_gene, act, NONE).astype(np.int8)
    codes[has_rec & ~single_gene] = 3
    codes[single_gene] = np.where(act[single_gene] != NONE, 0, 4)
    actions[:] = act
    genes[:] = np.where(single_gene, gmax, -1)
    return actions, genes, codes
