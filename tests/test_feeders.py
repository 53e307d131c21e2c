"""Multi-host counting driver: feeder processes over barcode ranges,
merged on the device mesh, must be bit-identical to the serial pass."""
import numpy as np
import pytest

from velocyto_tpu.counting.counter import ExInCounter
from velocyto_tpu.counting.logics import Permissive10X
from velocyto_tpu.parallel import count_distributed, make_mesh

from test_fastpath import annotation, _random_bam, _cellsort  # noqa: F401


def _serial(gtf, bam_cs, bam_pos, bcs):
    counter = ExInCounter(sampleid="s", logic=Permissive10X,
                          valid_bcset=set(bcs))
    counter.peek(bam_pos)
    counter.read_transcriptmodels(gtf)
    counter.mark_up_introns([bam_pos], multimap=False)
    d, order = counter.count([bam_cs], multimap=False, cell_batch_size=5)
    layers = {k: (np.concatenate(v, axis=1) if v else
                  np.zeros((len(counter.geneid2ix), 0)))
              for k, v in d.items()}
    return layers, order


@pytest.fixture
def fixture(tmp_path, annotation):      # noqa: F811
    gtf, genes = annotation
    bam_pos, bcs = _random_bam(tmp_path, genes, seed=11, n_reads=900,
                               n_cells=10)
    bam_cs = _cellsort(tmp_path, bam_pos)
    return gtf, bam_cs, bam_pos, bcs


@pytest.mark.parametrize("n_feeders", [2, 3])
def test_feeders_match_serial(fixture, n_feeders):
    gtf, bam_cs, bam_pos, bcs = fixture
    serial_layers, serial_order = _serial(gtf, bam_cs, bam_pos, bcs)
    layers, order = count_distributed(
        [bam_cs], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=n_feeders, cell_batch_size=5,
        mesh=None, in_process=True)
    # bit-identical INCLUDING the column order (serial first-encounter)
    assert order == serial_order
    total = 0
    for layer in serial_layers:
        np.testing.assert_array_equal(layers[layer],
                                      serial_layers[layer],
                                      err_msg=f"layer {layer}")
        total += int(layers[layer].sum())
    assert total > 0, "vacuous comparison: nothing counted"


def test_feeders_prepare_once(fixture, monkeypatch):
    """The annotation parse + markup pass must run exactly once no
    matter how many feeders count."""
    from velocyto_tpu.counting.counter import ExInCounter as EIC
    calls = {"gtf": 0, "markup": 0}
    orig_gtf, orig_mark = EIC.read_transcriptmodels, EIC.mark_up_introns

    def count_gtf(self, *a, **k):
        calls["gtf"] += 1
        return orig_gtf(self, *a, **k)

    def count_mark(self, *a, **k):
        calls["markup"] += 1
        return orig_mark(self, *a, **k)

    monkeypatch.setattr(EIC, "read_transcriptmodels", count_gtf)
    monkeypatch.setattr(EIC, "mark_up_introns", count_mark)
    gtf, bam_cs, bam_pos, bcs = fixture
    count_distributed(
        [bam_cs], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=3, cell_batch_size=5,
        mesh=None, in_process=True)
    assert calls == {"gtf": 1, "markup": 1}


def test_pcount_matches_count_distributed_hash_owners(fixture):
    """`run -p N`'s pcount and the multi-host driver share one worker
    mechanism: same values, same serial column order."""
    gtf, bam_cs, bam_pos, bcs = fixture
    counter = ExInCounter(sampleid="s", logic=Permissive10X,
                          valid_bcset=set(bcs))
    counter.peek(bam_pos)
    counter.read_transcriptmodels(gtf)
    counter.mark_up_introns([bam_pos], multimap=False)
    layers_cd, order_cd = count_distributed(
        [bam_cs], counter=counter, n_feeders=2, cell_batch_size=5,
        in_process=True)       # hash ownership (valid_bcs=None)
    serial_layers, serial_order = _serial(gtf, bam_cs, bam_pos, bcs)
    assert order_cd == serial_order
    for layer in serial_layers:
        np.testing.assert_array_equal(layers_cd[layer],
                                      serial_layers[layer])


def test_feeders_mesh_merge_matches_host(fixture):
    gtf, bam_cs, bam_pos, bcs = fixture
    mesh = make_mesh()      # 8 virtual CPU devices
    l_mesh, o_mesh = count_distributed(
        [bam_cs], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=2, cell_batch_size=5,
        mesh=mesh, in_process=True)
    l_host, o_host = count_distributed(
        [bam_cs], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=2, cell_batch_size=5,
        mesh=None, in_process=True)
    assert o_mesh == o_host
    for layer in l_host:
        np.testing.assert_array_equal(l_mesh[layer], l_host[layer])


def test_feeders_spawn_processes(fixture):
    """Real spawned worker processes (the multi-host deployment shape)."""
    gtf, bam_cs, bam_pos, bcs = fixture
    serial_layers, serial_order = _serial(gtf, bam_cs, bam_pos, bcs)
    layers, order = count_distributed(
        [bam_cs], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=2, cell_batch_size=5,
        mesh=None, in_process=False)
    assert sorted(order) == sorted(serial_order)
    ps = np.argsort(np.array(serial_order))
    pf = np.argsort(np.array(order))
    for layer in serial_layers:
        np.testing.assert_array_equal(layers[layer][:, pf],
                                      serial_layers[layer][:, ps])


def test_vtx_staleness_rejected(fixture, tmp_path):
    """A .vtx written for a different BAM (stale after re-sorting) must
    be rejected, falling back to the full-scan path -- never seeking
    into the wrong stream."""
    from velocyto_tpu import native
    if not native.available():
        pytest.skip("libvtpu not available")
    gtf, bam_cs, bam_pos, bcs = fixture
    idx = native.read_tag_index(bam_cs + ".vtx")
    assert idx is not None, "fixture sort should have written a .vtx"
    # same BAM, but the index claims a different BAM size (what a
    # re-sort by another tool leaves behind)
    import shutil
    import struct
    stale = str(tmp_path / "stale.bam")
    shutil.copy(bam_cs, stale)
    vtx = bytearray(open(bam_cs + ".vtx", "rb").read())
    (size,) = struct.unpack_from("<Q", vtx, 4)
    struct.pack_into("<Q", vtx, 4, size + 1000)
    open(stale + ".vtx", "wb").write(bytes(vtx))
    assert native.read_tag_index(stale + ".vtx") is None
    # counting still works (full scan fallback)
    layers, order = count_distributed(
        [stale], gtf, valid_bcs=sorted(bcs), logic_name="Permissive10X",
        markup_bamfiles=[bam_pos], n_feeders=2, cell_batch_size=5,
        mesh=None, in_process=True)
    assert sum(int(m.sum()) for m in layers.values()) > 0


# ---------------------------------------------------------------------------
# ranged parallel markup (pass 1)
# ---------------------------------------------------------------------------

def _prepared(gtf, bam_pos, bcs):
    counter = ExInCounter(sampleid="s", logic=Permissive10X,
                          valid_bcset=set(bcs))
    counter.peek(bam_pos)
    counter.read_transcriptmodels(gtf)
    return counter


def _marks(counter):
    return {k: fa.is_validated.copy()
            for k, fa in counter.feature_indexes.items()}


@pytest.mark.parametrize("n_workers", [2, 3])
def test_ranged_markup_matches_serial(fixture, n_workers):
    """Ranged parallel markup (native record-boundary split + OR-merge)
    must produce bit-identical is_validated flags and the same
    per-Feature mirror as the serial scan."""
    from velocyto_tpu import native
    if not native.available():
        pytest.skip("libvtpu not available")
    gtf, bam_cs, bam_pos, bcs = fixture
    c_ser = _prepared(gtf, bam_pos, bcs)
    c_ser.mark_up_introns([bam_pos], multimap=False)
    from velocyto_tpu.counting.soa_engine import run_markup_pool
    c_par = _prepared(gtf, bam_pos, bcs)
    ok = run_markup_pool(c_par, [bam_pos], False, n_workers,
                         in_process=True)
    assert ok, "ranged markup should be available with libvtpu"
    ser, par = _marks(c_ser), _marks(c_par)
    assert ser.keys() == par.keys()
    any_marked = False
    for k in ser:
        np.testing.assert_array_equal(ser[k], par[k], err_msg=f"key {k}")
        any_marked = any_marked or bool(ser[k].any())
        for i in np.flatnonzero(par[k]):
            assert c_par.feature_indexes[k].features[i].is_validated
    assert any_marked, "vacuous comparison: nothing validated"


def test_ranged_markup_spawn_processes(fixture):
    """The real spawned-worker path (one markup worker per slice)."""
    from velocyto_tpu import native
    if not native.available():
        pytest.skip("libvtpu not available")
    gtf, bam_cs, bam_pos, bcs = fixture
    c_ser = _prepared(gtf, bam_pos, bcs)
    c_ser.mark_up_introns([bam_pos], multimap=False)
    c_par = _prepared(gtf, bam_pos, bcs)
    c_par.mark_up_introns([bam_pos], multimap=False, n_workers=2)
    ser, par = _marks(c_ser), _marks(c_par)
    for k in ser:
        np.testing.assert_array_equal(ser[k], par[k], err_msg=f"key {k}")


def test_ranged_markup_detects_unsorted(fixture, tmp_path):
    """The cross-slice chromosome-order check must reject an unsorted
    input exactly like the serial scan (reference counter.py:674-676)."""
    from velocyto_tpu import native
    if not native.available():
        pytest.skip("libvtpu not available")
    from velocyto_tpu.counting import bamio
    gtf, bam_cs, bam_pos, bcs = fixture
    bc0 = sorted(bcs)[0]
    recs = [bamio.BamRecord(f"u{i}", 0, i % 2, 1000 + (i // 2) * 50,
                            [(0, 90)],
                            {"CB": bc0 + "-1", "UB": "ACGTACGTAC", "NH": 1})
            for i in range(4000)]
    ub = str(tmp_path / "unsorted.bam")
    bamio.write_bam(ub, [("1", 50_000_000), ("2", 50_000_000)], recs)
    c = _prepared(gtf, bam_pos, bcs)
    from velocyto_tpu.counting.soa_engine import run_markup_pool
    with pytest.raises(IOError, match="sorted"):
        ok = run_markup_pool(c, [ub], False, 2, in_process=True)
        if not ok:      # no ranged decode -> exercise the serial check
            c.mark_up_introns([ub], multimap=False)


def test_bam_record_ranges_edges(tmp_path):
    """Record-boundary split points: ranges must tile [first record,
    EOF) exactly, land on record boundaries (decoding each slice yields
    the slice's records, summing to the total), and degrade gracefully
    on tiny files."""
    from velocyto_tpu import native
    if not native.available():
        pytest.skip("libvtpu not available")
    from velocyto_tpu.counting import bamio
    from velocyto_tpu.counting.fastio import open_soa_reader

    def make(n_recs, path):
        recs = [bamio.BamRecord(f"r{i}", 0, 0, 100 + i, [(0, 50)],
                                {"CB": "AAAA-1", "UB": "ACGT", "NH": 1})
                for i in range(n_recs)]
        bamio.write_bam(path, [("1", 1_000_000)], recs)
        return path

    big = make(5000, str(tmp_path / "big.bam"))
    for n_ranges in (2, 3, 8):
        ranges = native.bam_record_ranges(big, n_ranges)
        assert ranges is not None
        # contiguous tiling
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0 and a0 < a1
        total = 0
        for rng in ranges:
            rd = open_soa_reader(big, "CB", "UB", True, byte_range=rng)
            while True:
                rb = rd.read_batch()
                if rb is None:
                    break
                total += len(rb)
            rd.close()
        assert total == 5000, f"ranges={ranges} decoded {total}"

    tiny = make(1, str(tmp_path / "tiny.bam"))
    r = native.bam_record_ranges(tiny, 4)
    assert r is not None and len(r) >= 1
    rd = open_soa_reader(tiny, "CB", "UB", True, byte_range=r[0])
    assert len(rd.read_batch()) == 1
    rd.close()
