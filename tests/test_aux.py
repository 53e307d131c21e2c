"""Auxiliary subsystem tests: serialization, metadata, diffusion, RDS
reader, and the dropest barcode-correction tool."""
import os

import numpy as np
import pytest
from scipy import sparse

import velocyto_tpu as vt


# ---------------------------------------------------------------------------
# serialization (reference serialization.py:44-115)
# ---------------------------------------------------------------------------

def test_dump_load_hdf5_roundtrip(tmp_path):
    from velocyto_tpu.serialization import dump_hdf5, load_hdf5

    class Obj:
        pass

    o = Obj()
    o.arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    o.arr32 = np.ones(5, dtype=np.float32)
    o.name = "hello"
    o.meta = {"k": [1, 2, 3], "nested": {"x": 1.5}}
    o.num = 42
    path = str(tmp_path / "obj.hdf5")
    dump_hdf5(o, path)
    o2 = load_hdf5(path, obj_class=Obj)
    np.testing.assert_array_equal(o2.arr, o.arr)
    np.testing.assert_array_equal(o2.arr32, o.arr32)
    assert o2.name == "hello"
    assert o2.meta == o.meta
    assert o2.num == 42


# ---------------------------------------------------------------------------
# metadata (reference metadata.py:14-45)
# ---------------------------------------------------------------------------

def test_metadata_collection(tmp_path):
    from velocyto_tpu.metadata import MetadataCollection
    path = str(tmp_path / "samples.csv")
    with open(path, "w") as f:
        f.write("sampleid:str,age:int,tissue:str\n")
        f.write("S1,10,brain\n")
        f.write("S2,21,liver\n")
    mc = MetadataCollection(path)
    rows = mc.where("sampleid", "S2")
    assert len(rows) == 1
    assert rows[0].tissue == "liver"
    # reference semantics: the key:type header strips types but values
    # stay strings (reference metadata.py:33 "I don't use type anymore")
    assert rows[0].age == "21"
    assert rows[0].types["age"] == "int"


# ---------------------------------------------------------------------------
# diffusion (reference diffusion.py)
# ---------------------------------------------------------------------------

@pytest.fixture
def diffusion_setup():
    rng = np.random.RandomState(0)
    n = 40
    emb = rng.randn(n, 2)
    delta = rng.randn(n, 2) * 0.1
    return emb, delta


def test_transition_matrix_rows_normalized(diffusion_setup):
    emb, delta = diffusion_setup
    d = vt.Diffusion()
    tr = d.compute_transition_matrix2(emb, delta, sigma=0.5)
    tr = sparse.csr_matrix(tr) if not sparse.issparse(tr) else tr
    rs = np.asarray(tr.sum(1)).ravel()
    np.testing.assert_allclose(rs, 1.0, atol=1e-6)


def test_transition_matrix2_large_n_matches_dense():
    """The blocked device-kNN path (N > 4096) must select the same
    neighbor sets and probabilities as the dense small-N construction
    (reference diffusion.py:14-53 runs sklearn NN at any scale)."""
    rng = np.random.RandomState(3)
    n = 5000
    emb = rng.randn(n, 2)
    delta = rng.randn(n, 2) * 0.1
    d = vt.Diffusion()
    tr = d.compute_transition_matrix2(emb, delta, sigma=0.5)
    assert tr.shape == (n, n)
    rs = np.asarray(tr.sum(1)).ravel()
    np.testing.assert_allclose(rs, 1.0, atol=1e-6)
    # dense oracle on a subset of rows: same 20-NN probabilities
    from scipy.stats import norm as _norm
    x1 = emb + delta
    rows = rng.choice(n, 40, replace=False)
    for r in rows:
        dists = np.linalg.norm(x1[r][None, :] - emb, axis=-1)
        nearest = np.argsort(dists)[:20]
        probs = _norm.pdf(dists[nearest], 0, 0.5)
        probs = probs / np.abs(probs).sum()
        got = np.asarray(tr[r].todense()).ravel()
        want = np.zeros(n)
        want[nearest] = probs
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_diffuse_modes(diffusion_setup):
    emb, delta = diffusion_setup
    d = vt.Diffusion()
    tr = d.compute_transition_matrix2(emb, delta, sigma=0.5)
    x0 = np.zeros(emb.shape[0])
    x0[0] = 1.0
    pi = d.diffuse(x0, tr, n_steps=5, mode="path_integral")
    assert np.isfinite(pi).all() and pi.shape[-1] == emb.shape[0]
    te = d.diffuse(x0, tr, n_steps=5, mode="time_evolution")
    np.testing.assert_allclose(np.asarray(te).sum(), 1.0, atol=1e-4)
    mt = d.diffuse(x0, tr, n_steps=5, mode="map_trajectory")
    assert isinstance(mt, list) and len(mt) == 6


# ---------------------------------------------------------------------------
# RDS reader (replaces the reference's rpy2 bridge, r_interface.py)
# ---------------------------------------------------------------------------

def _write_minimal_rds(path):
    """Hand-encode a version-2 RDS: a named list
    {'merge_targets': c(AAA='BBB', CCC='DDD')}."""
    import struct
    import gzip

    def u32(x):
        return struct.pack(">I", x)

    CHARSXP, STRSXP, VECSXP = 9, 16, 19
    out = b"X\n" + u32(2) + u32(0x30200) + u32(0x20300)

    def charsxp(s):
        return u32(CHARSXP | (0x40000 << 4)) + u32(len(s)) + s.encode()

    def strvec(items):
        return u32(STRSXP) + u32(len(items)) + b"".join(charsxp(i)
                                                        for i in items)

    # inner: character vector with names attribute
    inner = u32(VECSXP | (1 << 9)) + u32(1)      # VECSXP, len 1, has attr? no
    # simpler: outer VECSXP with names attribute via attribute pairlist
    # ATTRIB: pairlist (LISTSXP=2) with TAG symbol 'names'
    def symsxp(name):
        return u32(1) + charsxp(name)            # SYMSXP

    def pairlist_names(value_sxp):
        # LISTSXP with tag bit (has_tag flag = 4<<8? per R: flags bits)
        head = u32(2 | (1 << 10))                # LISTSXP, hastag
        return head + symsxp("names") + value_sxp + u32(254)  # NILVALUE

    names_attr = pairlist_names(strvec(["AAA", "CCC"]))
    vec_with_names = (u32(STRSXP | (1 << 9)) + u32(2) +
                      charsxp("BBB") + charsxp("DDD") + names_attr)
    outer_names = pairlist_names(strvec(["merge_targets"]))
    outer = u32(VECSXP | (1 << 9)) + u32(1) + vec_with_names + outer_names
    with gzip.open(path, "wb") as f:
        f.write(out + outer)


def test_rds_reader_merge_targets(tmp_path):
    from velocyto_tpu.utils.rds import read_rds
    path = str(tmp_path / "t.rds")
    _write_minimal_rds(path)
    obj = read_rds(path)
    assert isinstance(obj, dict)
    assert "merge_targets" in obj
    mt = obj["merge_targets"]
    assert mt == {"AAA": "BBB", "CCC": "DDD"}


# ---------------------------------------------------------------------------
# dropest_bc_correct tool (rewrites CB tags from merge_targets)
# ---------------------------------------------------------------------------

def test_dropest_bc_correct(tmp_path):
    from click.testing import CliRunner
    from velocyto_tpu.commands.dropest_bc_correct import dropest_bc_correct
    from velocyto_tpu.counting import bamio
    rds = str(tmp_path / "d.rds")
    _write_minimal_rds(rds)
    recs = [
        bamio.BamRecord("r1", 0, 0, 100, [(0, 50)],
                        {"CB": "AAA", "UB": "U1", "NH": 1}),
        bamio.BamRecord("r2", 0, 0, 200, [(0, 50)],
                        {"CB": "XYZ", "UB": "U2", "NH": 1}),
    ]
    bam = str(tmp_path / "in.bam")
    bamio.write_bam(bam, [("1", 10000)], recs)
    runner = CliRunner()
    res = runner.invoke(dropest_bc_correct, [bam, rds],
                        catch_exceptions=False)
    assert res.exit_code == 0, res.output
    out_bam = os.path.join(str(tmp_path), "correct_in.bam")
    assert os.path.exists(out_bam)
    got = {r.name: r.tags.get("CB") for r in bamio.BamReader(out_bam)}
    assert got["r1"] == "BBB"       # corrected via merge_targets
    assert got["r2"] == "XYZ"       # untouched


def test_native_choice_matches_numpy_stream():
    """The C++ weighted no-replacement sampler must replay numpy's
    RandomState.choice stream bit-for-bit, including the stream position
    afterwards (estimate_transition_prob's RNG-parity contract)."""
    import numpy as np
    from velocyto_tpu import native
    if not native.available():
        import pytest
        pytest.skip("libvtpu not built")
    for seed, n_rows, pop, size in ((15071990, 40, 351, 175),
                                    (0, 10, 31, 15),
                                    (99, 5, 101, 100)):
        p = np.linspace(0.5, 0.1, pop)
        p = p / p.sum()
        np.random.seed(seed)
        want = np.stack([np.random.choice(pop, size=(size,),
                                          replace=False, p=p)
                         for _ in range(n_rows)], 0)
        after_loop = np.random.random_sample(4)
        got, draws = native.choice_noreplace_rows(seed, n_rows, pop,
                                                  size, p)
        np.testing.assert_array_equal(got, want)
        np.random.seed(seed)
        np.random.random_sample(draws)
        np.testing.assert_array_equal(np.random.random_sample(4),
                                      after_loop)
