"""Orbax checkpoint + profiling utility tests."""
import numpy as np
import pytest


def test_save_load_state(tmp_path):
    from velocyto_tpu.io.checkpoint import save_state, load_state
    import jax.numpy as jnp
    state = {"S": np.arange(12.0).reshape(3, 4),
             "gammas": jnp.ones(5),
             "labels": ["a", "b"],
             "k": 7}
    path = str(tmp_path / "ckpt")
    save_state(path, state)
    got = load_state(path)
    np.testing.assert_array_equal(np.asarray(got["S"]), state["S"])
    np.testing.assert_array_equal(np.asarray(got["gammas"]), np.ones(5))
    assert got["labels"] == ["a", "b"] and got["k"] == 7


def test_load_with_sharding(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from velocyto_tpu.parallel.mesh import make_mesh, CELLS
    from velocyto_tpu.io.checkpoint import save_state, load_state
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh()
    state = {"X": np.arange(64.0).reshape(8, 8)}
    path = str(tmp_path / "ckpt2")
    save_state(path, state)
    got = load_state(path, shardings={
        "X": NamedSharding(mesh, P(CELLS, None))})
    assert not got["X"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(got["X"]), state["X"])


def test_save_load_vlm(tmp_path):
    import velocyto_tpu as vt
    from velocyto_tpu.io.checkpoint import save_vlm, load_vlm
    vlm = vt.VelocytoLoom.__new__(vt.VelocytoLoom)
    vlm.S = np.random.rand(5, 9)
    vlm.gammas = np.random.rand(5)
    path = str(tmp_path / "vckpt")
    save_vlm(path, vlm)
    v2 = load_vlm(path)
    np.testing.assert_array_equal(np.asarray(v2.S), vlm.S)
    np.testing.assert_array_equal(np.asarray(v2.gammas), vlm.gammas)


def test_stage_timer():
    from velocyto_tpu.utils.profiling import stage_timer
    t = stage_timer(sync=False)
    with t("a"):
        pass
    with t("a"):
        pass
    rep = t.report()
    assert "a" in rep and t.counts["a"] == 2
