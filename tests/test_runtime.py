"""Host-runtime tests: native _hostio extension (when built) and fallbacks."""
import numpy as np

from nbodyhpc_tpu import runtime


def test_generate_uniform_deterministic():
    a = runtime.generate_uniform(1000, seed=5)
    b = runtime.generate_uniform(1000, seed=5)
    np.testing.assert_array_equal(a, b)
    c = runtime.generate_uniform(1000, seed=6)
    assert not np.array_equal(a, c)
    assert a.dtype == np.float32 and a.shape == (1000, 3)
    assert a.min() >= 0.0 and a.max() < 1.0


def test_particle_io_roundtrip(tmp_path):
    rng = np.random.Generator(np.random.Philox(3))
    pos = rng.random((100, 3)).astype(np.float32)
    w = rng.random(100).astype(np.float32)
    r = rng.random(100).astype(np.float32)
    path = str(tmp_path / "p.bin")
    runtime.save_particles(path, pos, w, r)
    p2, w2, r2 = runtime.load_particles(path)
    np.testing.assert_array_equal(pos, p2)
    np.testing.assert_array_equal(w, w2)
    np.testing.assert_array_equal(r, r2)


def test_load_points(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    path = str(tmp_path / "pts.bin")
    pts.tofile(path)
    got = runtime.load_points(path)
    np.testing.assert_array_equal(got, pts)


def test_native_matches_numpy_fallback_format():
    """Native and fallback must agree on dtype/shape/range semantics (values
    differ: different Philox keying), so downstream code is agnostic."""
    a = runtime.generate_uniform(64, seed=1, boxsize=2.0)
    assert a.shape == (64, 3) and a.dtype == np.float32
    assert a.min() >= 0.0 and a.max() < 2.0


def test_field_save_load_roundtrip(tmp_path):
    rng = np.random.Generator(np.random.Philox(8))
    field = rng.random((8, 12, 16)).astype(np.float32)
    path = str(tmp_path / "field.bin")
    runtime.save_field(path, field)
    got = runtime.load_field(path)
    np.testing.assert_array_equal(got, field)


def test_profiling_timer():
    from nbodyhpc_tpu.utils.profiling import timer

    out = []
    with timer("x", sink=out.append) as box:
        pass
    assert "seconds" in box and out and out[0].startswith("x:")
