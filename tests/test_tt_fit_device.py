"""TT-fit device engine (round 5).

The round-4 "by design host-only" note on ``ChebyshevTT.fit`` was
profiled and refuted (design rows + Grams + interfaces are ~96% of
wall time at N=5e5); these tests pin the device engine's parity with
the host engine at noise scale, the mesh path, and the validation
surface.
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevTT
from pychebyshev_tpu.utils.fitting import fit_tt_cores

DOM = [[0.0, 1.0]] * 4


def _samples(n=30000, noise=1e-4, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 1.0, (n, 4))
    vals = (np.prod(np.cos(2 * pts), axis=1) + 0.1 * pts.sum(1)
            + rng.normal(0.0, noise, n))
    return pts, vals


class TestDeviceEngine:
    def test_matches_host_at_noise_scale(self):
        pts, vals = _samples()
        _, dh = fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=4,
                             sweeps=4, l2=1e-8)
        _, dd = fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=4,
                             sweeps=4, l2=1e-8, engine="device")
        # Both engines must fit to the 1e-4 noise floor; the f32 Gram
        # tier may differ at the floor's own scale, not above it.
        assert dh["rms"] < 3e-4
        assert dd["rms"] < 3e-4
        assert abs(dd["rms"] - dh["rms"]) < 1e-4

    def test_mesh_matches_single_device(self):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        pts, vals = _samples(n=20001)       # odd: exercises padding
        mesh = make_mesh(8)
        _, ds = fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=4,
                             sweeps=3, l2=1e-8, engine="device")
        _, dm = fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=4,
                             sweeps=3, l2=1e-8, engine="device",
                             mesh=mesh)
        assert abs(dm["rms"] - ds["rms"]) < 1e-5

    def test_weights_respected(self):
        pts, vals = _samples(n=20000)
        w = np.ones(len(vals))
        w[: len(vals) // 2] = 0.0
        _, d = fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=3,
                            sweeps=2, l2=1e-8, engine="device",
                            sample_weight=w)
        assert np.isfinite(d["rms"])

    def test_validation(self):
        pts, vals = _samples(n=2000)
        with pytest.raises(ValueError, match="engine"):
            fit_tt_cores(pts, vals, DOM, [6] * 4, engine="gpu")
        with pytest.raises(ValueError, match="mesh"):
            from pychebyshev_tpu.parallel.sharding import make_mesh
            fit_tt_cores(pts, vals, DOM, [6] * 4, engine="host",
                         mesh=make_mesh(8))
        with pytest.warns(RuntimeWarning, match="f32"):
            fit_tt_cores(pts, vals, DOM, [6] * 4, max_rank=2,
                         sweeps=1, l2=0.0, engine="device")

    def test_class_pass_through(self):
        pts, vals = _samples(n=20000)
        tt = ChebyshevTT.fit(pts, vals, 4, DOM, [6] * 4, max_rank=4,
                             sweeps=3, l2=1e-8, engine="device")
        got = tt.eval_batch(pts[:512])
        clean = np.prod(np.cos(2 * pts[:512]), axis=1) \
            + 0.1 * pts[:512].sum(1)
        assert np.abs(got - clean).max() < 5e-3
