"""Mesh evidence past 8 devices (VERDICT r3 item 4): the driver-style
multichip dryrun at 16 and 32 virtual CPU devices, plus mesh-shape
asserts for non-power-of-2 device counts."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_scales(n_devices, tmp_path):
    """__graft_entry__.dryrun_multichip (production stitch steps 2+6 and
    the decon pipeline on the mesh) compiles and executes at 16 and 32
    devices — fresh interpreter per count (the CPU device count freezes
    at first backend touch)."""
    r = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {str(REPO)!r}); "
         f"from __graft_entry__ import dryrun_multichip; "
         f"dryrun_multichip({n_devices}); print('OK')"],
        capture_output=True, text=True, timeout=900, cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "OK" in r.stdout


def test_make_mesh_non_pow2_shapes():
    """make_mesh on non-power-of-2 counts: valid factorizations produce
    the right ('data', 'z') shape, invalid ones fail loudly (the
    reshape assumptions VERDICT r3 flagged as untested)."""
    from ipp_tpu.parallel.mesh import make_mesh

    m = make_mesh(6, z_parallel=3)
    assert dict(m.shape) == {"data": 2, "z": 3}
    m = make_mesh(6, z_parallel=2)
    assert dict(m.shape) == {"data": 3, "z": 2}
    m = make_mesh(5)
    assert dict(m.shape) == {"data": 5, "z": 1}
    m = make_mesh(7, z_parallel=7)
    assert dict(m.shape) == {"data": 1, "z": 7}
    with pytest.raises(AssertionError):
        make_mesh(6, z_parallel=4)  # 6 % 4 != 0


def test_non_pow2_mesh_runs_sharded_ops():
    """A 6-device ('data'=3, 'z'=2) mesh actually executes the production
    sharded ops (batched RL + NCC maps), and padding to a device-count
    multiple reproduces the unsharded result."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ipp_tpu.ops.deconv import richardson_lucy_batched
    from ipp_tpu.ops.ncc import ncc_maps_batched
    from ipp_tpu.ops.psf import gaussian_psf
    from ipp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    mesh = make_mesh(6, z_parallel=2)
    psf = jnp.asarray(gaussian_psf((3, 3, 3), (1.0, 1.0, 1.0)))
    vols = rng.random((3, 8, 16, 16)).astype(np.float32) * 100
    sh = NamedSharding(mesh, P("data", "z", None, None))
    dec_sharded = np.asarray(richardson_lucy_batched(
        jax.device_put(jnp.asarray(vols), sh), psf, niter=2,
        fft_shape=(8, 16, 16), edge_taper=False, sharding=sh))
    dec_local = np.asarray(richardson_lucy_batched(
        jnp.asarray(vols), psf, niter=2, fft_shape=(8, 16, 16),
        edge_taper=False))
    np.testing.assert_allclose(dec_sharded, dec_local, rtol=2e-5, atol=2e-3)

    # NCC pair batch (5 pairs) through the sharded path on the 6-dev mesh
    # exercises the pad-to-multiple branch (5 -> 6)
    from ipp_tpu.ops.ncc import _ncc_maps_sharded

    ma = rng.random((5, 32, 24)).astype(np.float32)
    mb = np.roll(ma, 1, axis=1) + rng.normal(0, 0.01, ma.shape).astype(
        np.float32)
    got = _ncc_maps_sharded(ma, mb, 4, 4, mesh)
    ref = np.asarray(ncc_maps_batched(jnp.asarray(ma), jnp.asarray(mb),
                                      4, 4), np.float64)
    np.testing.assert_allclose(got, ref, atol=1e-5)
