"""Mesh, halo exchange, and sharded execution on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ipp_tpu.parallel.halo import exchange_halos_z, sharded_map_blocks_z
from ipp_tpu.parallel.mesh import block_sharding, data_sharding, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, z_parallel=1)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 8, "z": 1}
    m2 = make_mesh(8, z_parallel=2)
    assert m2.shape == {"data": 4, "z": 2}


def test_halo_exchange_z_matches_gather(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("z",))
    vol = jnp.asarray(rng.standard_normal((16, 8, 8)).astype(np.float32))
    halo = 2

    def fn(block_ext):
        return block_ext  # identity: wrapper crops halos back off

    with mesh:
        sharded = jax.device_put(vol, NamedSharding(mesh, P("z", None, None)))
        out = jax.jit(sharded_map_blocks_z(fn, mesh, halo))(sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol))

    # now verify halos carry REAL neighbor data: a mean-filter along z over
    # the extended block must equal the global mean filter (away from edges)
    def zmean(block_ext):
        k = 2 * halo + 1
        stack = jnp.stack([block_ext[i:block_ext.shape[0] - (k - 1 - i)]
                           for i in range(k)])
        m = jnp.mean(stack, axis=0)
        return jnp.pad(m, ((halo, halo), (0, 0), (0, 0)))

    with mesh:
        sharded = jax.device_put(vol, NamedSharding(mesh, P("z", None, None)))
        out = np.asarray(jax.jit(sharded_map_blocks_z(zmean, mesh, halo))(sharded))
    k = 2 * halo + 1
    ref_full = np.stack([np.asarray(vol)[i:16 - (k - 1 - i)]
                         for i in range(k)]).mean(axis=0)
    # out[halo + j] is the filter centered at plane halo + j == ref_full[j]:
    # exact everywhere away from the global edges, proving the halos carried
    # real neighbor data across shard boundaries
    np.testing.assert_allclose(out[halo:16 - halo], ref_full, atol=1e-5)


def test_data_sharding_destripe(mesh8, rng):
    from ipp_tpu.ops.destripe import filter_streaks

    tiles = jnp.asarray(rng.integers(0, 40000, (8, 64, 64)).astype(np.uint16))
    with mesh8:
        sharded = jax.device_put(tiles, data_sharding(mesh8, 3))
        ref = np.asarray(filter_streaks(tiles, sigma=(8, 8), wavelet="db3"))
        # shard_map per-device local programs
        from jax import shard_map

        f = shard_map(lambda t: filter_streaks(t, sigma=(8, 8), wavelet="db3"),
                      mesh=mesh8, in_specs=P(("data", "z"), None, None),
                      out_specs=P(("data", "z"), None, None))
        out = np.asarray(jax.jit(f)(sharded))
    np.testing.assert_array_equal(out, ref)
