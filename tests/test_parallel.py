"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel
training step and the edge-partitioned association matvec."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _rand_graph(rng, n, density=0.5):
    A = (rng.uniform(size=(n, n)) < density).astype(np.float32)
    np.fill_diagonal(A, 0)
    A = np.maximum(A, A.T)
    src, dst = np.nonzero(A)
    return src.astype(np.int32), dst.astype(np.int32)


@pytest.mark.parametrize("transpose", [False, True])
def test_edge_sharded_matvec_matches_single_device(rng, transpose):
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import (edge_sharded_matvec,
                                                     make_edge_mesh,
                                                     shard_pair_for_edges)

    n1, n2, c = 8, 8, 4
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    e1 = (len(src1) // 8) * 8  # multiple of mesh size
    src1, dst1 = src1[:e1], dst1[:e1]
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(e1, len(src2))).astype(np.float32))
    s1, d1 = jnp.asarray(src1), jnp.asarray(dst1)
    s2, d2 = jnp.asarray(src2), jnp.asarray(dst2)

    want = assoc_matvec(X, Kp, Ke, s1, d1, s2, d2, transpose=transpose)

    mesh = make_edge_mesh(8)
    fn = edge_sharded_matvec(mesh)
    Ke_s, s1_s, d1_s = shard_pair_for_edges(mesh, Ke, s1, d1)
    got = fn(X, Kp, Ke_s, s1_s, d1_s, s2, d2, transpose=transpose)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_edge_partition_reference_matches(rng):
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import edge_partition_reference

    n = 6
    src1, dst1 = _rand_graph(rng, n)
    src2, dst2 = _rand_graph(rng, n)
    X = jnp.asarray(rng.normal(size=(n, n, 3)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(len(src1), len(src2))).astype(np.float32))
    want = assoc_matvec(X, Kp, Ke, src1, dst1, src2, dst2)
    got = edge_partition_reference(X, Kp, Ke, src1, dst1, src2, dst2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_data_parallel_train_step_runs_on_mesh(rng):
    """The driver's dryrun_multichip path as a regression test."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_hybrid_mesh_and_global_batch(rng):
    """(data=4, edge=2) hybrid mesh: batch sharded over data, replicated over
    edge; single-process global assembly path."""
    import jax.numpy as jnp
    from fpmatch_tpu.parallel.distributed import (global_batch_from_local,
                                                  make_hybrid_mesh)

    mesh = make_hybrid_mesh(4, 2)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    g = global_batch_from_local({"x": x}, mesh)
    assert g["x"].shape == (8, 16)
    assert len(g["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(g["x"]), np.asarray(x))
