"""Cross-chip point-dimension sharding (ppermute rings) vs the
single-device neighbor ops they shard.

Every ring op in ``parallel/point_sharding.py`` must be bit-identical to
its ``ops/`` counterpart at matched inputs — the ring changes WHERE the
work happens, not the arithmetic (SURVEY.md section 2.3, the
sequence-parallel analogue)."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.ops.grouping import (
    ball_query,
    index_points,
    sample_and_group,
    three_nn_interpolate,
)
from point2cyl_tpu.ops.sampling import farthest_point_sample
from point2cyl_tpu.parallel.mesh import make_mesh
from point2cyl_tpu.parallel import point_sharding as ps


def _cloud(key, b, n):
    return jax.random.uniform(key, (b, n, 3), minval=-1.0, maxval=1.0)


def test_ring_ball_query_matches_single_device():
    mesh = make_mesh(8)
    xyz = _cloud(jax.random.key(0), 2, 256)
    q = _cloud(jax.random.key(1), 2, 64)
    # seed queries with actual points so every row has an in-radius hit
    q = q.at[:, :32].set(xyz[:, ::8][:, :32])
    want = ball_query(0.4, 16, xyz, q)
    got = ps.ball_query_sharded(mesh, 0.4, 16, xyz, q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_gather_matches_index_points():
    mesh = make_mesh(8)
    pts = jax.random.normal(jax.random.key(2), (2, 128, 5))
    idx = jax.random.randint(jax.random.key(3), (2, 64, 7), 0, 128)
    want = index_points(pts, idx)
    got = ps.index_points_sharded(mesh, pts, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_three_nn_matches_single_device():
    mesh = make_mesh(8)
    dst = _cloud(jax.random.key(4), 2, 256)
    src = _cloud(jax.random.key(5), 2, 64)
    feats = jax.random.normal(jax.random.key(6), (2, 64, 9))
    want = three_nn_interpolate(dst, src, feats)
    got = ps.three_nn_interpolate_sharded(mesh, dst, src, feats)
    # the inverse-distance blend is float: sharded einsum shapes change
    # FMA contraction order at the ~1e-5 level (selection is pinned
    # exactly by test_ring_three_nn_indices_exact below)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-5
    )


def test_ring_three_nn_indices_exact():
    """The global 3-NN index selection (incl. tie order) is bit-identical
    to the single-device top_k."""
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from point2cyl_tpu.ops.grouping import square_distance

    mesh = make_mesh(8)
    dst = _cloud(jax.random.key(4), 2, 256)
    src = _cloud(jax.random.key(5), 2, 64)
    _, want_idx = jax.lax.top_k(-square_distance(dst, src), 3)
    fn = jax.shard_map(
        partial(ps._ring_three_nn_local, axis="data", n_shards=8),
        mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data", None)),
        out_specs=(P(None, "data", None), P(None, "data", None)),
    )
    _, got_idx = fn(dst, src)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_sharded_fps_matches_single_device():
    mesh = make_mesh(8)
    xyz = _cloud(jax.random.key(7), 3, 512)
    want = farthest_point_sample(xyz, 64, key=None, start_idx=0)
    got = ps.farthest_point_sample_sharded(mesh, xyz, 64, start_idx=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_sample_and_group_matches_single_device():
    mesh = make_mesh(8)
    xyz = _cloud(jax.random.key(8), 2, 256)
    feats = jax.random.normal(jax.random.key(9), (2, 256, 6))
    fps_idx = farthest_point_sample(xyz, 64, key=None, start_idx=0)
    want_xyz, want_f = sample_and_group(64, 0.4, 16, xyz, feats, fps_idx)
    got_xyz, got_f = ps.sample_and_group_sharded(
        mesh, 0.4, 16, xyz, feats, fps_idx
    )
    np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(want_xyz))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))


def test_sharded_sample_and_group_no_feats():
    mesh = make_mesh(8)
    xyz = _cloud(jax.random.key(10), 2, 128)
    fps_idx = farthest_point_sample(xyz, 32, key=None, start_idx=0)
    want_xyz, want_f = sample_and_group(32, 0.4, 8, xyz, None, fps_idx)
    got_xyz, got_f = ps.sample_and_group_sharded(
        mesh, 0.4, 8, xyz, None, fps_idx
    )
    np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(want_xyz))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))


def test_ring_ops_shard_outputs_over_the_mesh():
    """The outputs really are point-sharded (one shard per device), so a
    downstream sharded MLP never materializes the full cloud per chip."""
    mesh = make_mesh(8)
    xyz = _cloud(jax.random.key(11), 2, 256)
    q = xyz[:, ::4]
    idx = ps.ball_query_sharded(mesh, 0.4, 16, xyz, q)
    devs = {d.id for d in idx.sharding.device_set}
    assert len(devs) == 8
    shard_shapes = {s.data.shape for s in idx.addressable_shards}
    assert shard_shapes == {(2, 64 // 8, 16)}


def test_point_sharded_backbone_matches_single_device():
    """The full eval-mode backbone forward with the point axis sharded
    (parallel/sharded_backbone.py) reproduces Backbone.apply: SA1 runs
    via the exact ring ops, the mid-pyramid replicated, fp1 + heads
    shard-local — same params, same outputs."""
    from point2cyl_tpu.core.config import BackboneConfig
    from point2cyl_tpu.models.backbone import Backbone
    from point2cyl_tpu.parallel.sharded_backbone import (
        backbone_apply_point_sharded,
    )

    mesh = make_mesh(8)
    cfg = BackboneConfig(
        num_points=256, sa_npoints=(64, 16), sa_radii=(0.4, 0.8),
        sa_nsamples=(16, 8), sa_mlps=((8, 16), (16, 32)),
        sa_global_mlp=(32, 32), fp_mlps=((16,), (16,), (8, 8)),
        fc_width=8, output_sizes=(3, 4), approx_neighbors=False,
    )
    pts = _cloud(jax.random.key(12), 2, 256)
    model = Backbone(cfg)
    v = model.init({"params": jax.random.key(13)}, pts, train=False)
    want = model.apply(v, pts, train=False)
    got = backbone_apply_point_sharded(mesh, v, cfg, pts)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        # selection/gather paths are exact; the fp blends and MLP chains
        # accumulate float noise only through all_gather layout changes
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5
        )
        devs = {d.id for d in g.sharding.device_set}
        assert len(devs) == 8
