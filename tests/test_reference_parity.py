"""A/B parity tests against the mounted torch reference (/root/reference).

Every live op with subtle semantics is run side-by-side with the actual
reference function on randomized inputs (VERDICT.md round-1 item #1). Random
choices internal to the reference (torch.randint segment sampling, FPS
starts) are pinned to deterministic sequences that the repo ops reproduce
via ``key=None`` modes, making most comparisons bit-level (f32 ulp).

Oracle import machinery (dependency stubs, symeig shim) lives in
``tests/reference_oracle.py``.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_oracle import make_labeled_cloud, ref

from point2cyl_tpu.eval import metrics as M
from point2cyl_tpu.losses import aggregate as LA
from point2cyl_tpu.losses import normal as LN
from point2cyl_tpu.losses import segmentation as LS
from point2cyl_tpu.ops import geometry as G
from point2cyl_tpu.ops import grouping as GR
from point2cyl_tpu.ops import linalg as LIN
from point2cyl_tpu.ops import matching as MA
from point2cyl_tpu.ops import sampling as SA

B, N, K, S = 3, 96, 4, 16


@contextlib.contextmanager
def deterministic_torch_randint():
    """Replace torch.randint with arange % high — the same sequence
    ``sample_segment_points(key=None, ...)`` draws."""
    orig = torch.randint

    def det(low, high, size, **kw):
        total = int(np.prod(size))
        out = (torch.arange(total) % max(int(high), 1)).reshape(size)
        return out.to(kw.get("dtype", torch.long))

    torch.randint = det
    try:
        yield
    finally:
        torch.randint = orig


@pytest.fixture(scope="module")
def cloud():
    return make_labeled_cloud(
        np.random.default_rng(7), B, N, K, min_instances=2
    )


def _t(x):
    return torch.tensor(np.asarray(x))


# ---------------------------------------------------------------------------
# C5: axis estimator (data_utils.py:99-177)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("normalize", [False, True])
def test_estimate_extrusion_axis(cloud, normalize):
    w2k = np.random.default_rng(11).dirichlet(
        np.ones(2 * K), (B, N)
    ).astype(np.float32)
    w_barrel, w_base = w2k[..., 0::2], w2k[..., 1::2]
    with torch.no_grad():
        ref_ax = ref.data_utils.estimate_extrusion_axis(
            _t(cloud["normals"]).double(),
            _t(w_barrel).double(),
            _t(w_base).double(),
            _t(cloud["bb"]),
            _t(cloud["seg"]),
            normalize=normalize,
        ).numpy()
    mine = np.array(
        LIN.estimate_extrusion_axis(
            jnp.array(cloud["normals"]),
            jnp.array(w_barrel),
            jnp.array(w_base),
            jnp.array(cloud["bb"]),
            jnp.array(cloud["seg"]),
            normalize=normalize,
        )
    )
    # Eigenvector sign is arbitrary; compare up to sign.
    err = np.minimum(
        np.linalg.norm(mine - ref_ax, axis=-1),
        np.linalg.norm(mine + ref_ax, axis=-1),
    )
    assert err.max() < 5e-3, err.max()


# ---------------------------------------------------------------------------
# C11: hungarian matching + mIoU (losses.py:22-117)
# ---------------------------------------------------------------------------


def test_hungarian_matching(cloud):
    w = jnp.array(cloud["w_soft"])
    i_gt = jnp.array(cloud["seg"])
    mine_match, mine_mask = MA.hungarian_matching(w, i_gt)
    with torch.no_grad():
        ref_match, ref_mask = ref.losses.hungarian_matching(
            _t(cloud["w_soft"]), _t(cloud["seg"]), with_mask=True
        )
    assert np.array_equal(np.array(mine_mask), ref_mask.numpy())
    valid = ref_mask.numpy()
    assert np.array_equal(
        np.array(mine_match)[valid], ref_match.numpy()[valid]
    )


def test_miou_loss_and_iou(cloud):
    w = jnp.array(cloud["w_soft"])
    i_gt = jnp.array(cloud["seg"])
    match, mask = MA.hungarian_matching(w, i_gt)
    mine_loss, mine_reord = LS.compute_miou_loss(w, i_gt, match)
    mine_iou = LS.segmentation_iou(w, i_gt, match, mask)
    with torch.no_grad():
        rl, _, rw = ref.losses.compute_miou_loss(
            _t(cloud["w_soft"]), _t(cloud["seg"]), _t(np.array(match))
        )
        riou = ref.losses.compute_segmentation_iou(
            _t(cloud["w_soft"]),
            _t(cloud["seg"]),
            _t(np.array(match)),
            _t(np.array(mask)).float(),
        )
    np.testing.assert_allclose(
        np.array(mine_loss), rl.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(mine_reord), rw.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(np.array(mine_iou), riou.numpy(), atol=1e-5)


def test_hard_w_encoding(cloud):
    w = cloud["w_soft"]
    for null in (False, True):
        mine = np.array(
            MA.hard_w_encoding(jnp.array(w), to_null_mask=null)
        )
        with torch.no_grad():
            r = ref.losses.hard_W_encoding(_t(w), to_null_mask=null)
        np.testing.assert_array_equal(mine, r.numpy())


def test_mask_gt_and_reduce(cloud):
    i_gt = cloud["seg"]
    mine_mask = np.array(MA.mask_gt_from_labels(jnp.array(i_gt), K))
    with torch.no_grad():
        ref_mask = ref.losses.get_mask_gt(_t(i_gt), K)
    np.testing.assert_array_equal(mine_mask, ref_mask.numpy())

    loss = np.random.default_rng(3).random((B, K)).astype(np.float32)
    mine_red = np.array(
        MA.reduce_mean_masked_instance(jnp.array(loss), jnp.array(mine_mask))
    )
    with torch.no_grad():
        ref_red = ref.losses.reduce_mean_masked_instance(_t(loss), ref_mask)
    np.testing.assert_allclose(mine_red, ref_red.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# C12/C15: normal losses + aggregate (losses.py:120-159,317-351)
# ---------------------------------------------------------------------------


def test_normal_loss_and_difference(cloud):
    x = cloud["normals"]
    rng = np.random.default_rng(5)
    y = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    for angle_diff in (False, True):
        mine = np.array(
            LN.normal_loss(
                jnp.array(x), jnp.array(y), angle_diff=angle_diff
            )
        )
        with torch.no_grad():
            r = ref.losses.compute_normal_loss(
                _t(x), _t(y), angle_diff=angle_diff
            )
        np.testing.assert_allclose(mine, r.numpy(), atol=1e-5)
    mine_deg = np.array(
        LN.normal_difference(jnp.array(x), jnp.array(y), in_radians=False)
    )
    with torch.no_grad():
        r_deg = ref.losses.compute_normal_difference(
            _t(x), _t(y), in_radians=False
        )
    np.testing.assert_allclose(mine_deg, r_deg.numpy(), atol=1e-3)


def test_compute_all_losses(cloud):
    x_pred = cloud["normals"][:, ::-1].copy()
    total, nl, ml, match, mask = LA.compute_all_losses(
        jnp.array(cloud["w_soft"]),
        jnp.array(cloud["seg"]),
        jnp.array(x_pred),
        jnp.array(cloud["normals"]),
        normal_loss_multiplier=1.0,
        miou_loss_multiplier=1.0,
    )
    with torch.no_grad():
        rt, rn, rm, rmatch, rmask = ref.losses.compute_all_losses(
            _t(cloud["points"]),
            _t(cloud["w_soft"]),
            _t(cloud["seg"]),
            _t(x_pred),
            _t(cloud["normals"]),
            normal_loss_multiplier=1.0,
            miou_loss_multiplier=1.0,
            return_match_indices=True,
        )
    np.testing.assert_allclose(float(total), float(rt), atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.mean(nl)), float(rn), atol=1e-5
    )
    np.testing.assert_allclose(
        float(jnp.mean(ml)), float(rm), atol=1e-5
    )
    valid = rmask.numpy()
    assert np.array_equal(np.array(match)[valid], rmatch.numpy()[valid])


# ---------------------------------------------------------------------------
# C6: centers (data_utils.py:253-266, eval.py:409-436)
# ---------------------------------------------------------------------------


def test_estimate_extrusion_centers(cloud):
    mine = np.array(
        G.estimate_extrusion_centers(
            jnp.array(cloud["w_soft"]), jnp.array(cloud["points"])
        )
    )
    with torch.no_grad():
        r = ref.data_utils.estimate_extrusion_centers(
            _t(cloud["w_soft"]), _t(cloud["points"])
        )
    np.testing.assert_allclose(mine, r.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# C8: 2D sketch projection (data_utils.py:1014-1417)
# ---------------------------------------------------------------------------


def _ref_projection(cloud, variant, s):
    fns = {
        1: ref.data_utils.sketch_implicit_projection,
        2: ref.data_utils.sketch_implicit_projection2,
        3: ref.data_utils.sketch_implicit_projection3,
    }
    with deterministic_torch_randint(), torch.no_grad():
        return fns[variant](
            _t(cloud["points"]),
            _t(cloud["normals"]),
            _t(cloud["seg"]),
            _t(cloud["bb"]),
            _t(cloud["axes"]),
            _t(cloud["centers"]),
            num_points_to_sample=s,
        )


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_sketch_projection_reference_mode(cloud, variant):
    # projection3 takes ALL points in order, no sampling
    # (data_utils.py:1333-1336): its S must equal N.
    s = N if variant == 3 else S
    out = _ref_projection(cloud, variant, s)
    if variant == 1:
        rp, rn, rs = out
        rf = None
    else:
        rp, rn, rs, rf = out
    p2d, n2d, sc, fnd = G.sketch_projection(
        None,
        jnp.array(cloud["points"]),
        jnp.array(cloud["normals"]),
        jnp.array(cloud["seg"]),
        jnp.array(cloud["bb"]) if variant != 3 else None,
        jnp.array(cloud["axes"]),
        jnp.array(cloud["centers"]),
        num_samples=s,
        rotation_mode="reference",
    )
    if rf is not None:
        assert np.array_equal(np.array(fnd), rf.numpy().astype(bool))
    m = np.array(fnd)[..., None, None].astype(np.float32)
    np.testing.assert_allclose(
        np.array(p2d) * m,
        rp.numpy().transpose(1, 0, 2, 3) * m,
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.array(n2d) * m,
        rn.numpy().transpose(1, 0, 2, 3) * m,
        atol=2e-6,
    )
    np.testing.assert_allclose(np.array(sc), rs.numpy().T, atol=2e-6)


def test_sketch_projection_exact_mode_z_axes(cloud):
    """With axes already on +z the tgm defect vanishes and the default
    exact-Rodrigues mode must match the reference bit-for-bit."""
    axes = np.zeros_like(cloud["axes"])
    axes[..., 2] = 1.0
    c2 = dict(cloud, axes=axes)
    rp, rn, rs, rf = _ref_projection(c2, 2, S)
    p2d, n2d, sc, fnd = G.sketch_projection(
        None,
        jnp.array(c2["points"]),
        jnp.array(c2["normals"]),
        jnp.array(c2["seg"]),
        jnp.array(c2["bb"]),
        jnp.array(axes),
        jnp.array(c2["centers"]),
        num_samples=S,
        rotation_mode="exact",
    )
    m = np.array(fnd)[..., None, None].astype(np.float32)
    np.testing.assert_allclose(
        np.array(p2d) * m, rp.numpy().transpose(1, 0, 2, 3) * m, atol=2e-6
    )
    np.testing.assert_allclose(np.array(sc), rs.numpy().T, atol=2e-6)


# ---------------------------------------------------------------------------
# C9: extents (data_utils.py:1650-1730)
# ---------------------------------------------------------------------------


def test_extrusion_extents(cloud):
    with deterministic_torch_randint(), torch.no_grad():
        re_, rf = ref.data_utils.get_extrusion_extents(
            _t(cloud["points"]),
            _t(cloud["seg"]),
            _t(cloud["bb"]),
            _t(cloud["axes"]),
            _t(cloud["centers"]),
            num_points_to_sample=S,
        )
    mine, fnd = G.extrusion_extents(
        None,
        jnp.array(cloud["points"]),
        jnp.array(cloud["seg"]),
        jnp.array(cloud["bb"]),
        jnp.array(cloud["axes"]),
        jnp.array(cloud["centers"]),
        num_samples=S,
    )
    assert np.array_equal(np.array(fnd), rf.numpy().astype(bool))
    m = np.array(fnd)[..., None].astype(np.float32)
    np.testing.assert_allclose(
        np.array(mine) * m,
        re_.numpy().transpose(1, 0, 2) * m,
        atol=2e-6,
    )


# ---------------------------------------------------------------------------
# C16: PointNet++ primitives (pointnet_util.py:19-107,298-308)
# ---------------------------------------------------------------------------


def test_square_distance(cloud):
    src = cloud["points"][:, :32]
    dst = cloud["points"][:, 32:80]
    mine = np.array(GR.square_distance(jnp.array(src), jnp.array(dst)))
    with torch.no_grad():
        r = ref.pointnet_util.square_distance(_t(src), _t(dst))
    np.testing.assert_allclose(mine, r.numpy(), atol=1e-5)


def test_farthest_point_sample(cloud):
    xyz = cloud["points"]
    with torch.no_grad(), deterministic_torch_randint():
        # randint -> zeros for the (B,) start draw (arange % N starts at 0)
        r = ref.pointnet_util.farthest_point_sample(_t(xyz), 24).numpy()
    # reference start: arange(B) % N = [0, 1, 2]; pin mine per-sample
    mine = []
    for b in range(B):
        mine.append(
            np.array(
                SA.farthest_point_sample(
                    jnp.array(xyz[b : b + 1]), 24, start_idx=b
                )
            )[0]
        )
    np.testing.assert_array_equal(np.stack(mine), r)


def test_ball_query(cloud):
    xyz = jnp.array(cloud["points"])
    fps_idx = SA.farthest_point_sample(xyz, 16, start_idx=0)
    new_xyz = GR.index_points(xyz, fps_idx)
    mine = np.array(GR.ball_query(0.4, 8, xyz, new_xyz, approx=False))
    with torch.no_grad():
        r = ref.pointnet_util.query_ball_point(
            0.4, 8, _t(cloud["points"]), _t(np.array(new_xyz))
        )
    np.testing.assert_array_equal(mine, r.numpy())


def test_three_nn_interpolation(cloud):
    xyz_dst = cloud["points"]
    xyz_src = cloud["points"][:, ::7].copy()
    feats = np.random.default_rng(9).random(
        (B, xyz_src.shape[1], 5)
    ).astype(np.float32)
    mine = np.array(
        GR.three_nn_interpolate(
            jnp.array(xyz_dst), jnp.array(xyz_src), jnp.array(feats)
        )
    )
    # reference formula inline (pointnet_util.py:298-308)
    with torch.no_grad():
        d = ref.pointnet_util.square_distance(_t(xyz_dst), _t(xyz_src))
        dists, idx = d.sort(dim=-1)
        dists, idx = dists[:, :, :3], idx[:, :, :3]
        recip = 1.0 / (dists + 1e-8)
        norm = torch.sum(recip, dim=2, keepdim=True)
        weight = recip / norm
        r = torch.sum(
            ref.pointnet_util.index_points(_t(feats), idx)
            * weight.view(B, -1, 3, 1),
            dim=2,
        )
    np.testing.assert_allclose(mine, r.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# C18: end-to-end backbone forward with shared weights
# ---------------------------------------------------------------------------


def test_backbone_forward_same_weights():
    from point2cyl_tpu.core.config import BackboneConfig
    from point2cyl_tpu.core.torch_compat import export_backbone
    from point2cyl_tpu.models.backbone import Backbone

    bN, bB = 1024, 2
    rng = np.random.default_rng(21)
    pts = rng.standard_normal((bB, bN, 3)).astype(np.float32)
    pts /= np.abs(pts).max()

    cfg = BackboneConfig(
        num_points=bN,
        output_sizes=(3, 2 * K),
        approx_neighbors=False,
        fps_impl="xla",
        knn_impl="xla",
    )
    model = Backbone(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.array(pts), train=False
    )
    mine = model.apply(variables, jnp.array(pts), train=False)

    sd = {k: torch.tensor(v) for k, v in export_backbone(
        variables["params"], variables["batch_stats"]
    ).items()}
    tm = ref.pointnet_extrusion.backbone(output_sizes=[3, 2 * K])
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing
    tm.eval()

    orig_randint = torch.randint
    orig_dropout = torch.nn.functional.dropout
    torch.randint = lambda low, high, size, **kw: torch.zeros(
        size, dtype=torch.long
    )  # pin FPS start to index 0 (matches eval-mode jax FPS)
    # reference defect: F.dropout is called without training=self.training
    # (pointnet_extrusion.py:61), so dropout is live even in eval; disable
    # it for a deterministic A/B.
    torch.nn.functional.dropout = lambda x, p=0.5, **kw: x
    try:
        with torch.no_grad():
            r_norm, r_seg = tm(_t(pts))
    finally:
        torch.randint = orig_randint
        torch.nn.functional.dropout = orig_dropout

    np.testing.assert_allclose(
        np.array(mine[0]), r_norm.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.array(mine[1]), r_seg.numpy(), atol=2e-3
    )


# ---------------------------------------------------------------------------
# C19/C21: implicit net + encoder forward with shared weights
# ---------------------------------------------------------------------------


def test_implicit_net_same_weights():
    from point2cyl_tpu.core.torch_compat import export_implicit
    from point2cyl_tpu.models.implicit import ImplicitNet

    d_in = 2 + 8
    net = ImplicitNet(d_in=d_in, hidden=(32,) * 7, skip_in=(4,))
    x = np.random.default_rng(2).standard_normal((64, d_in)).astype(
        np.float32
    )
    params = net.init(jax.random.PRNGKey(1), jnp.array(x))["params"]
    mine = np.array(net.apply({"params": params}, jnp.array(x)))

    sd = {k: torch.tensor(v) for k, v in export_implicit(params).items()}
    tnet = ref.igr_network.ImplicitNet(
        d_in=d_in, dims=[32] * 7, skip_in=(4,)
    )
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected and not missing, (missing, unexpected)
    tnet.eval()
    with torch.no_grad():
        r = tnet(_t(x)).numpy()
    np.testing.assert_allclose(mine, r, atol=1e-4)


def test_pointnet_encoder_train_mode_parity_f64():
    """Train-mode (batch-stat BN) encoder parity in f64: pins that the
    TRAIN path — biased batch variance, eps placement, max pool, final
    normalize — is semantically identical to torch's. In f32 the BN
    variance reassociation noise flips max-pool winners (diffs ~1e-2),
    so the semantic pin must run in f64."""
    from point2cyl_tpu.core.torch_compat import export_encoder
    from point2cyl_tpu.models.implicit import PointNetEncoder

    lat_dim, rows, s = 16, 12, 16
    rng = np.random.default_rng(9)
    x = rng.standard_normal((rows, s, 4))
    enc = PointNetEncoder(lat_dim, 2, with_normals=True)
    variables = enc.init(jax.random.PRNGKey(4), jnp.zeros((1, s, 4)),
                         train=False)
    with jax.enable_x64(True):
        v64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                                 jnp.float64), variables)
        lat_j, _ = enc.apply(v64, jnp.asarray(x, jnp.float64), train=True,
                             mutable=["batch_stats"])
        lat_j = np.asarray(lat_j)

    tenc = ref.igr_network.PointNetEncoder(
        lat_dim, input_channels=2, with_normals=True
    ).double()
    sd = {k: torch.tensor(np.asarray(v, np.float64))
          for k, v in export_encoder(variables["params"],
                                     variables["batch_stats"]).items()}
    _, unexpected = tenc.load_state_dict(sd, strict=False)
    assert not unexpected
    tenc.train()
    lat_t = tenc(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(lat_j, lat_t, atol=1e-6)


def test_pointnet_encoder_same_weights():
    from point2cyl_tpu.core.torch_compat import export_encoder
    from point2cyl_tpu.models.implicit import PointNetEncoder

    latent = 32
    enc = PointNetEncoder(
        embedding_size=latent, input_channels=2, with_normals=True
    )
    x = np.random.default_rng(4).standard_normal((2, 64, 4)).astype(
        np.float32
    )
    variables = enc.init(jax.random.PRNGKey(2), jnp.array(x), train=False)
    mine = np.array(enc.apply(variables, jnp.array(x), train=False))

    sd = {k: torch.tensor(v) for k, v in export_encoder(
        variables["params"], variables["batch_stats"]
    ).items()}
    tenc = ref.igr_network.PointNetEncoder(
        latent, input_channels=2, with_normals=True
    )
    missing, unexpected = tenc.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing
    tenc.eval()
    with torch.no_grad():
        r = tenc(_t(x)).numpy()
    np.testing.assert_allclose(mine, r, atol=1e-4)


# ---------------------------------------------------------------------------
# C4: noise augmentation (data_utils.py:84-96), statistical
# ---------------------------------------------------------------------------


def test_add_noise_statistics(cloud):
    out = np.array(
        G.add_noise(
            jax.random.PRNGKey(0),
            jnp.array(cloud["points"]),
            jnp.array(cloud["normals"]),
            sigma=0.02,
        )
    )
    np.random.seed(0)
    with torch.no_grad():
        rout = ref.data_utils.add_noise(
            _t(cloud["points"]), _t(cloud["normals"]), sigma=0.02
        ).numpy()
    d_mine = out - cloud["points"]
    d_ref = rout - cloud["points"]
    # displacement is colinear with the normal in both
    for d in (d_mine, d_ref):
        cross = np.cross(d, cloud["normals"])
        assert np.abs(cross).max() < 1e-5
    # same magnitude distribution
    s_mine = np.einsum("bnd,bnd->bn", d_mine, cloud["normals"])
    s_ref = np.einsum("bnd,bnd->bn", d_ref, cloud["normals"])
    assert abs(s_mine.std() - s_ref.std()) < 0.005
    assert abs(s_mine.mean() - s_ref.mean()) < 0.005


# ---------------------------------------------------------------------------
# Composite one-step loss parity: the trainers' inline loss blocks composed
# into ONE scalar, A/B'd with identical raw head outputs and batch
# (VERDICT.md round-2 missing #2; train_Point2Cyl_without_sketch.py:244-353,
# train_Point2Cyl.py:608-672). Feeding both stacks the SAME X_raw/W_raw
# isolates loss-stack parity from the backbone's own ~2e-3 forward diffs.
# ---------------------------------------------------------------------------


def _composite_inputs(cloud):
    rng = np.random.default_rng(31)
    x_raw = rng.standard_normal((B, N, 3)).astype(np.float32)
    w_raw = (2.0 * rng.standard_normal((B, N, 2 * K))).astype(np.float32)
    batch = {
        "point_cloud": jnp.array(cloud["points"]),
        "normals": jnp.array(cloud["normals"]),
        "extrusion_labels": jnp.array(cloud["seg"].astype(np.int32)),
        "base_barrel_labels": jnp.array(cloud["bb"].astype(np.int32)),
        "extrusion_axes": jnp.array(cloud["axes"]),
        "extrusion_centers": jnp.array(cloud["centers"]),
    }
    return x_raw, w_raw, batch


def _composite_cfg():
    from point2cyl_tpu.core.config import TrainConfig

    return TrainConfig(
        pred_seg=True, pred_normal=True, pred_bb=True,
        pred_extrusion=True, pred_center=True,
    )


def _torch_composite(cloud, x_raw, w_raw, requires_grad=False):
    from tests.reference_trainer import reference_proxy_losses

    xt = _t(x_raw).requires_grad_(requires_grad)
    wt = _t(w_raw).requires_grad_(requires_grad)
    out = reference_proxy_losses(
        xt, wt, _t(cloud["points"]), _t(cloud["normals"]),
        _t(cloud["seg"]), _t(cloud["bb"]), _t(cloud["axes"]),
        _t(cloud["centers"]),
    )
    return xt, wt, out


def test_composite_proxy_loss_parity(cloud):
    from point2cyl_tpu.train.steps import assemble_heads, proxy_losses

    x_raw, w_raw, batch = _composite_inputs(cloud)
    cfg = _composite_cfg()
    heads = assemble_heads(
        jnp.array(x_raw), jnp.array(w_raw), True, True, k=K
    )
    total, aux = proxy_losses(heads, batch, cfg)
    _, _, tout = _torch_composite(cloud, x_raw, w_raw)

    for key in ("total", "normal", "miou", "bb", "extrusion", "center"):
        np.testing.assert_allclose(
            float(aux[key] if key != "total" else total),
            float(tout[key].detach()),
            atol=1e-4,
            err_msg=key,
        )


def test_composite_proxy_loss_grad_parity(cloud):
    """The composed scalar's gradients w.r.t. BOTH raw heads match —
    pins the backward of the whole inline loss stack, including the
    sort-free base/barrel CE contraction (the 6.4x rewrite) and the
    eigensolver axis path."""
    from point2cyl_tpu.train.steps import assemble_heads, proxy_losses

    x_raw, w_raw, batch = _composite_inputs(cloud)
    cfg = _composite_cfg()

    def total_fn(xr, wr):
        heads = assemble_heads(xr, wr, True, True, k=K)
        return proxy_losses(heads, batch, cfg)[0]

    gx, gw = jax.grad(total_fn, argnums=(0, 1))(
        jnp.array(x_raw), jnp.array(w_raw)
    )

    xt, wt, tout = _torch_composite(cloud, x_raw, w_raw, requires_grad=True)
    tout["total"].backward()

    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw), wt.grad.numpy(), atol=2e-4
    )


def test_composite_igr_loss_parity():
    """Joint trainer's IGR block (manifold/eikonal/SALD/latent) as composed
    scalars with a shared implicit net, shared latents, and shared
    off-surface samples (train_Point2Cyl.py:608-672)."""
    from tests.reference_trainer import reference_igr_losses

    from point2cyl_tpu.core.torch_compat import export_implicit
    from point2cyl_tpu.losses.igr import igr_losses, latent_loss
    from point2cyl_tpu.models.implicit import ImplicitNet

    bI, kI, sI, lat_dim = 2, 3, 64, 16
    d_in = 2 + lat_dim
    rng = np.random.default_rng(5)
    net = ImplicitNet(d_in=d_in, hidden=(32,) * 7, skip_in=(4,))
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, d_in)))[
        "params"
    ]

    sk = rng.uniform(-1, 1, (bI, kI, sI, 2)).astype(np.float32)
    nrm = rng.standard_normal((bI, kI, sI, 2)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    def unit(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    lat = unit(rng.standard_normal((bI * kI, lat_dim)).astype(np.float32))
    lat_gt = unit(
        rng.standard_normal((bI * kI, lat_dim)).astype(np.float32)
    )
    off = rng.uniform(
        -1.8, 1.8, (bI * kI, sI + sI // 8, 2)
    ).astype(np.float32)
    mask = np.array([[True, True, False], [True, True, True]])

    def sdf_fn(x):
        return net.apply({"params": params}, x)

    out = igr_losses(
        sdf_fn, jax.random.PRNGKey(0), jnp.array(sk), jnp.array(nrm),
        jnp.array(lat.reshape(bI, kI, lat_dim)), jnp.array(mask),
        off_pts=jnp.array(off),
    )
    lat_angle = latent_loss(
        jnp.array(lat.reshape(bI, kI, lat_dim)),
        jnp.array(lat_gt.reshape(bI, kI, lat_dim)),
        jnp.array(mask),
        use_l2=False,
    )

    tnet = ref.igr_network.ImplicitNet(
        d_in=d_in, dims=[32] * 7, skip_in=(4,)
    )
    sd = {k: torch.tensor(v) for k, v in export_implicit(params).items()}
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not missing and not unexpected
    tout = reference_igr_losses(
        tnet, _t(lat), _t(lat_gt), _t(sk.reshape(bI * kI, sI, 2)),
        _t(nrm.reshape(bI * kI, sI, 2)), _t(off), _t(mask), is_l2=False,
    )

    np.testing.assert_allclose(
        float(out.manifold), float(tout["manifold"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.eikonal), float(tout["eikonal"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.normals), float(tout["sald"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(lat_angle), float(tout["latent"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.total + lat_angle),
        float(tout["im_total"].detach()),
        atol=2e-4,
    )


def test_composite_joint_loss_parity(cloud):
    """The joint trainer's FULL per-batch loss — proxy stack + Hungarian
    reorder + predicted-sketch projection/scale normalization + latent
    encoding + GT latents from the frozen encoder + IGR/SALD/latent
    block — composed into ONE scalar and A/B'd against the reference's
    inline stack (``train_Point2Cyl.py:405-713``, via
    ``tests.reference_trainer.reference_joint_losses``) with identical
    raw heads, identical net weights (torch_compat exports), pinned
    segment sampling, and shared off-surface samples."""
    from tests.reference_trainer import reference_joint_losses

    from point2cyl_tpu.core.torch_compat import (export_encoder,
                                                 export_implicit)
    from point2cyl_tpu.losses.igr import igr_losses, latent_loss
    from point2cyl_tpu.losses.segmentation import reorder_w
    from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder
    from point2cyl_tpu.ops.matching import (hungarian_matching,
                                            mask_gt_from_labels)
    from point2cyl_tpu.train.steps import assemble_heads, proxy_losses

    lat_dim = 16
    rng = np.random.default_rng(41)
    # All-live cloud (every sample uses all K slots): dead slots carry
    # DIFFERENT garbage in the two stacks (the repo zeros, the reference
    # -centroid constant rows) and train-mode BatchNorm folds every row
    # into the batch statistics, so dead-slot garbage perturbs even the
    # live latents — an inherent, documented divergence (PARITY.md).
    # The composite pin therefore runs on the no-dead-slot path.
    cloud = make_labeled_cloud(
        np.random.default_rng(7), B, N, K, min_instances=K
    )
    _, _, batch = _composite_inputs(cloud)
    cfg = _composite_cfg()
    # Near-GT heads (strong one-hot logits + noise) so the PREDICTED
    # labels keep every GT instance populated: found == mask_gt, asserted
    # below.
    seg_oh = np.eye(K, dtype=np.float32)[cloud["seg"]]  # (B, N, K)
    bb_oh = np.eye(2, dtype=np.float32)[cloud["bb"]]  # (B, N, 2)
    w_raw = 6.0 * (seg_oh[..., :, None] * bb_oh[..., None, :]).reshape(
        B, N, 2 * K
    ) + 0.5 * rng.standard_normal((B, N, 2 * K)).astype(np.float32)
    x_raw = (cloud["normals"] + 0.1 * rng.standard_normal(
        (B, N, 3)
    )).astype(np.float32)
    # GT sketches (already subsampled/normalized — the pipeline contract)
    sk_pts = rng.uniform(-1, 1, (B, K, S, 2)).astype(np.float32)
    sk_nrm = rng.standard_normal((B, K, S, 2)).astype(np.float32)
    sk_nrm /= np.linalg.norm(sk_nrm, axis=-1, keepdims=True)
    sketches = np.concatenate([sk_pts, sk_nrm], axis=-1)
    batch = dict(batch, sketches=jnp.array(sketches))
    off = rng.uniform(-1.8, 1.8, (B * K, S + S // 8, 2)).astype(np.float32)

    implicit = ImplicitNet(d_in=2 + lat_dim, hidden=(32,) * 7, skip_in=(4,))
    encoder = PointNetEncoder(lat_dim, 2, with_normals=True)
    loaded_encoder = PointNetEncoder(lat_dim, 2, with_normals=True)
    im_params = implicit.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 2 + lat_dim))
    )["params"]
    enc_vars = encoder.init(
        jax.random.PRNGKey(4), jnp.zeros((1, S, 4)), train=False
    )
    loaded_vars = loaded_encoder.init(
        jax.random.PRNGKey(5), jnp.zeros((1, S, 4)), train=False
    )

    # ---- JAX side: the joint loss_fn composition (train_joint.py
    # loss_fn) with key=None deterministic segment sampling ----
    i_gt = batch["extrusion_labels"]
    gt_bb = batch["base_barrel_labels"]
    pts = batch["point_cloud"]
    mask_gt = mask_gt_from_labels(i_gt, K)
    heads = assemble_heads(jnp.array(x_raw), jnp.array(w_raw), True, True,
                           k=K)
    proxy_total, aux = proxy_losses(heads, batch, cfg)
    matching, mask = hungarian_matching(heads.w, i_gt)
    w_reordered = reorder_w(heads.w, matching)
    w_reordered = jnp.where(mask[:, None, :], w_reordered, 0.0)
    proj_label = jnp.argmax(w_reordered, axis=-1)
    bb_probs = jnp.stack(
        [jnp.sum(heads.w_2k[:, :, ::2], -1),
         jnp.sum(heads.w_2k[:, :, 1::2], -1)], axis=-1,
    )
    proj_bb = jnp.argmax(bb_probs, axis=-1)
    # rotation_mode="reference" reproduces the reference's tgm rotation
    # defect bit-for-bit (the trainer default is the exact Rodrigues
    # variant, pinned separately by the projection parity tests)
    p2d, n2d, _, found_p = G.sketch_projection(
        None, pts, heads.normals, proj_label, proj_bb,
        batch["extrusion_axes"], batch["extrusion_centers"],
        num_samples=S, rotation_mode="reference",
    )
    # the near-GT heads must leave no GT instance unfound (else the
    # degenerate-slot divergence documented in PARITY.md kicks in and
    # the comparison below stops being meaningful)
    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(mask_gt))
    _, _, gt_scales, _ = G.sketch_projection(
        None, pts, batch["normals"], i_gt, gt_bb,
        batch["extrusion_axes"], batch["extrusion_centers"],
        num_samples=S, rotation_mode="reference",
    )
    p2d = p2d / gt_scales[..., None, None]
    enc_in = jnp.concatenate([p2d, n2d], axis=-1).reshape(B * K, S, 4)
    latents, _ = encoder.apply(
        enc_vars, enc_in, train=True, mutable=["batch_stats"]
    )
    latents = latents.reshape(B, K, lat_dim)
    gt_latents = loaded_encoder.apply(
        loaded_vars, jnp.array(sketches).reshape(B * K, S, 4), train=False
    ).reshape(B, K, lat_dim)

    def sdf_fn(x):
        return implicit.apply({"params": im_params}, x)

    igr = igr_losses(
        sdf_fn, jax.random.PRNGKey(0), jnp.array(sk_pts),
        jnp.array(sk_nrm), latents, mask_gt,
        eikonal_weight=cfg.weights.igr_eikonal,
        normals_weight=cfg.weights.igr_normal,
        off_pts=jnp.array(off),
    )
    lat_loss = latent_loss(latents, gt_latents, mask_gt, use_l2=False)
    im_total = igr.total + cfg.weights.sketch_latent * lat_loss
    total = proxy_total + im_total

    # ---- torch side: the reference inline stack with the same nets ----
    tnet = ref.igr_network.ImplicitNet(
        d_in=2 + lat_dim, dims=[32] * 7, skip_in=(4,)
    )
    sd = {k: torch.tensor(v) for k, v in export_implicit(im_params).items()}
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not missing and not unexpected

    def load_enc(variables):
        t = ref.igr_network.PointNetEncoder(
            lat_dim, input_channels=2, with_normals=True
        )
        sd = {k: torch.tensor(v) for k, v in export_encoder(
            variables["params"], variables["batch_stats"]
        ).items()}
        _, unexpected = t.load_state_dict(sd, strict=False)
        assert not unexpected
        return t

    tenc = load_enc(enc_vars)
    tenc.train()  # BN on batch stats, matching encoder.apply(train=True)
    tload = load_enc(loaded_vars)
    tload.eval()

    class _FixedSampler:
        def get_points(self, pc):
            return _t(off)

    with deterministic_torch_randint():
        tout = reference_joint_losses(
            _t(x_raw), _t(w_raw), _t(cloud["points"]),
            _t(cloud["normals"]), _t(cloud["seg"]), _t(cloud["bb"]),
            _t(cloud["axes"]), _t(cloud["centers"]), _t(sketches),
            tenc, tload, tnet, _FixedSampler(), S,
            is_l2=False, is_pc_train=True,
        )

    # The encoder INPUT (projection -> scale-normalize -> concat) is
    # pinned at f32 ulp; the encoder's train-mode BN is semantically
    # identical (test_pointnet_encoder_train_mode_parity_f64: 6e-8 in
    # f64) but in f32 the BN batch-variance reassociation noise flips
    # max-pool winners, amplifying latent (and latent-dependent scalar)
    # diffs to the 1e-2 scale — hence the split tolerances below.
    # Slots with mask_gt=False never enter any loss; both stacks fill
    # them with (different) garbage — zeros here, -centroid rows in the
    # reference — so the row comparisons are masked to the live slots.
    live = np.asarray(mask_gt).reshape(B * K)
    np.testing.assert_allclose(
        np.asarray(enc_in)[live], tout["enc_in"].detach().numpy()[live],
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(latents).reshape(B * K, lat_dim)[live],
        tout["latent_codes"].detach().numpy()[live], atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(gt_latents).reshape(B * K, lat_dim)[live],
        tout["latent_codes_gt"].detach().numpy()[live], atol=1e-4,
    )
    for key, mine, tol in (
        ("manifold", igr.manifold, 5e-2), ("eikonal", igr.eikonal, 5e-2),
        ("sald", igr.normals, 5e-2), ("latent", lat_loss, 5e-2),
        ("im_total", im_total, 1e-1), ("proxy_total", proxy_total, 1e-4),
        ("total", total, 1e-1),
    ):
        np.testing.assert_allclose(
            float(mine), float(tout[key].detach()), atol=tol,
            err_msg=key,
        )


# ---------------------------------------------------------------------------
# Eval oracle-substitution matrix parity (eval.py:348-405): all 8
# USE_GT_NORMALS x USE_GT_SEGMENTATION x USE_GT_BB combinations A/B'd
# branch-by-branch against an inline-torch replication through the
# reference's own library functions (VERDICT.md round-2 missing #3).
# ---------------------------------------------------------------------------


def _torch_axis_substitution(
    w_raw, x_pred, cloud, use_gt_normals, use_gt_seg, use_gt_bb
):
    """Inline replication of eval.py:348-405 (minus the two documented
    undefined-variable defects, which only affect the EA_W fed to the
    centers path in the full-prediction branch)."""
    losses = ref.losses
    du = ref.data_utils
    bsz, n, k2 = w_raw.shape
    k = k2 // 2
    w_2k = torch.softmax(_t(w_raw), dim=2)
    w_barrel = w_2k[:, :, ::2]
    w_base = w_2k[:, :, 1::2]
    w = w_barrel + w_base
    bb = torch.zeros(bsz, n, 2)
    for j in range(k):
        bb[:, :, 0] += w_2k[:, :, j * 2]
        bb[:, :, 1] += w_2k[:, :, j * 2 + 1]

    gt_inst = _t(cloud["seg"])
    gt_bb = _t(cloud["bb"])
    gt_normals = _t(cloud["normals"])
    gt_axes = _t(cloud["axes"])
    x = gt_normals if use_gt_normals else _t(x_pred)

    ea_w = None
    if use_gt_seg:
        one_hot = torch.nn.functional.one_hot(
            gt_inst.view(-1), num_classes=k
        ).view(bsz, n, k)
        ea_w = one_hot
        if use_gt_bb:
            labels = gt_bb.unsqueeze(-1).repeat(1, 1, k)
        else:
            labels = torch.argmax(bb, dim=-1).unsqueeze(-1).repeat(1, 1, k)
        wb = torch.where(labels == 0, one_hot.float(), torch.tensor([0.0]))
        wc = torch.where(labels == 1, one_hot.float(), torch.tensor([0.0]))
    elif use_gt_bb:
        w_hard = losses.hard_W_encoding(w, to_null_mask=True)
        matching, _ = losses.hungarian_matching(
            w_hard, gt_inst, with_mask=True
        )
        w_reordered = torch.gather(
            w_hard, 2, matching.unsqueeze(1).expand(bsz, n, k)
        )
        ea_w = w_reordered
        labels = gt_bb.unsqueeze(-1).repeat(1, 1, k)
        wb = torch.where(
            labels == 0, w_reordered.float(), torch.tensor([0.0])
        )
        wc = torch.where(
            labels == 1, w_reordered.float(), torch.tensor([0.0])
        )
    else:
        w_hard = losses.hard_W_encoding(w, to_null_mask=True)
        matching, _ = losses.hungarian_matching(
            w_hard, gt_inst, with_mask=True
        )
        wb = torch.gather(
            w_barrel, 2, matching.unsqueeze(1).expand(bsz, n, k)
        )
        wc = torch.gather(
            w_base, 2, matching.unsqueeze(1).expand(bsz, n, k)
        )
        # reference defect: EA_W = W_reordered (undefined here) — skipped

    e_ax = du.estimate_extrusion_axis(
        x, wb, wc, gt_bb, gt_inst, normalize=False
    )
    diff = losses.compute_normal_difference(
        e_ax, gt_axes, in_radians=False, collapse=False
    )
    mask_gt = losses.get_mask_gt(gt_inst, k)
    err = losses.reduce_mean_masked_instance(diff, mask_gt)
    return wb, wc, ea_w, err


@pytest.mark.parametrize("use_gt_normals", [False, True])
@pytest.mark.parametrize(
    "use_gt_seg,use_gt_bb",
    [(False, False), (False, True), (True, False), (True, True)],
)
def test_eval_substitution_matrix_parity(
    cloud, use_gt_normals, use_gt_seg, use_gt_bb
):
    from point2cyl_tpu.core.config import EvalConfig
    from point2cyl_tpu.eval.metrics import (
        axis_estimation_weights,
        axis_metrics,
        segmentation_metrics,
    )

    rng = np.random.default_rng(17)
    w_raw = (2.0 * rng.standard_normal((B, N, 2 * K))).astype(np.float32)
    x_pred = rng.standard_normal((B, N, 3)).astype(np.float32)
    x_pred /= np.linalg.norm(x_pred, axis=-1, keepdims=True)

    cfg = EvalConfig(
        use_gt_normals=use_gt_normals,
        use_gt_segmentation=use_gt_seg,
        use_gt_bb=use_gt_bb,
    )
    w_2k = jax.nn.softmax(jnp.array(w_raw), axis=-1)
    w_barrel = w_2k[:, :, ::2]
    w_base = w_2k[:, :, 1::2]
    w = w_barrel + w_base
    i_gt = jnp.array(cloud["seg"].astype(np.int32))
    gt_bb = jnp.array(cloud["bb"].astype(np.int32))
    seg = segmentation_metrics(w, i_gt)
    wb, wc, ea_w = axis_estimation_weights(
        cfg, seg, w, w_barrel, w_base, w_2k, i_gt, gt_bb
    )
    err, _ = axis_metrics(
        cfg, jnp.array(x_pred), jnp.array(cloud["normals"]), wb, wc,
        i_gt, gt_bb, jnp.array(cloud["axes"]),
    )

    twb, twc, tea_w, terr = _torch_axis_substitution(
        w_raw, x_pred, cloud, use_gt_normals, use_gt_seg, use_gt_bb
    )
    np.testing.assert_allclose(
        np.asarray(wb), twb.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(wc), twc.numpy(), atol=1e-5
    )
    if tea_w is not None:
        np.testing.assert_allclose(
            np.asarray(ea_w), tea_w.float().numpy(), atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(err), terr.numpy(), atol=2e-3
    )
