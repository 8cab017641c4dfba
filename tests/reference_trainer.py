"""Verbatim-BEHAVIOR torch replications of the reference trainers' inline
loss blocks, driven through the mounted reference's own library functions
(``tests.reference_oracle``).

Two consumers:
- ``test_reference_parity.py``: composite one-step loss parity — the
  repo's ``proxy_losses`` / joint IGR block A/B'd as composed scalars
  against these functions with shared weights and a fixed batch
  (VERDICT.md round-2 missing #2).
- ``tools/reference_cpu_trainer.py``: the CPU-torch reference trainer for
  the trained-accuracy A/B (VERDICT.md round-2 missing #1).

``reference_proxy_losses`` replicates
``train_Point2Cyl_without_sketch.py:244-353`` line-for-line in behavior
(head assembly, compute_all_losses, the BB-CE sort/gather block, the
axis block, the center block). ``reference_igr_losses`` replicates
``train_Point2Cyl.py:608-672`` (manifold / eikonal / SALD / latent) given
precomputed latents and off-surface samples so randomness can be shared
with the jax side.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

try:
    from tests.reference_oracle import ref
except ImportError:  # direct-script use (tools/reference_cpu_trainer.py)
    from reference_oracle import ref


def reference_proxy_losses(
    X_raw: torch.Tensor,
    W_raw: torch.Tensor,
    pcs: torch.Tensor,
    gt_normals: torch.Tensor,
    gt_extrusion_instances: torch.Tensor,
    gt_bb_labels: torch.Tensor,
    gt_extrusion_axes: torch.Tensor,
    gt_extrusion_centers: torch.Tensor,
    normal_mult: float = 1.0,
    miou_mult: float = 1.0,
    bb_mult: float = 1.0,
    ext_mult: float = 1.0,
    center_mult: float = 1.0,
    norm_eig: bool = False,
    return_matching: bool = False,
) -> dict:
    """The without-sketch trainer's inline loss stack on raw head outputs.

    Args mirror the reference loop's tensors: X_raw/W_raw are the
    backbone's two heads BEFORE normalization/softmax ((B, N, 3) and
    (B, N, 2K)); labels are int64; K is inferred from gt_extrusion_axes.
    Returns torch scalars keyed like the repo's aux dict.
    """
    losses = ref.losses
    du = ref.data_utils
    batch_size, num_point, _ = pcs.shape
    k = gt_extrusion_axes.shape[1]

    # train_Point2Cyl_without_sketch.py:246-275 head assembly
    x = F.normalize(X_raw, p=2, dim=2, eps=1e-12)
    w_2k = torch.softmax(W_raw, dim=2)
    w_barrel = w_2k[:, :, ::2]
    w_barrel_bb = W_raw[:, :, ::2]
    w_base = w_2k[:, :, 1::2]
    w_base_bb = W_raw[:, :, 1::2]
    w = w_barrel + w_base

    # :280 segmentation + normal losses
    (
        total_loss,
        total_normal_loss,
        total_miou_loss,
        matching_indices,
        mask,
    ) = losses.compute_all_losses(
        pcs,
        w,
        gt_extrusion_instances,
        x,
        gt_normals,
        normal_mult,
        miou_mult,
        return_match_indices=True,
    )

    # :283-314 base/barrel CE block (the sort + per-row gathers the repo
    # rewrote as a sort-free one-hot contraction)
    w_reordered = torch.gather(
        w, 2,
        matching_indices.unsqueeze(1).expand(batch_size, num_point, k),
    )
    maskf = mask.float()
    w_reordered = torch.where(
        maskf.unsqueeze(1).expand(batch_size, num_point, k) == 1,
        w_reordered,
        torch.zeros_like(w_reordered),
    )
    w_reordered = torch.softmax(w_reordered, dim=-1)
    w_sorted, label = torch.sort(w_reordered, dim=-1)
    segment_barrel_confidence = torch.gather(w_barrel_bb, 2, label)
    segment_base_confidence = torch.gather(w_base_bb, 2, label)
    bb_segment = torch.cat(
        (
            segment_barrel_confidence.unsqueeze(-1),
            segment_base_confidence.unsqueeze(-1),
        ),
        dim=-1,
    )
    gt_bb_labels_ = gt_bb_labels.unsqueeze(-1).repeat(1, 1, k)
    total_bb_loss = F.cross_entropy(
        bb_segment.contiguous().view(batch_size * num_point * k, -1),
        gt_bb_labels_.view(batch_size * num_point * k),
        reduction="none",
    ).view(batch_size, num_point, k)
    total_bb_loss = torch.sum(total_bb_loss * w_sorted, dim=-1)
    total_bb_loss = torch.mean(torch.mean(total_bb_loss, dim=-1))
    total_bb_loss = torch.mean(total_bb_loss)
    total_loss = total_loss + bb_mult * total_bb_loss

    mask_gt = losses.get_mask_gt(gt_extrusion_instances, k)

    # :319-340 extrusion-axis block
    w_barrel_reordered = torch.gather(
        w_barrel, 2,
        matching_indices.unsqueeze(1).expand(batch_size, num_point, k),
    )
    w_base_reordered = torch.gather(
        w_base, 2,
        matching_indices.unsqueeze(1).expand(batch_size, num_point, k),
    )
    e_ax = du.estimate_extrusion_axis(
        x,
        w_barrel_reordered,
        w_base_reordered,
        gt_bb_labels,
        gt_extrusion_instances,
        normalize=norm_eig,
    )
    extrusion_loss = losses.compute_normal_loss(
        e_ax, gt_extrusion_axes, angle_diff=False, collapse=False
    )
    avg_extrusion_loss = losses.reduce_mean_masked_instance(
        extrusion_loss, mask_gt
    )
    total_extrusion_loss = torch.mean(avg_extrusion_loss) * ext_mult
    total_loss = total_loss + total_extrusion_loss

    # :342-353 center block
    w_reordered_c = torch.gather(
        w, 2,
        matching_indices.unsqueeze(1).expand(batch_size, num_point, k),
    )
    predicted_centroids = du.estimate_extrusion_centers(w_reordered_c, pcs)
    centroid_diff = torch.square(
        predicted_centroids - gt_extrusion_centers
    ).sum(dim=-1)
    avg_center_loss = losses.reduce_mean_masked_instance(
        centroid_diff, mask_gt
    )
    total_center_loss = torch.mean(avg_center_loss) * center_mult
    total_loss = total_loss + total_center_loss

    out = {
        "total": total_loss,
        "normal": total_normal_loss,
        "miou": total_miou_loss,
        "bb": total_bb_loss,
        # the reference logs ext/center WITH their multipliers folded in
        # (train_*:355-360); report the bare means like the repo's aux
        "extrusion": torch.mean(avg_extrusion_loss),
        "center": torch.mean(avg_center_loss),
    }
    if return_matching:
        # the joint trainer's latent block reuses the Hungarian result
        # and the normalized heads (train_Point2Cyl.py:518-559)
        out["matching_indices"] = matching_indices
        out["mask"] = mask
        out["x"] = x
        out["w"] = w
        out["w_2k"] = w_2k
        out["mask_gt"] = mask_gt
    return out


def reference_joint_losses(
    x_raw: torch.Tensor,
    w_raw: torch.Tensor,
    pcs: torch.Tensor,
    gt_normals: torch.Tensor,
    gt_extrusion_instances: torch.Tensor,
    gt_bb_labels: torch.Tensor,
    gt_extrusion_axes: torch.Tensor,
    gt_extrusion_centers: torch.Tensor,
    gt_sketches: torch.Tensor,
    pn_encoder,
    loaded_pn_encoder,
    implicit_net,
    sampler,
    num_sk_point: int,
    is_l2: bool = False,
    is_pc_train: bool = True,
) -> dict:
    """The joint trainer's full per-batch loss (``train_Point2Cyl.py:
    405-713``): proxy stack + predicted-sketch latent encoding (the
    non-USE_WHOLE_PC, non-USE_GT_IM branch, ``:518-559``) + GT latents
    from the frozen encoder (``:602-605``) + IGR/latent losses
    (``:608-672``). ``gt_sketches`` is (B, K, S_sk, 4), already
    subsampled to ``num_sk_point``."""
    du = ref.data_utils
    b, n, _ = pcs.shape
    k = gt_extrusion_axes.shape[1]

    proxy = reference_proxy_losses(
        x_raw, w_raw, pcs, gt_normals, gt_extrusion_instances,
        gt_bb_labels, gt_extrusion_axes, gt_extrusion_centers,
        return_matching=True,
    )

    # ---- latent code from the predicted sketch (:518-559) ----
    w_reordered = torch.gather(
        proxy["w"], 2,
        proxy["matching_indices"].unsqueeze(1).expand(b, n, k),
    )
    w_reordered = torch.where(
        proxy["mask"].float().unsqueeze(1).expand(b, n, k) == 1,
        w_reordered,
        torch.zeros_like(w_reordered),
    )
    label = torch.argmax(w_reordered, dim=-1)
    bb = torch.zeros(b, n, 2)
    for j in range(k):
        bb[:, :, 0] += proxy["w_2k"][:, :, j * 2]
        bb[:, :, 1] += proxy["w_2k"][:, :, j * 2 + 1]
    pred_bb_label = torch.argmax(bb, dim=-1)

    pred_pc, pred_nrm, _ = du.sketch_implicit_projection(
        pcs, proxy["x"], label, pred_bb_label, gt_extrusion_axes,
        gt_extrusion_centers, num_points_to_sample=num_sk_point,
    )
    _, _, gt_scales = du.sketch_implicit_projection(
        pcs, gt_normals, gt_extrusion_instances, gt_bb_labels,
        gt_extrusion_axes, gt_extrusion_centers,
        num_points_to_sample=num_sk_point,
    )
    gt_scales_e = gt_scales.unsqueeze(-1).unsqueeze(-1).repeat(
        1, 1, pred_pc.shape[-2], pred_pc.shape[-1]
    )
    pred_pc = pred_pc / gt_scales_e
    # LAYOUT: sketch_implicit_projection returns (K, B, S, 2), and the
    # reference reshapes it STRAIGHT to (B*K, S, 2)
    # (train_Point2Cyl.py:555-556) — K-major rows — while the GT latents
    # flatten gt_sketches (B, K, S, 4) B-major (:602-603). At B>1 the
    # latent/SALD losses therefore pair prediction row (k, b) with GT row
    # (b, k): a reference indexing defect (PARITY.md list). The repo's
    # joint trainer pairs B-major on both sides; this oracle applies the
    # same correction (permute before reshape) so the A/B pins the
    # reference's evident intent, not the defect.
    pred_pc = pred_pc.permute(1, 0, 2, 3).reshape(b * k, num_sk_point, 2)
    pred_nrm = pred_nrm.permute(1, 0, 2, 3).reshape(b * k, num_sk_point, 2)
    latent_codes = pn_encoder(torch.cat((pred_pc, pred_nrm), dim=-1))

    # ---- GT latents from the frozen encoder (:602-605) ----
    sk_pnts = gt_sketches[:, :, :, :2].reshape(b * k, num_sk_point, 2)
    sk_normals = gt_sketches[:, :, :, -2:].reshape(b * k, num_sk_point, 2)
    with torch.no_grad():
        latent_codes_gt = loaded_pn_encoder(
            torch.cat((sk_pnts, sk_normals), dim=-1)
        )

    # ---- IGR + latent losses (:608-672) ----
    nonmnfld = sampler.get_points(sk_pnts)
    igr = reference_igr_losses(
        implicit_net, latent_codes, latent_codes_gt, sk_pnts, sk_normals,
        nonmnfld, proxy["mask_gt"], is_l2=is_l2,
    )
    total = (
        proxy["total"] + igr["im_total"] if is_pc_train
        else igr["im_total"]
    )
    out = {
        kk: v for kk, v in proxy.items()
        if isinstance(v, torch.Tensor) and v.dim() == 0
    }
    out.update(igr)
    out["proxy_total"] = proxy["total"]
    out["total"] = total
    # intermediates for parity tests (enc_in: the encoder's input rows)
    out["enc_in"] = torch.cat((pred_pc, pred_nrm), dim=-1)
    out["latent_codes"] = latent_codes
    out["latent_codes_gt"] = latent_codes_gt
    return out


def _gradient(inputs: torch.Tensor, outputs: torch.Tensor) -> torch.Tensor:
    """IGR spatial gradient (``IGR/network.py:8-17`` semantics)."""
    d_points = torch.ones_like(outputs, requires_grad=False)
    return torch.autograd.grad(
        outputs=outputs,
        inputs=inputs,
        grad_outputs=d_points,
        create_graph=True,
        retain_graph=True,
        only_inputs=True,
    )[0][..., -2:]


def reference_igr_losses(
    implicit_net,
    latent_codes: torch.Tensor,
    latent_codes_gt: torch.Tensor,
    sk_pnts: torch.Tensor,
    sk_normals: torch.Tensor,
    nonmnfld_pnts: torch.Tensor,
    mask_gt: torch.Tensor,
    is_l2: bool = False,
) -> dict:
    """``train_Point2Cyl.py:608-672``: manifold/eikonal/SALD + latent.

    Args: latent_codes/latent_codes_gt (B*K, L); sk_pnts/sk_normals
    (B*K, S, 2); nonmnfld_pnts (B*K, S', 2) precomputed off-surface
    samples (the reference draws them via ``sampler.get_points``; parity
    tests pass the same array to both sides); mask_gt (B, K).
    """
    losses = ref.losses
    bk, s, _ = sk_pnts.shape
    b, k = mask_gt.shape
    assert bk == b * k

    def add_latent(points, latents):
        # IGR/network.py add_latent: broadcast latent onto each point
        lat = latents.unsqueeze(1).repeat(1, points.shape[1], 1)
        return torch.cat([lat, points], dim=-1)

    sk_in = add_latent(sk_pnts, latent_codes)
    non_in = add_latent(nonmnfld_pnts, latent_codes)
    sk_in.requires_grad_()
    non_in.requires_grad_()

    sk_pred = implicit_net(sk_in)
    nonmnfld_pred = implicit_net(non_in)
    mnfld_grad = _gradient(sk_in, sk_pred)
    nonmnfld_grad = _gradient(non_in, nonmnfld_pred)

    sk_pred = sk_pred.reshape(b, k, -1, 1)
    nonmnfld_grad = nonmnfld_grad.reshape(b, k, -1, 2)
    mnfld_grad = mnfld_grad.reshape(b, k, -1, 2)
    sk_normals_r = sk_normals.reshape(b, k, -1, 2)

    mnfld_loss = sk_pred.abs().mean(dim=-1).mean(dim=-1)
    mnfld_loss = losses.reduce_mean_masked_instance(
        mnfld_loss, mask_gt
    ).mean()

    grad_loss = ((nonmnfld_grad.norm(2, dim=-1) - 1) ** 2).mean(dim=-1)
    grad_loss = losses.reduce_mean_masked_instance(grad_loss, mask_gt).mean()

    norm_sub = (mnfld_grad - sk_normals_r).norm(2, dim=-1)
    norm_add = (mnfld_grad + sk_normals_r).norm(2, dim=-1)
    values = torch.cat(
        (norm_sub.unsqueeze(-1), norm_add.unsqueeze(-1)), dim=-1
    )
    normals_loss = torch.min(values, dim=-1)[0].mean(dim=-1)
    normals_loss = losses.reduce_mean_masked_instance(
        normals_loss, mask_gt
    ).mean()

    im_loss = mnfld_loss + 0.1 * grad_loss + 1.0 * normals_loss

    lat = latent_codes.reshape(b, k, -1)
    lat_gt = latent_codes_gt.reshape(b, k, -1)
    if is_l2:
        latent_loss = torch.square(lat - lat_gt).sum(dim=-1)
    else:
        latent_loss = 1.0 - torch.sum(lat * lat_gt, dim=-1)
    latent_loss = losses.reduce_mean_masked_instance(
        latent_loss, mask_gt
    ).mean()
    im_loss = im_loss + latent_loss

    return {
        "im_total": im_loss,
        "manifold": mnfld_loss,
        "eikonal": grad_loss,
        "sald": normals_loss,
        "latent": latent_loss,
    }
