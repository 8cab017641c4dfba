"""Configuration dataclasses for the whole framework.

Replaces the reference's per-driver argparse flag soup
(``train_Point2Cyl_without_sketch.py:28-61``, ``train_Point2Cyl.py:33-88``,
``eval.py:36-75``, ``visualizer.py:49-111``) and ``global_variables.py``
constants with typed configs consumed by every entry point. A CLI shim in
``point2cyl_tpu.core.cli`` preserves the reference flag names.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

# Tolerance below which an angle/quantity is treated as zero
# (reference: global_variables.py:15, g_zero_tol = 1e-6).
ZERO_TOL = 1e-6

# Extrusion CSG operation codes (reference: global_variables.py:19-22).
EXTRUSION_OPERATIONS = {
    "NewBodyFeatureOperation": 0,
    "JoinFeatureOperation": 0,
    "CutFeatureOperation": 1,
    "IntersectFeatureOperation": 2,
}


def add_platform_arg(p) -> None:
    """Add the shared ``--platform`` flag (TPU-framework extension).

    Lets any entry point force a JAX platform — e.g. ``--platform cpu``
    to run evals/training without a TPU, or when the remote-TPU tunnel
    is unavailable. ``None`` keeps the environment's default backend.
    """
    p.add_argument(
        "--platform", choices=("cpu", "tpu", "axon"), default=None,
        help="force the JAX platform (e.g. 'cpu' to run without a TPU); "
        "default: the environment's backend",
    )


def apply_platform(platform: Optional[str]) -> None:
    """Apply ``--platform`` before first backend use.

    Must run before any JAX computation: setting ``jax_platforms`` after
    backend initialization has no effect (and the environment variable
    is consumed too early to override from a console script).
    """
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """PointNet++ backbone hyperparameters.

    Defaults match the reference channel plan
    (``models/pointnet_extrusion.py:21-34``): three set-abstraction stages
    (512/0.2/64 -> [64,64,128]; 128/0.4/64 -> [128,128,256];
    group-all -> [256,512,1024]), three feature-propagation stages, a shared
    128-wide FC stage with dropout 0.5, and one head per output size.
    """

    num_points: int = 8192
    sa_npoints: Sequence[int] = (512, 128)
    sa_radii: Sequence[float] = (0.2, 0.4)
    sa_nsamples: Sequence[int] = (64, 64)
    sa_mlps: Sequence[Sequence[int]] = ((64, 64, 128), (128, 128, 256))
    sa_global_mlp: Sequence[int] = (256, 512, 1024)
    fp_mlps: Sequence[Sequence[int]] = ((256, 256), (256, 128), (128, 128, 128))
    fc_width: int = 128
    dropout_rate: float = 0.5
    # Output head sizes; assembled by drivers. [3, 2K] for the standard
    # normals + joint seg/base-barrel heads
    # (reference: train_Point2Cyl_without_sketch.py:183-197).
    output_sizes: Sequence[int] = (3, 16)
    # Compute dtype for the MLP stacks (params stay float32).
    compute_dtype: str = "float32"
    # Approximate neighbor selection (lax.approx_max_k) in ball query and
    # 3-NN interpolation — ~14x faster than exact top_k on TPU and
    # statistically equivalent to the reference (see ops/grouping.py).
    approx_neighbors: bool = True
    # 3-NN interpolation backend: "auto" uses the fused Pallas kernel on
    # TPU (exact, no HBM distance matrix) and XLA elsewhere;
    # "xla" / "pallas" force a path.
    knn_impl: str = "auto"
    # FPS backend: "auto" uses the Pallas VMEM-resident kernel on TPU
    # (bit-identical to the XLA path, ~3x faster); "xla" / "pallas" force.
    fps_impl: str = "auto"
    # Ball-query backend: "auto" uses the fused Pallas kernel on TPU
    # (diversity-preserving block selection, no O(S*N) HBM traffic — see
    # ops/pallas_ballquery.py) and XLA elsewhere; "xla" / "pallas" force.
    ballquery_impl: str = "auto"
    # Blocked-path candidate oversampling factor (0 = kernel default, 4).
    # ncand = ceil(oversample * nsample / nblocks) candidates are kept per
    # 128-point block; at SA1 production density the default's per-block
    # clipping picks a different (still in-radius, distributionally
    # near-uniform) neighbor subset than the reference's
    # first-nsample-by-index for ~88% of queries (round-5 measurement).
    # Raise to trade kernel time for selection fidelity.
    bq_oversample: int = 0


@dataclasses.dataclass(frozen=True)
class ImplicitNetConfig:
    """IGR-style implicit SDF network (reference: IGR/network.py:20-92)."""

    d_in: int = 258  # 2D point + 256-dim latent
    hidden: Sequence[int] = (512,) * 8
    skip_in: Sequence[int] = (4,)
    geometric_init: bool = True
    radius_init: float = 1.0
    beta: float = 100.0


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """2D PointNet sketch encoder (reference: IGR/network.py:132-174)."""

    embedding_size: int = 256
    input_channels: int = 2
    with_normals: bool = True


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss multipliers (reference: train_Point2Cyl_without_sketch.py:53-57,
    107-130 — a disabled head zeroes its multiplier)."""

    seg: float = 1.0
    normal: float = 1.0
    base_barrel: float = 1.0
    extrusion_axis: float = 1.0
    center: float = 1.0
    # Joint (sketch) trainer extras (reference: train_Point2Cyl.py:60-68).
    sketch_latent: float = 1.0
    igr_manifold: float = 1.0
    igr_eikonal: float = 0.1
    igr_normal: float = 1.0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    h5_path: str = "data/train.h5"
    num_points: int = 8192
    num_sketch_points: int = 2048
    max_instances: int = 8  # K
    with_op: bool = False
    with_center: bool = True
    with_extent: bool = False
    with_scale: bool = False
    # Keep the full dataset resident in device HBM when it fits.
    device_resident: bool = True
    # If set, generate a synthetic extrusion-solid dataset of this many
    # samples instead of reading h5 (for tests/benchmarks without data).
    synthetic_num_samples: Optional[int] = None
    synthetic_resolution: int = 8192  # pre-subsampling cloud resolution
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer hyperparameters.

    LR/BN staircase schedules mirror
    ``train_Point2Cyl_without_sketch.py:142-164``: lr = lr0 * 0.7^floor(step*bs
    / 200k), bn_momentum = max(0.5 * 0.5^floor(step*bs / 200k), 0.01).
    """

    batch_size: int = 4
    num_epochs: int = 300
    learning_rate: float = 1e-3
    decay_step: int = 200_000
    decay_rate: float = 0.7
    bn_decay_step: int = 200_000
    bn_init_momentum: float = 0.5
    bn_decay_rate: float = 0.5
    bn_momentum_clip: float = 0.99  # momentum >= 1 - clip
    add_noise: bool = False
    noise_sigma: float = 0.01
    pred_seg: bool = True
    pred_normal: bool = True
    pred_bb: bool = True
    pred_extrusion: bool = True
    pred_center: bool = True
    norm_eig: bool = False
    weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    logdir: str = "runs/point2cyl_tpu"
    checkpoint_every_epochs: int = 10
    best_after_epoch: int = 20
    seed: int = 0
    # Mesh axis sizes; data parallelism by default. None = all local devices
    # on the data axis.
    data_parallel: Optional[int] = None
    compute_dtype: str = "float32"
    # Neighbor-op backends forwarded to BackboneConfig ("auto" = fused
    # Pallas kernels on TPU, XLA elsewhere).
    ballquery_impl: str = "auto"
    # Blocked-path candidate oversampling (0 = kernel default; see
    # BackboneConfig.bq_oversample).
    bq_oversample: int = 0
    # Restore the full TrainState from <logdir>/model and continue (the
    # reference has no resume path at all and loses up to 10 epochs on a
    # crash, SURVEY.md section 5).
    resume: bool = False


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluator oracle-substitution flags (reference: eval.py:53-69 uses
    store_false so pred_* default ON)."""

    pred_seg: bool = True
    pred_normal: bool = True
    pred_bb: bool = True
    use_gt_normals: bool = False
    use_gt_segmentation: bool = False
    use_gt_bb: bool = False
    use_gt_sketch: bool = False
    use_gt_im: bool = False
    use_whole_pc: bool = False
    use_extrusion_axis_feat: bool = False
    num_sketch_samples: int = 2048
    norm_eig: bool = False
    # Perturb input points along their normals before the forward pass
    # (reference eval.py:239-240).
    add_noise: bool = False
    noise_sigma: float = 0.01
