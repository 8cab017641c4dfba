"""Serving subsystem: .p2cx export/load roundtrip + bucketed session.

The artifact must reproduce the live jitted model bit-for-bit at equal
batch shape (same platform, same XLA program — only the calling path
differs), survive
serialize/deserialize through a file, and the session must hide bucket
padding/chunking from the caller. The reference has no serving path
(eval.py re-traces in-process); this subsystem is TPU-framework-native
functionality.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.serve import (InferenceSession, export_artifact,
                                 load_artifact)
from point2cyl_tpu.serve.export import restore_backbone_from_logdir
from point2cyl_tpu.train.steps import assemble_heads

RNG = np.random.default_rng(11)

K = 8
CFG = BackboneConfig(
    num_points=256,
    sa_npoints=(64, 16),
    sa_radii=(0.2, 0.4),
    sa_nsamples=(16, 16),
    sa_mlps=((16, 32), (32, 64)),
    sa_global_mlp=(64, 128),
    fp_mlps=((64,), (32,), (32, 32)),
    fc_width=32,
    output_sizes=(3, 2 * K),
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = Backbone(CFG)
    pts0 = jnp.zeros((1, CFG.num_points, 3))
    key = jax.random.key(0)
    b_vars = model.init(
        {"params": key, "sample": key, "dropout": key}, pts0, train=False
    )
    path = str(tmp_path_factory.mktemp("serve") / "model.p2cx")
    meta = export_artifact(
        path, b_vars, k=K, backbone_config=CFG, buckets=(1, 2)
    )
    return path, meta, model, b_vars


def test_export_writes_selfcontained_artifact(artifact):
    path, meta, _, _ = artifact
    assert os.path.getsize(path) > 0
    assert meta["buckets"] == [1, 2]
    assert meta["num_points"] == CFG.num_points
    art = load_artifact(path)
    assert art.buckets == [1, 2]
    assert art.meta["k"] == K
    # weights stored as plain nested numpy dict
    leaves = jax.tree.leaves(art.weights)
    assert leaves and all(isinstance(x, np.ndarray) for x in leaves)


def _jit_apply(model):
    return jax.jit(
        lambda v, p: model.apply(v, p, train=False)
    )


def test_session_matches_jitted_apply_bitwise(artifact):
    # Same platform + same batch shape: the deserialized program must be
    # the SAME XLA program as the live jitted forward — bit-for-bit.
    # (Eager apply differs at ~1e-7 from fusion-order, hence jit here.)
    path, _, model, b_vars = artifact
    sess = InferenceSession(path)
    pts = RNG.normal(size=(2, CFG.num_points, 3)).astype(np.float32)
    got = sess.predict(pts, assemble=False)
    x_raw, w_raw = _jit_apply(model)(b_vars, jnp.asarray(pts))
    np.testing.assert_array_equal(got["x_raw"], np.asarray(x_raw))
    np.testing.assert_array_equal(got["w_raw"], np.asarray(w_raw))


def test_session_pads_and_chunks_odd_batches(artifact):
    path, _, model, b_vars = artifact
    sess = InferenceSession(path)
    # n=3 with buckets [1, 2] chunks as 2 + 1 with no padding rows
    pts = RNG.normal(size=(3, CFG.num_points, 3)).astype(np.float32)
    got = sess.predict(pts, assemble=False)
    # chunks run at different static batch shapes (2 then 1); different
    # shape-specialized programs agree to float noise, not bitwise
    x_raw, w_raw = _jit_apply(model)(b_vars, jnp.asarray(pts))
    np.testing.assert_allclose(got["x_raw"], np.asarray(x_raw),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["w_raw"], np.asarray(w_raw),
                               rtol=1e-5, atol=1e-6)
    assert sess.stats["clouds"] == 3


def test_session_padding_rows_do_not_perturb_real_rows(tmp_path):
    """Export with a single bucket of 4 and serve n=1: three zero-pad
    rows ride along; the real row must equal the unpadded forward."""
    model = Backbone(CFG)
    key = jax.random.key(1)
    b_vars = model.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, CFG.num_points, 3)), train=False,
    )
    path = str(tmp_path / "b4.p2cx")
    export_artifact(path, b_vars, k=K, backbone_config=CFG, buckets=(4,))
    sess = InferenceSession(path)
    pts = RNG.normal(size=(1, CFG.num_points, 3)).astype(np.float32)
    got = sess.predict(pts, assemble=False)
    assert got["x_raw"].shape[0] == 1
    assert sess.stats["padded"] == 3
    # bitwise vs the b=4 program on the identically padded input: the
    # session must return exactly row 0 of the bucket program's output
    padded = np.concatenate(
        [pts, np.zeros((3, CFG.num_points, 3), np.float32)], axis=0)
    x4, _ = _jit_apply(model)(b_vars, jnp.asarray(padded))
    np.testing.assert_array_equal(got["x_raw"], np.asarray(x4)[:1])
    # and the zero-pad rows must not couple into the real row beyond
    # shape-specialization float noise vs the unpadded b=1 program
    x1, _ = _jit_apply(model)(b_vars, jnp.asarray(pts))
    np.testing.assert_allclose(got["x_raw"], np.asarray(x1),
                               rtol=1e-5, atol=1e-6)


def test_session_assembles_heads_like_trainers(artifact):
    path, _, model, b_vars = artifact
    sess = InferenceSession(path)
    pts = RNG.normal(size=(2, CFG.num_points, 3)).astype(np.float32)
    got = sess.predict(pts)  # assembled
    x_raw, w_raw = _jit_apply(model)(b_vars, jnp.asarray(pts))
    heads = assemble_heads(x_raw, w_raw, True, True, k=K)
    np.testing.assert_allclose(got["normals"], np.asarray(heads.normals),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got["w"], np.asarray(heads.w),
                               rtol=1e-6, atol=1e-7)
    assert got["w_barrel"].shape == (2, CFG.num_points, K)
    # single-cloud convenience: 2D input -> unbatched outputs
    one = sess.predict(pts[0])
    assert one["normals"].shape == (CFG.num_points, 3)


def test_restore_from_missing_logdir_reports_fresh(tmp_path):
    # num_points=512 is the smallest N the default stage geometry
    # (sa_npoints 512/128) supports — FPS degenerates to identity there.
    b_vars, restored = restore_backbone_from_logdir(
        str(tmp_path / "nope"), num_points=512, k=K
    )
    assert not restored
    assert jax.tree.leaves(b_vars)


def test_export_cli_has_platform_flag():
    from point2cyl_tpu.serve.export import build_argparser

    actions = build_argparser()._actions
    assert any("--platform" in a.option_strings for a in actions)


SK = 64  # sketch samples for decomposition tests


@pytest.fixture(scope="module")
def decomp_artifact(tmp_path_factory):
    from point2cyl_tpu.models.implicit import PointNetEncoder

    model = Backbone(CFG)
    pts0 = jnp.zeros((1, CFG.num_points, 3))
    key = jax.random.key(7)
    b_vars = model.init(
        {"params": key, "sample": key, "dropout": key}, pts0, train=False
    )
    encoder = PointNetEncoder(32, 2, with_normals=True)
    enc_vars = encoder.init(key, jnp.zeros((1, SK, 4)), train=False)
    path = str(tmp_path_factory.mktemp("serve") / "decomp.p2cx")
    meta = export_artifact(
        path, b_vars, k=K, backbone_config=CFG, buckets=(2,),
        num_sk_points=SK, enc_vars=enc_vars, encoder_latent=32,
    )
    return path, meta, model, b_vars, encoder, enc_vars


def _oracle_decomposition(model, b_vars, encoder, enc_vars, pts):
    """Independent eval-path computation of the decomposition outputs
    (the same library ops the evaluator composes, eval.py:348-543)."""
    from point2cyl_tpu.eval.metrics import (base_barrel_probs,
                                             hard_segment_centers)
    from point2cyl_tpu.ops.geometry import (extrusion_extents,
                                             sketch_projection)
    from point2cyl_tpu.ops.linalg import estimate_extrusion_axis
    from point2cyl_tpu.ops.matching import hard_w_encoding

    @jax.jit
    def run(b_vars, enc_vars, pts):
        x_raw, w_raw = model.apply(b_vars, pts, train=False)
        heads = assemble_heads(x_raw, w_raw, True, True, k=K)
        w_hard = hard_w_encoding(heads.w, to_null_mask=True)
        col_valid = jnp.sum(w_hard, axis=1) > 0
        labels = jnp.argmax(
            jnp.where(col_valid[:, None, :], heads.w, -1.0), axis=-1
        )
        bb = jnp.argmax(base_barrel_probs(heads.w_2k), axis=-1)
        axes = estimate_extrusion_axis(
            heads.normals, heads.w_barrel, heads.w_base
        )
        centers, _ = hard_segment_centers(pts, w_hard)
        extents, _ = extrusion_extents(
            None, pts, labels, bb, axes, centers, num_samples=SK
        )
        p2d, n2d, scales, found_p = sketch_projection(
            None, pts, heads.normals, labels, bb, axes, centers,
            num_samples=SK,
        )
        enc_in = jnp.concatenate(
            [p2d / scales[..., None, None], n2d], axis=-1
        ).reshape(pts.shape[0] * K, SK, 4)
        latents = encoder.apply(enc_vars, enc_in, train=False).reshape(
            pts.shape[0], K, -1
        )
        return {
            "axes": axes, "centers": centers, "extents": extents,
            "scales": scales, "found": col_valid & found_p,
            "labels": labels, "bb_labels": bb, "latents": latents,
        }

    return {k: np.asarray(v) for k, v in run(b_vars, enc_vars, pts).items()}


def test_decompose_matches_eval_path(decomp_artifact):
    """The served decomposition must equal the eval-path library ops
    computed independently on the same inputs — bitwise at equal batch
    shape (same platform, same XLA program)."""
    path, meta, model, b_vars, encoder, enc_vars = decomp_artifact
    assert meta["decomposition"] and meta["with_latents"]
    sess = InferenceSession(path)
    pts = RNG.normal(size=(2, CFG.num_points, 3)).astype(np.float32)
    got = sess.decompose(pts)
    want = _oracle_decomposition(
        model, b_vars, encoder, enc_vars, jnp.asarray(pts)
    )
    np.testing.assert_array_equal(got["labels"], want["labels"])
    np.testing.assert_array_equal(got["bb_labels"], want["bb_labels"])
    np.testing.assert_array_equal(got["found"], want["found"])
    # default path rides the single packed uint16 tensor: geometry
    # unpacks bitwise, latents at fp16 precision
    for key in ("axes", "centers", "extents", "scales"):
        np.testing.assert_array_equal(got[key], np.asarray(want[key]), key)
    np.testing.assert_allclose(
        got["latents"], np.asarray(want["latents"]).astype(np.float16),
        rtol=0, atol=0,
    )
    assert got["labels"].dtype == np.int8
    assert got["axes"].shape == (2, K, 3)
    assert got["latents"].shape == (2, K, 32)
    # exact_latents opts out of the packed fetch: fp32 bitwise
    exact = sess.decompose(pts, exact_latents=True)
    for key in ("axes", "centers", "extents", "scales", "latents"):
        np.testing.assert_array_equal(
            exact[key], np.asarray(want[key]), key
        )
    # single-cloud convenience
    one = sess.decompose(pts[0])
    assert one["axes"].shape == (K, 3)


def test_decompose_padding_rows_do_not_perturb(decomp_artifact):
    """n=1 into the b=2 bucket: the zero-pad row rides along; the real
    row's decomposition must match the unpadded oracle to float noise."""
    path, _, model, b_vars, encoder, enc_vars = decomp_artifact
    sess = InferenceSession(path)
    pts = RNG.normal(size=(1, CFG.num_points, 3)).astype(np.float32)
    got = sess.decompose(pts)
    assert got["axes"].shape == (1, K, 3)
    want = _oracle_decomposition(
        model, b_vars, encoder, enc_vars, jnp.asarray(pts)
    )
    np.testing.assert_array_equal(got["labels"], want["labels"])
    np.testing.assert_allclose(got["axes"], want["axes"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["scales"], want["scales"],
                               rtol=1e-4, atol=1e-5)


def test_decompose_requires_decomposition_artifact(artifact):
    path, _, _, _ = artifact
    sess = InferenceSession(path)
    pts = RNG.normal(size=(1, CFG.num_points, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="decomposition"):
        sess.decompose(pts)


def test_decomp_artifact_still_serves_heads(decomp_artifact):
    """Decomposition artifacts keep the per-point head surface intact."""
    path, _, model, b_vars, _, _ = decomp_artifact
    sess = InferenceSession(path)
    pts = RNG.normal(size=(2, CFG.num_points, 3)).astype(np.float32)
    got = sess.predict(pts)
    x_raw, w_raw = _jit_apply(model)(b_vars, jnp.asarray(pts))
    heads = assemble_heads(x_raw, w_raw, True, True, k=K)
    np.testing.assert_allclose(got["normals"], np.asarray(heads.normals),
                               rtol=1e-6, atol=1e-7)


def test_benchmark_staged_decomp_keys(decomp_artifact):
    from point2cyl_tpu.serve.export import DECOMP_KEYS

    path, _, _, _, _, _ = decomp_artifact
    sess = InferenceSession(path)
    r = sess.benchmark(batch=2, iters=2, keys=DECOMP_KEYS, staged=True)
    assert r["staged"] and r["clouds_per_sec"] > 0
    assert "latents" in r["keys"]


def test_retrace_matches_frozen_programs(decomp_artifact):
    """The default session re-traces the serving forward from artifact
    metadata (the deserialized-export call path costs ~200 ms/call of
    fixed dispatch overhead on the remote-TPU serving target); the
    frozen serialized programs stay available via retrace=False. Both
    paths must produce identical outputs — same function, same weights,
    same platform."""
    path, meta, *_ = decomp_artifact
    live = InferenceSession(path)
    frozen = InferenceSession(path, retrace=False)
    assert live.retraced and not frozen.retraced
    pts = RNG.normal(size=(2, CFG.num_points, 3)).astype(np.float32)
    a = live.decompose(pts)
    b = frozen.decompose(pts)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    ra = live.predict(pts)
    rb = frozen.predict(pts)
    for key in ra:
        np.testing.assert_array_equal(ra[key], rb[key], err_msg=key)


def test_benchmark_packed_pipelined(decomp_artifact):
    """The bench-line configuration: single packed fetch, 4 requests in
    flight (copy_to_host_async overlap)."""
    path, _, _, _, _, _ = decomp_artifact
    sess = InferenceSession(path)
    r = sess.benchmark(batch=2, iters=6, keys=("packed",), staged=True,
                       pipeline=4)
    assert r["pipeline"] == 4 and r["clouds_per_sec"] > 0
    assert r["keys"] == ["packed"]


def test_benchmark_checksum_sync(decomp_artifact):
    """sync='checksum' forces each request with a 4-byte in-graph
    checksum instead of the full result fetch (the bench-line mode on
    tunnelled backends)."""
    path, _, _, _, _, _ = decomp_artifact
    sess = InferenceSession(path)
    r = sess.benchmark(batch=2, iters=4, keys=("packed",), staged=True,
                       pipeline=2, sync="checksum")
    assert r["sync"] == "checksum" and r["clouds_per_sec"] > 0


def test_benchmark_chain_sync(decomp_artifact):
    """sync='chain' accumulates per-request checksums on device with one
    final scalar fetch (the bench-line mode: no per-request host RTT on
    the clock; a pool of distinct staged inputs rotates)."""
    path, _, _, _, _, _ = decomp_artifact
    sess = InferenceSession(path)
    r = sess.benchmark(batch=2, iters=5, keys=("packed",), staged=True,
                       sync="chain", pool=3)
    assert r["sync"] == "chain" and r["clouds_per_sec"] > 0


def test_pack_unpack_roundtrip_bitwise():
    """Geometry lanes are bitcast uint16 pairs — the host unpack must be
    bit-exact, including NaN/denormal payloads; latents roundtrip at
    fp16."""
    import jax.numpy as jnp

    from point2cyl_tpu.serve.export import (pack_decomposition,
                                            unpack_decomposition)

    rng = np.random.default_rng(7)
    b, k, L = 3, 4, 8
    out = {
        "axes": jnp.asarray(rng.normal(size=(b, k, 3)), jnp.float32),
        "centers": jnp.asarray(rng.normal(size=(b, k, 3)), jnp.float32),
        "extents": jnp.asarray(rng.normal(size=(b, k, 2)), jnp.float32),
        "scales": jnp.asarray(rng.normal(size=(b, k)), jnp.float32),
        "found": jnp.asarray(rng.integers(0, 2, size=(b, k)), bool),
        "latents": jnp.asarray(rng.normal(size=(b, k, L)), jnp.float32),
    }
    # adversarial payloads: NaN, inf, denormal, -0.0
    out["axes"] = out["axes"].at[0, 0, 0].set(np.nan)
    out["centers"] = out["centers"].at[1, 2, 1].set(np.inf)
    out["scales"] = out["scales"].at[2, 3].set(np.float32(1e-42))
    out["extents"] = out["extents"].at[0, 1, 0].set(np.float32(-0.0))
    packed = np.asarray(pack_decomposition(out))
    assert packed.dtype == np.uint16 and packed.shape == (b, k, 20 + L)
    got = unpack_decomposition(packed, with_latents=True)
    for key in ("axes", "centers", "extents", "scales"):
        np.testing.assert_array_equal(
            got[key].view(np.uint32), np.asarray(out[key]).view(np.uint32),
            key,
        )
    np.testing.assert_array_equal(got["found"], np.asarray(out["found"]))
    np.testing.assert_array_equal(
        got["latents"], np.asarray(out["latents"]).astype(np.float16)
    )


def test_multidevice_session_matches_single(artifact):
    """devices=all 8 virtual CPU devices: round-robin chunk dispatch must
    reproduce the single-device session bitwise (same executables, same
    shapes — only placement differs)."""
    path, _, _, _ = artifact
    devs = jax.devices()
    assert len(devs) == 8  # conftest virtual CPU mesh
    single = InferenceSession(path)
    multi = InferenceSession(path, devices=devs)
    pts = RNG.normal(size=(7, CFG.num_points, 3)).astype(np.float32)
    a = single.predict(pts, assemble=False)
    b = multi.predict(pts, assemble=False)
    np.testing.assert_array_equal(a["x_raw"], b["x_raw"])
    np.testing.assert_array_equal(a["w_raw"], b["w_raw"])
    # 7 clouds with buckets [1, 2] -> chunks 2,2,2,1 across 4 devices
    assert multi.stats["clouds"] == 7
    # The round-robin cursor persists across requests, so a stream of
    # single-chunk requests spreads over all devices instead of piling
    # onto device 0.
    assert multi._next_dev == 4
    c = multi.predict(pts[:2], assemble=False)
    np.testing.assert_array_equal(a["x_raw"][:2], c["x_raw"])
    assert multi._next_dev == 5
