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
