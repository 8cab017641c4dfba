"""Offline preprocessing pipeline tests with synthetic OBJ/JSON fixtures."""

import json
import os
import tempfile

import numpy as np
import pytest

from point2cyl_tpu.data import meshutil
from point2cyl_tpu.data.preprocess import (
    build_dataset,
    collect_objs,
    get_base_barrel_label,
    get_extrude_infos,
    group_delta_check,
    group_surface_areas_check,
    load_obj,
    normals_extrusions_check,
    preprocess_model,
)

RNG = np.random.default_rng(13)


def box_obj(lines_out, lo, hi, prefix):
    """Append a grouped axis-aligned box (6 groups, 12 tris) to an OBJ."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = [
        (x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
        (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
    ]
    base = lines_out["nv"]
    for p in v:
        lines_out["lines"].append(f"v {p[0]} {p[1]} {p[2]}")
    lines_out["nv"] += 8
    quads = {
        f"{prefix}_bottom": (1, 4, 3, 2),  # z = z0, normal -z
        f"{prefix}_top": (5, 6, 7, 8),  # z = z1, normal +z
        f"{prefix}_s1": (1, 2, 6, 5),  # y = y0
        f"{prefix}_s2": (2, 3, 7, 6),  # x = x1
        f"{prefix}_s3": (3, 4, 8, 7),  # y = y1
        f"{prefix}_s4": (4, 1, 5, 8),  # x = x0
    }
    for g, (a, b, c, d) in quads.items():
        a, b, c, d = a + base, b + base, c + base, d + base
        lines_out["lines"].append(f"g {g}")
        lines_out["lines"].append(f"f {a} {b} {c}")
        lines_out["lines"].append(f"f {a} {c} {d}")
    return list(quads.keys())


def make_fixture(tmp):
    out = {"lines": [], "nv": 0}
    groups = box_obj(out, (0, 0, 0), (1, 1, 1), "g0")
    with open(os.path.join(tmp, "m0.obj"), "w") as f:
        f.write("\n".join(out["lines"]) + "\n")
    entities = {
        "e1": {
            "extent_one": {
                "distance": {"value": 1.0},
                "taper_angle": {"value": 0.0},
            },
            "operation": "NewBodyFeatureOperation",
            "profiles": [{"sketch": "sk1"}],
            "extrude_faces": groups,
            "extrude_side_faces": groups[2:],
            "extrude_start_faces": [groups[0]],
            "extrude_end_faces": [groups[1]],
            "bodies": {"b1": {"faces": groups}},
        },
        "sk1": {
            "reference_plane": {
                "plane": {"normal": {"x": 0.0, "y": 0.0, "z": 1.0}}
            }
        },
    }
    doc = {
        "sequence": [
            {"obj": "m0.obj", "type": "ExtrudeFeature", "entity": "e1"}
        ],
        "timeline": [],
        "entities": entities,
    }
    with open(os.path.join(tmp, "model.json"), "w") as f:
        json.dump(doc, f)
    return tmp


def test_meshutil_adjacency_components():
    faces = np.array([[0, 1, 2], [1, 2, 3], [4, 5, 6]])
    adj = meshutil.face_adjacency(faces)
    assert len(adj) == 1 and set(adj[0]) == {0, 1}
    comp = meshutil.connected_component_labels(adj, 3)
    assert comp[0] == comp[1] != comp[2]


def test_meshutil_sample_surface_area_weighted():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 0], [10.1, 10, 0],
         [10, 10.1, 0]],
        float,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    pts, fidx = meshutil.sample_surface(verts, faces, 1000, RNG)
    # big triangle has ~10000x the area of the small one
    assert (fidx == 0).mean() > 0.98
    # samples lie in the z=0 plane inside the triangles
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-12)


def test_meshutil_on_surface():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]])
    q = np.array([[0.2, 0.2, 0.5], [2.0, 0.0, 0.0]])
    dist, fid = meshutil.on_surface(q, verts, faces)
    np.testing.assert_allclose(dist[0], 0.5, atol=1e-9)
    np.testing.assert_allclose(dist[1], 1.0, atol=1e-9)


def test_load_obj_groups():
    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        v, f, n, groups, ids = load_obj(
            os.path.join(tmp, "m0.obj"),
            group_to_id={g: 0 for g in [
                "g0_bottom", "g0_top", "g0_s1", "g0_s2", "g0_s3", "g0_s4"
            ]},
        )
    assert v.shape == (8, 3) and f.shape == (12, 3)
    assert len(groups) == 6
    assert (ids == 0).all()
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-9)


def test_checks():
    assert group_surface_areas_check([{"a": 2.0}, {"a": 1.5}])
    assert not group_surface_areas_check([{"a": 1.0}, {"a": 2.0}])
    assert group_delta_check([6], [6], [0])
    axes = np.array([[0.0, 0.0, 1.0]])
    normals = np.array([[1.0, 0, 0], [0, 0, 1.0]])
    labels = np.array([0, 0])
    assert normals_extrusions_check(normals, labels, axes)
    bb = get_base_barrel_label(normals, labels, axes)
    np.testing.assert_array_equal(bb, [0, 1])
    # a diagonal normal breaks labeling
    bad = np.array([[0.7071, 0, 0.7071]])
    assert get_base_barrel_label(bad, np.array([0]), axes) is None


def test_preprocess_box_model():
    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        sample = preprocess_model(
            tmp, "model", num_points=2048, max_instances=4,
            num_sketch_points=64,
        )
    assert sample is not None
    assert sample["n_instances"] == 1
    assert (sample["extrusion_labels"] == 0).all()
    # unit-sphere normalized
    np.testing.assert_allclose(
        np.linalg.norm(sample["point_cloud"], axis=-1).max(), 1.0, atol=1e-6
    )
    # axis preserved
    np.testing.assert_allclose(
        sample["extrusion_axes"][0], [0, 0, 1], atol=1e-9
    )
    # base/barrel split: ~2/6 of box area is base
    frac_base = sample["base_barrel_labels"].mean()
    assert 0.25 < frac_base < 0.42
    # sketch of a unit-square profile: normalized max norm 1
    sk = sample["sketches"][0]
    assert np.abs(np.linalg.norm(sk[:, :2], axis=-1).max() - 1.0) < 1e-5
    # operations are "add"
    assert (sample["extrusion_operation"] == 0).all()


def test_build_dataset_and_parsers():
    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        ds, kept = build_dataset(
            tmp, ["model"], num_points=1024, max_instances=4,
            num_sketch_points=32,
        )
    assert kept == ["model"]
    assert ds.point_cloud.shape == (1, 1024, 3)
    ds.validate()

    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        with open(os.path.join(tmp, "model.json")) as f:
            doc = json.load(f)
        objs, entities = collect_objs(doc["sequence"])
        assert objs == ["m0.obj"] and entities == ["e1"]
        info = get_extrude_infos(entities, doc["entities"])
        assert info["e1"]["distance"] == 1.0
        # tapered filter
        doc["entities"]["e1"]["extent_one"]["taper_angle"]["value"] = 0.5
        assert get_extrude_infos(entities, doc["entities"]) is None
