"""Mesh regression stats for reconstruction outputs.

Walks a ``p2c-visualize`` output directory (``reconstruction/*.ply`` +
``intermediate_volumes/*.ply``) and emits one JSON object of per-mesh
invariants (vert/face counts, connected components, surface area,
signed volume, bbox) — the committed regression artifact format of
``results/regression/mesh_stats_r*.json``. Round 4 generated these with
a /tmp script that the wipe took; this is the durable replacement.

Usage: python tools/mesh_stats.py <visu_output_dir> [--out stats.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from point2cyl_tpu.data.meshutil import (connected_component_labels,
                                         face_adjacency, face_areas,
                                         merge_vertices)
from point2cyl_tpu.recon.ply import read_ply


def mesh_stats(verts: np.ndarray, faces: np.ndarray) -> dict:
    mv, mf = merge_vertices(verts, faces)
    comps = connected_component_labels(face_adjacency(mf), mf.shape[0])
    areas = face_areas(mv, mf)
    # signed volume via the divergence theorem over face tetrahedra
    tri = mv[mf]  # (F, 3, 3)
    vol = float(np.einsum(
        "ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])
    ).sum() / 6.0)
    return {
        "verts": int(verts.shape[0]),
        "faces": int(faces.shape[0]),
        "components": int(comps.max() + 1) if mf.size else 0,
        "area": round(float(areas.sum()), 4),
        "signed_volume": round(vol, 5),
        "bbox_min": [round(float(x), 4) for x in verts.min(axis=0)],
        "bbox_max": [round(float(x), 4) for x in verts.max(axis=0)],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("visu_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out: dict = {}
    for sub in ("reconstruction", "intermediate_volumes"):
        for path in sorted(
            glob.glob(os.path.join(args.visu_dir, sub, "*.ply"))
        ):
            name = f"{sub}/{os.path.splitext(os.path.basename(path))[0]}"
            verts, faces = read_ply(path)
            out[name] = mesh_stats(verts, faces)
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
