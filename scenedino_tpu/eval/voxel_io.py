"""Voxel-grid PLY export.

Behavioral parity target: `sscbench/gen_voxelgrid_npy.py` —
`save_as_voxel_ply:244` (cube mesh per occupied voxel with class / feature
colors) and the visibility carving already provided by
`scenedino_tpu.eval.sscbench.remove_invisible`. Pure-numpy binary-PLY
writer (the reference depends on plyfile).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# 8 cube corner offsets / 12 triangles (2 per face)
_CORNERS = np.array(
    [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ],
    np.float32,
)
_FACES = np.array(
    [
        (0, 2, 1), (0, 3, 2),  # bottom
        (4, 5, 6), (4, 6, 7),  # top
        (0, 1, 5), (0, 5, 4),
        (1, 2, 6), (1, 6, 5),
        (2, 3, 7), (2, 7, 6),
        (3, 0, 4), (3, 4, 7),
    ],
    np.int64,
)


def voxel_mesh(occupied: np.ndarray, origin, voxel_size: float, colors: Optional[np.ndarray] = None):
    """occupied: (X, Y, Z) bool; colors: (X, Y, Z, 3) float [0,1] or None.
    Returns (verts (N, 3) float32, faces (M, 3) int64, vcolors (N, 3) uint8).
    """
    ijk = np.stack(np.nonzero(occupied), -1)  # (V, 3)
    if len(ijk) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64), np.zeros((0, 3), np.uint8)
    base = np.asarray(origin, np.float32)[None] + ijk.astype(np.float32) * voxel_size
    verts = (base[:, None] + _CORNERS[None] * voxel_size).reshape(-1, 3)
    faces = (_FACES[None] + (np.arange(len(ijk)) * 8)[:, None, None]).reshape(-1, 3)
    if colors is not None:
        c = colors[occupied]
    else:
        c = np.full((len(ijk), 3), 0.7, np.float32)
    vcolors = np.repeat((np.clip(c, 0, 1) * 255).astype(np.uint8), 8, axis=0)
    return verts.astype(np.float32), faces, vcolors


def save_as_voxel_ply(path: str, occupied, origin=(0.0, 0.0, 0.0), voxel_size=0.2, colors=None):
    """Write a binary-little-endian PLY of the occupied voxels
    (gen_voxelgrid_npy.py:244 parity without plyfile)."""
    verts, faces, vcolors = voxel_mesh(np.asarray(occupied, bool), origin, voxel_size, colors)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        f.write(header.encode("ascii"))
        # vectorized struct packing: per-row python struct.pack would make
        # ~20M calls at the demo's 1M-voxel cap (minutes); tofile is <1 s
        vrec = np.empty(len(verts), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
        vrec["xyz"] = verts
        vrec["rgb"] = vcolors
        vrec.tofile(f)
        frec = np.empty(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        frec["n"] = 3
        frec["idx"] = faces
        frec.tofile(f)
    return len(verts), len(faces)


# --------------------------------------------------------------------------
# SemanticKITTI bit-packed occupancy .bin format
# (common/io/voxel_grids/semantic_kitti.py:7-33 + __init__.py:save_voxel_grid)

def unpack_voxel_bits(compressed: np.ndarray) -> np.ndarray:
    """Bit-packed uint8 array -> flat 0/1 uint8 voxel array, MSB first
    (semantic_kitti.py:unpack:7-20)."""
    compressed = np.asarray(compressed, np.uint8)
    out = np.zeros(compressed.shape[0] * 8, dtype=np.uint8)
    for bit in range(8):
        out[bit::8] = (compressed >> (7 - bit)) & 1
    return out


def pack_voxel_bits(uncompressed: np.ndarray) -> np.ndarray:
    """Flat boolean/0-1 array (length divisible by 8) -> bit-packed array,
    MSB first (semantic_kitti.py:pack:23-29)."""
    u = np.asarray(uncompressed).reshape(-1, 8)
    weights = 1 << np.arange(7, -1, -1)
    return u.dot(weights)


def save_semantic_kitti(voxel_grid: np.ndarray, path: str) -> None:
    """Save an occupancy voxel grid in the SemanticKITTI compressed .bin
    layout: flip all three axes, flatten, bit-pack, write uint8
    (semantic_kitti.py:save_semantic_kitti:32-33)."""
    flat = np.flip(np.asarray(voxel_grid), (0, 1, 2)).reshape(-1)
    pack_voxel_bits(flat).astype(np.uint8).tofile(path)


def save_voxel_grid(voxel_grid: np.ndarray, path: str, format: str = "semantic_kitti") -> None:
    """Format-dispatching voxel-grid saver (voxel_grids/__init__.py:12-21)."""
    if format == "semantic_kitti":
        save_semantic_kitti(voxel_grid, path)
    else:
        raise NotImplementedError(f"Voxel format {format!r} not implemented.")
