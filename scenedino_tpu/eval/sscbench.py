"""SSCBench-KITTI-360 voxel evaluator.

Behavioral parity target: `sscbench/evaluate_model_sscbench.py` +
`sscbench/point_utils.py` + `sscbench/label_maps.yaml` — all eval constants
reproduced exactly: sigma cutoff 0.2, alpha weighting at 0.2 m voxels, 3^3
grow max-pool, visibility carving (`remove_invisible`,
gen_voxelgrid_npy.py:171-185), additional-invalids rule
(evaluate_model_sscbench.py:814-827), fov mask from the SSCBench calib, and
the direct + Hungarian mIoU tables over ranges 12.8 / 25.6 / 51.2 m.

TPU redesign: the 256x256x32 voxel grid is queried by a jitted
`lax.map` over static 128x128x32-point blocks (one compiled program,
reference loops blocks in python, :711-753); pooling/thresholding stays
on-device; confusion accumulation is host-side numpy like the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.eval.metrics import apply_assignment, pseudo_label_assignment

SIGMA_CUTOFF = 0.2
VOXEL_SIZE = 0.2
SIZES = (12.8, 25.6, 51.2)
VOX_ORIGIN = np.array([0.0, -25.6, -2.0], np.float32)
SCENE_SIZE = (51.2, 51.2, 6.4)
IMG_W, IMG_H = 1408, 376

# SSCBench-KITTI-360 calibration defaults (point_utils.py:84-157 hardcodes
# these; we additionally parse a semantic-KITTI-style calib.txt when given)
CAM_K = np.array(
    [[552.554261, 0.0, 682.049453], [0.0, 552.554261, 238.769549], [0.0, 0.0, 1.0]],
    np.float64,
)
CAM2VELO = np.array(
    [
        [0.04307104361, -0.08829286498, 0.995162929, 0.8043914418],
        [-0.999004371, 0.007784614041, 0.04392796942, 0.2993489574],
        [-0.01162548558, -0.9960641394, -0.08786966659, -0.1770225824],
        [0.0, 0.0, 0.0, 1.0],
    ],
    np.float64,
)
VELO2CAM = np.linalg.inv(CAM2VELO)


@dataclasses.dataclass(frozen=True)
class SSCCalib:
    """Per-export calibration (defaults = the SSCBench-KITTI-360 release)."""

    cam_k: np.ndarray = dataclasses.field(default_factory=lambda: CAM_K)
    velo2cam: np.ndarray = dataclasses.field(default_factory=lambda: VELO2CAM)
    img_w: int = IMG_W
    img_h: int = IMG_H


def read_calib(calib_path: Optional[str] = None) -> SSCCalib:
    """Load calibration from a semantic-KITTI-style `calib.txt` ("P2: <12
    floats>" intrinsics row-major 3x4, "Tr: <12 floats>" velo->cam). The
    reference's read_calib (point_utils.py:84-136) hardcodes the KITTI-360
    values; passing no path reproduces that."""
    if calib_path is None:
        return SSCCalib()
    vals = {}
    with open(calib_path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, _, rest = line.partition(":")
            try:
                vals[key.strip()] = np.array([float(x) for x in rest.split()])
            except ValueError:
                continue
    calib = SSCCalib()
    if "P2" in vals and vals["P2"].size == 12:
        calib = dataclasses.replace(calib, cam_k=vals["P2"].reshape(3, 4)[:3, :3])
    if "Tr" in vals and vals["Tr"].size == 12:
        v2c = np.eye(4)
        v2c[:3, :4] = vals["Tr"].reshape(3, 4)
        calib = dataclasses.replace(calib, velo2cam=v2c)
    return calib

# label_maps.yaml
SSCBENCH_TO_LABEL = {
    0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 8, 10: 12,
    11: 9, 12: 10, 13: 11, 14: 12, 15: 13, 16: 14, 17: 9, 18: 15, 19: 0, 255: 255,
}
CITYSCAPES_TO_LABEL = {
    0: 7, 1: 8, 2: 9, 3: 9, 4: 10, 5: 13, 6: 15, 7: 14, 8: 11, 9: 12, 10: 0,
    11: 6, 12: 0, 13: 1, 14: 4, 15: 5, 16: 5, 17: 3, 18: 2,
}
LABELS = {
    0: "unlabeled", 1: "car", 2: "bicycle", 3: "motorcycle", 4: "truck",
    5: "other-vehicle", 6: "person", 7: "road", 8: "sidewalk", 9: "building",
    10: "fence", 11: "vegetation", 12: "terrain", 13: "pole",
    14: "traffic-sign", 15: "other-object",
}
N_LABELS = 16  # incl. unlabeled


def convert_voxels(arr, map_dict):
    """Vectorized label remap (evaluate_model_sscbench.py:856-858)."""
    lut = np.zeros(256, dtype=np.int64)
    for k, v in map_dict.items():
        lut[k] = v
    return lut[np.asarray(arr, np.int64)]


def generate_point_grid(
    voxel_size=VOXEL_SIZE, vox_origin=VOX_ORIGIN, scene_size=SCENE_SIZE,
    calib: Optional[SSCCalib] = None,
):
    """Voxel-center points in the camera frame + fov mask
    (point_utils.py:17-82). Returns (pts (N, 3) float32 cam coords,
    fov_mask (N,) bool) with N = 256*256*32 at 0.2 m."""
    calib = calib or SSCCalib()
    vol_dim = np.ceil(np.array(scene_size) / voxel_size).astype(int)
    xv, yv, zv = np.meshgrid(range(vol_dim[0]), range(vol_dim[1]), range(vol_dim[2]), indexing="ij")
    coords = np.stack([xv.reshape(-1), yv.reshape(-1), zv.reshape(-1)], 1).astype(np.float32)
    velo_pts = vox_origin[None] + voxel_size * coords + voxel_size * 0.5

    v2c, cam_k = calib.velo2cam, calib.cam_k
    cam_pts = (v2c[:3, :3] @ velo_pts.T).T + v2c[:3, 3]
    pix_x = np.round(cam_pts[:, 0] * cam_k[0, 0] / cam_pts[:, 2] + cam_k[0, 2]).astype(np.int64)
    pix_y = np.round(cam_pts[:, 1] * cam_k[1, 1] / cam_pts[:, 2] + cam_k[1, 2]).astype(np.int64)
    pix_z = cam_pts[:, 2]
    fov_mask = (
        (pix_x >= 0) & (pix_x < calib.img_w) & (pix_y >= 0) & (pix_y < calib.img_h) & (pix_z > 0)
    )
    return cam_pts.astype(np.float32), fov_mask


def get_fov_mask(calib: Optional[SSCCalib] = None):
    _, m = generate_point_grid(calib=calib)
    return m.reshape(256, 256, 32)


def remove_invisible(volume):
    """Visibility carving: drop voxels with >= 6 occupied face-neighbors
    (gen_voxelgrid_npy.py:171-185). volume: (X, Y, Z) bool jnp/np."""
    v = jnp.asarray(volume, jnp.float32)[None, None]
    kernel = jnp.zeros((3, 3, 3), jnp.float32)
    for di, dj, dk in [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, 0), (1, 1, 2)]:
        kernel = kernel.at[di, dj, dk].set(1.0)
    n = jax.lax.conv_general_dilated(
        v, kernel[None, None], (1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NCXYZ", "OIXYZ", "NCXYZ"),
    )[0, 0]
    hidden = n >= 6
    return jnp.asarray(volume, bool) & ~hidden


def identify_additional_invalids(target):
    """Voxels shadowed before the first occupied/invalid along z
    (evaluate_model_sscbench.py:814-827). target: (256, 256, 32) labels."""
    t = np.concatenate([np.zeros([256, 256, 1]), target], axis=2)
    invalids = np.cumsum(np.logical_and(t != 255, t != 0), axis=2)[:, :, :32] == 0
    invalids[:, :, 7:] = 0
    invalids[target != 0] = 0
    return invalids


def grow_sigmas(sigmas):
    """3^3 max-pool stride 1 (evaluate_model_sscbench.py:755-756)."""
    x = jnp.asarray(sigmas)[None, None]
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 3), (1, 1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)],
    )
    return out[0, 0]


def make_grid_predictor(
    query_fn, chunk_points=128 * 128 * 32, grow=True,
    grid_dim=(256, 256, 32), voxel_size=VOXEL_SIZE, coherent=True,
    jit=True,
):
    """Build a jitted dense-grid predictor.

    query_fn(pts (1, P, 3), qstate) -> (sigma (1, P), seg_probs (1, P, 19))
    (the `net.forward(pts, predict_segmentation=True)` contract); `qstate`
    is the per-frame scene state (plus any fixed weights), threaded
    through `predict(pts, qstate)` as a REAL jit argument. It must not be
    a closure: jit would bake the first frame's encoding into the
    executable as constants and silently reuse it for every later frame
    (and embedding ~0.5 GB of ViT weights overflows remote-compile
    transports). Returns (sigmas grid_dim, segs grid_dim) with
    alpha-weighted seg argmax (evaluate_model_sscbench.py:711-753).

    coherent=True feeds the voxels in (z, depth, lateral) order — fixed
    height and depth rows project to near-horizontal image bands, which is
    what the banded gather in the fast query path needs — and transposes
    the results back (static reshapes, not gathers). Semantics identical.
    """
    X, Y, Z = grid_dim

    def predict(pts, qstate):
        N = pts.shape[0]
        base = X * Y * Z
        # N may exceed the grid size: callers pad the point list up to a
        # whole number of chunks (the tail is evaluated and discarded) —
        # required when the grid has small 2-adic factors and no clean
        # chunk divisor (cli/generate_ply_sequence.py --voxel-size)
        assert N >= base and N % chunk_points == 0, (N, base, chunk_points)
        if coherent:
            head = pts[:base].reshape(X, Y, Z, 3).transpose(2, 0, 1, 3).reshape(base, 3)
            pts = jnp.concatenate([head, pts[base:]], 0) if N > base else head
        blocks = pts.reshape(-1, chunk_points, 3)

        def eval_block(block):
            sigma, seg = query_fn(block[None], qstate)
            sigma = sigma[0]
            seg = seg[0]
            alphas = 1.0 - jnp.exp(-voxel_size * sigma)
            weighted = alphas[:, None] * seg
            return sigma, jnp.argmax(weighted, -1)

        sigmas, segs = jax.lax.map(eval_block, blocks)
        sigmas = sigmas.reshape(-1)[:base]
        segs = segs.reshape(-1)[:base]
        if coherent:
            sigmas = sigmas.reshape(Z, X, Y).transpose(1, 2, 0)
            segs = segs.reshape(Z, X, Y).transpose(1, 2, 0)
        else:
            sigmas = sigmas.reshape(grid_dim)
            segs = segs.reshape(grid_dim)
        if grow:
            sigmas = grow_sigmas(sigmas)
        return sigmas, segs

    # jit=False returns the raw traceable fn for embedding into a larger
    # program (e.g. the shard_map body of the frame-parallel evaluator)
    return jax.jit(predict) if jit else predict


def make_sharded_frame_predictor(encode_fn, predict_fn, mesh, axis_name="data"):
    """Frame-parallel SSC grid prediction over a device mesh.

    The reference evaluates SSCBench strictly one frame per GPU process;
    here D frames shard over the mesh's data axis with `shard_map`: each
    chip encodes ITS frame and queries the full voxel grid locally — zero
    collectives, bit-identical per-frame results to the single-device
    path (each shard runs the exact same program on the same inputs).

    encode_fn(variables, imgs, projs, poses) -> qstate  (raw, unjitted;
      sees the LOCAL shard, i.e. one frame with its leading dim kept)
    predict_fn: `make_grid_predictor(..., jit=False)` raw fn.

    Returns a jitted `step(variables, pts, imgs, projs, poses) ->
    (sigmas (D, *grid_dim), segs (D, *grid_dim))` where every per-frame
    arg carries a leading frame axis of size mesh.devices.size.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if jax.process_count() > 1:
        # host-global inputs + np.asarray fetch of the per-frame grids
        # don't compose with multi-host meshes; split frames per process
        raise NotImplementedError(
            "make_sharded_frame_predictor is single-host multi-device; "
            "split the dataset per process for multi-host evaluation"
        )

    d = P(axis_name)

    def body(variables, pts, imgs, projs, poses):
        qstate = encode_fn(variables, imgs, projs, poses)
        sigmas, segs = predict_fn(pts, qstate)
        return sigmas[None], segs[None]

    return jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=(P(), P(), d, d, d), out_specs=d,
        )
    )


def make_pipelined_grid_step(encode_fn, predict_fn):
    """Software-pipelined SSC/PLY frame stream on ONE chip: a single
    program queries frame N-1's scene state over the dense voxel grid
    while encoding frame N. MEASURED (v5e, tools/bench_ssc_pipelined.py;
    same verdict as the render stream in bench.py): XLA does NOT
    co-schedule the independent subgraphs — the fused program costs
    encode + query (the sum), not max(encode, query). The flag's real
    effect is one dispatch/host round-trip per frame instead of two.
    Numerics are exactly the two-call sequence (the fusion only merges
    independent programs).

    encode_fn(variables, imgs, projs, poses) -> qstate  (raw, unjitted)
    predict_fn: `make_grid_predictor(..., jit=False)` raw fn.

    Returns a RAW `step(variables, qstate_prev, pts, imgs, projs, poses)
    -> (qstate_next, (sigmas, segs))` — jit it with real args (do not
    close over params; see make_grid_predictor). Bootstrap qstate_prev by
    encoding frame 0; feed frame N+1's images to get frame N's grids.
    """

    def step(variables, qstate_prev, pts, imgs, projs, poses):
        sigmas, segs = predict_fn(pts, qstate_prev)
        qstate_next = encode_fn(variables, imgs, projs, poses)
        return qstate_next, (sigmas, segs)

    return step


def compute_occupancy_numbers(y_pred, y_true, fov_mask):
    """(evaluate_model_sscbench.py:908-924)."""
    mask = (y_true != 255) & fov_mask
    occ_true = (y_true > 0)[mask]
    occ_pred = (y_pred > 0)[mask]
    tp = int(np.sum(occ_true & occ_pred))
    fp = int(np.sum(~occ_true & occ_pred))
    fn = int(np.sum(occ_true & ~occ_pred))
    tn = int(np.sum(~occ_true & ~occ_pred))
    return tp, fp, tn, fn


def compute_occupancy_numbers_segmentation(y_pred, y_true, fov_mask):
    """Per-class tp/fp/tn/fn + 16x16 confusion (:862-886)."""
    mask = ((y_true != 255) & fov_mask).reshape(-1)
    yp = y_pred.reshape(-1)[mask]
    yt = y_true.reshape(-1)[mask]
    n = N_LABELS - 1
    tp = np.zeros(n)
    fp = np.zeros(n)
    fn = np.zeros(n)
    tn = np.zeros(n)
    for lab in range(1, N_LABELS):
        tp[lab - 1] = np.sum((yt == lab) & (yp == lab))
        fp[lab - 1] = np.sum((yt != lab) & (yp == lab))
        fn[lab - 1] = np.sum((yt == lab) & (yp != lab))
        tn[lab - 1] = np.sum((yt != lab) & (yp != lab))
    conf = np.bincount(N_LABELS * yt + yp, minlength=N_LABELS * N_LABELS).reshape(N_LABELS, N_LABELS)
    return tp, fp, tn, fn, conf


def compute_occupancy_recall_segmentation(y_pred, y_true, fov_mask):
    """Per-GT-class occupancy recall: of voxels whose GT is class c, how
    many are predicted occupied at all (evaluate_model_sscbench.py:889-906).
    Returns (tp (15,), total (15,))."""
    mask = ((y_true != 255) & fov_mask).reshape(-1)
    yp = y_pred.reshape(-1)[mask]
    yt = y_true.reshape(-1)[mask]
    n = N_LABELS - 1
    tp = np.zeros(n)
    total = np.zeros(n)
    for lab in range(1, N_LABELS):
        tp[lab - 1] = np.sum((yt == lab) & (yp > 0))
        total[lab - 1] = np.sum(yt == lab)
    return tp, total


SEARCH_VALUES = (10e-1, 10e-2, 10e-3, 10e-4, 10e-5, 10e-6, 10e-7)  # :55
SIGMA_VALUES = (1, 0.5, 0.25, 0.1, 0.05, 0.025, 0.01, 0.005, 0.0025, 0.001)  # :63


@dataclasses.dataclass
class SigmaDiagnostics:
    """TEST_ALPHA_CUTOFFS per-class sigma-cutoff search + the
    CREATE_SIGMA_TRADEOFF precision/recall curve
    (evaluate_model_sscbench.py:302-304,473-492,616-640).

    Feed RAW (pre-cutoff) segs/sigmas per frame; `best_cutoffs()` returns
    the per-class sigma value maximizing IoU, `tradeoff_curve()` the
    (sigma, precision, recall, iou) table."""

    cutoff_results: Dict = dataclasses.field(
        default_factory=lambda: {
            i: {sv: np.zeros(4) for sv in SEARCH_VALUES} for i in range(1, 16)
        }
    )
    trade_off_values: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((len(SIGMA_VALUES), 4))
    )

    def add_frame(self, sigmas, segs, voxel_gt, fov_mask, use_additional_invalids=True):
        segs = convert_voxels(segs, CITYSCAPES_TO_LABEL)
        target = convert_voxels(voxel_gt.astype(int), SSCBENCH_TO_LABEL)
        if use_additional_invalids:
            inv = identify_additional_invalids(target)
            target = np.where(inv, 255, target)

        for i in range(1, 16):
            for sv in SEARCH_VALUES:
                tmp = segs.copy()
                tmp[np.logical_and(segs == i, sigmas < sv)] = 0
                tps, fps, tns, fns, _ = compute_occupancy_numbers_segmentation(
                    tmp, target, fov_mask
                )
                self.cutoff_results[i][sv] += np.array(
                    [tps[i - 1], fps[i - 1], tns[i - 1], fns[i - 1]]
                )
        for j, val in enumerate(SIGMA_VALUES):
            tmp = segs.copy()
            tmp[sigmas < val] = 0
            self.trade_off_values[j] += np.array(
                compute_occupancy_numbers(tmp, target, fov_mask)
            )

    def best_cutoffs(self) -> Dict[int, float]:
        """Per-class sigma cutoff maximizing IoU (:616-625)."""
        out = {}
        for i in range(1, 16):
            ious = []
            for sv in SEARCH_VALUES:
                tp, fp, tn, fn = self.cutoff_results[i][sv]
                ious.append(tp / max(tp + fp + fn, 1e-9))
            out[i] = SEARCH_VALUES[int(np.argmax(ious))]
        return out

    def tradeoff_curve(self):
        """(sigma, precision, recall, iou) rows of the tradeoff plot
        (:627-640) — the plot's underlying numbers, no matplotlib."""
        rows = []
        for j, val in enumerate(SIGMA_VALUES):
            tp, fp, tn, fn = self.trade_off_values[j]
            rows.append((
                val,
                float(100 * tp / max(tp + fp, 1e-9)),
                float(100 * tp / max(tp + fn, 1e-9)),
                float(100 * tp / max(tp + fp + fn, 1e-9)),
            ))
        return rows


@dataclasses.dataclass
class SSCAccumulator:
    """Running per-range stats (evaluate_model_sscbench.py:284-299)."""

    results: Dict = dataclasses.field(
        default_factory=lambda: {
            size: {
                "tp": 0, "fp": 0, "tn": 0, "fn": 0,
                "tp_seg": np.zeros(15), "fp_seg": np.zeros(15),
                "tn_seg": np.zeros(15), "fn_seg": np.zeros(15),
                "tp_recall_seg": np.zeros(15), "sum_recall_seg": np.zeros(15),
                "confusion_seg": np.zeros((N_LABELS, N_LABELS)),
            }
            for size in SIZES
        }
    )

    def add_frame(self, sigmas, segs, voxel_gt, fov_mask, use_additional_invalids=True):
        """sigmas/segs: (256,256,32) np arrays (segs in cityscapes ids);
        voxel_gt: (256,256,32) raw sscbench labels."""
        segs = convert_voxels(segs, CITYSCAPES_TO_LABEL)
        target = convert_voxels(voxel_gt.astype(int), SSCBENCH_TO_LABEL)

        occupied = np.array(remove_invisible(jnp.asarray(sigmas > SIGMA_CUTOFF)))
        occupied[segs == 0] = False
        segs = np.where(occupied, segs, 0)

        if use_additional_invalids:
            inv = identify_additional_invalids(target)
            target = np.where(inv, 255, target)

        for size in SIZES:
            nv = int(size // 0.2)
            sl = np.s_[:nv, 128 - nv // 2 : 128 + nv // 2, :]
            _segs, _target, _fov = segs[sl], target[sl], fov_mask[sl]
            tp, fp, tn, fn = compute_occupancy_numbers(_segs, _target, _fov)
            tps, fps, tns, fns, conf = compute_occupancy_numbers_segmentation(_segs, _target, _fov)
            tpr, sumr = compute_occupancy_recall_segmentation(_segs, _target, _fov)
            r = self.results[size]
            r["tp"] += tp; r["fp"] += fp; r["tn"] += tn; r["fn"] += fn
            r["tp_seg"] += tps; r["fp_seg"] += fps; r["tn_seg"] += tns; r["fn_seg"] += fns
            r["tp_recall_seg"] += tpr; r["sum_recall_seg"] += sumr
            r["confusion_seg"] += conf

    def summarize(self) -> Dict:
        """Direct + Hungarian mIoU tables (evaluate_model_sscbench.py:536-609)."""
        out = {}
        for size in SIZES:
            r = self.results[size]
            denom = r["tp"] + r["fp"] + r["fn"]
            occ_iou = r["tp"] / max(denom, 1)
            direct_iou = r["tp_seg"] / np.maximum(r["tp_seg"] + r["fp_seg"] + r["fn_seg"], 1)

            conf = r["confusion_seg"][1:, 1:]  # drop unlabeled for matching
            assignment = pseudo_label_assignment(conf)
            remapped = apply_assignment(conf, assignment)
            tp_h = np.diag(remapped).astype(np.float64)
            fp_h = remapped.sum(0) - tp_h
            fn_h = remapped.sum(1) - tp_h
            hung_iou = tp_h / np.maximum(tp_h + fp_h + fn_h, 1)

            out[size] = {
                "occ_iou": float(occ_iou),
                "occ_precision": float(r["tp"] / max(r["tp"] + r["fp"], 1)),
                "occ_recall": float(r["tp"] / max(r["tp"] + r["fn"], 1)),
                "direct_per_class_iou": direct_iou,
                "direct_miou": float(direct_iou.mean()),
                "hungarian_per_class_iou": hung_iou,
                "hungarian_miou": float(hung_iou.mean()),
                "occupancy_recall_seg": r["tp_recall_seg"]
                / np.maximum(r["sum_recall_seg"], 1),
            }
        return out
