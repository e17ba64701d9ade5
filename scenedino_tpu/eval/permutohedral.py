"""Exact permutohedral-lattice dense CRF (host-side numpy).

Behavioral parity target: `scenedino/downstream_head/crf.py:21-43`, which
runs pydensecrf's DenseCRF2D — mean-field inference whose Gaussian
message passing is computed with the permutohedral lattice of Adams,
Baek & Davis (2010), on the CPU. pydensecrf has no TPU analogue and the
lattice is a hash-table data structure, so this module mirrors the
reference's placement exactly: a host-side (numpy) implementation of the
*same* lattice algorithm, used for evaluation-time refinement. The
jittable on-device path remains `eval/crf.py` (truncated-window ConvCRF
approximation); this file is the exact reference it is bounded against.

Lattice algorithm (verified against brute-force dense Gaussian
filtering in tests/test_permutohedral.py):
  1. embed d-dim features into the hyperplane H_d ⊂ R^{d+1} (sum-zero),
     scaled so the blur kernel's variance matches a unit Gaussian,
  2. find the enclosing simplex of the permutohedral lattice
     (remainder-0 point + rank sort) and barycentric weights,
  3. splat values onto the d+1 simplex vertices (hashed by their first
     d coordinates; the last is determined by the sum-zero constraint),
  4. blur along each of the d+1 lattice directions with a [1, 2, 1]
     kernel (double-buffered, missing neighbors contribute zero),
  5. slice back with the same barycentric weights.

Mean-field update equations follow pydensecrf (densecrf v2):
  unary  = log(clip(softmax(logits), 1e-5, 1))        # -unary_from_softmax
  Q_0    = softmax(unary)
  Q_t+1  = softmax(unary + Σ_k w_k · s_k ⊙ L_k(s_k ⊙ Q_t))
with per-kernel symmetric normalization s_k = 1/√(L_k 1)
(NORMALIZE_SYMMETRIC, pydensecrf's default) and Potts compatibility
weights w_k ∈ {POS_W, BI_W}. Unlike the truncated-window approximation,
the lattice filter L_k includes the self contribution, as pydensecrf's
does.
"""
from __future__ import annotations

import numpy as np

from scenedino_tpu.eval.crf import (
    BI_RGB_STD,
    BI_W,
    BI_XY_STD,
    MAX_ITER,
    POS_W,
    POS_XY_STD,
)


def _elevate(feat: np.ndarray) -> np.ndarray:
    """Embed (N, d) features into the sum-zero hyperplane H_d ⊂ R^{d+1},
    scaled so that the lattice blur approximates a unit Gaussian."""
    n, d = feat.shape
    inv_std_dev = np.sqrt(2.0 / 3.0) * (d + 1)
    # scale[j-1] multiplies feature j (1-indexed), j = 1..d
    j = np.arange(1, d + 1, dtype=np.float64)
    scale = inv_std_dev / np.sqrt(j * (j + 1))
    cf = feat.astype(np.float64) * scale  # (N, d)
    elevated = np.empty((n, d + 1), np.float64)
    sm = np.zeros(n, np.float64)
    for jj in range(d, 0, -1):
        elevated[:, jj] = sm - jj * cf[:, jj - 1]
        sm += cf[:, jj - 1]
    elevated[:, 0] = sm
    return elevated


class PermutohedralLattice:
    """Gaussian filtering on the permutohedral lattice.

    Build once from (N, d) features, then `compute(values)` filters any
    (N, C) signal with the (approximate) Gaussian kernel
    K_ij = exp(-|f_i - f_j|² / 2). Features should be pre-divided by
    their standard deviations.
    """

    def __init__(self, features: np.ndarray):
        n, d = features.shape
        self.n, self.d = n, d
        elevated = _elevate(features)  # (N, d+1)

        # nearest remainder-0 lattice point (multiples of d+1 per coord)
        v = elevated / (d + 1)
        rem0 = np.round(v) * (d + 1)  # (N, d+1)
        sum_ = np.rint(rem0.sum(1) / (d + 1)).astype(np.int64)  # (N,)

        # rank[i] = how many coords have a strictly larger differential
        # (ties resolved toward the earlier index, as in the C code's
        # pairwise loop: for i<j equal diffs increment rank[j])
        diff = elevated - rem0
        order = np.argsort(-diff, axis=1, kind="stable")  # (N, d+1)
        rank = np.empty_like(order)
        np.put_along_axis(rank, order, np.arange(d + 1)[None, :], axis=1)
        rank = rank + sum_[:, None]
        lo = rank < 0
        hi = rank > d
        rank = rank + np.where(lo, d + 1, 0) - np.where(hi, d + 1, 0)
        rem0 = rem0 + np.where(lo, d + 1.0, 0.0) - np.where(hi, d + 1.0, 0.0)

        # barycentric coordinates of each point in its simplex
        vbar = (elevated - rem0) / (d + 1)  # (N, d+1)
        bary = np.zeros((n, d + 2), np.float64)
        rows = np.repeat(np.arange(n), d + 1)
        np.add.at(bary, (rows, (d - rank).ravel()), vbar.ravel())
        np.add.at(bary, (rows, (d - rank + 1).ravel()), -vbar.ravel())
        bary[:, 0] += 1.0 + bary[:, d + 1]
        self.barycentric = bary[:, : d + 1]  # (N, d+1)

        # the d+1 enclosing vertex keys (first d coords; the last is
        # implied by the sum-zero constraint): vertex r adds the
        # canonical simplex offset  (rank < d+1-r ? r : r-(d+1))
        rem0i = np.rint(rem0[:, :d]).astype(np.int64)  # (N, d)
        keys = np.empty((d + 1, n, d), np.int64)
        for r in range(d + 1):
            keys[r] = rem0i + np.where(rank[:, :d] < d + 1 - r, r, r - (d + 1))
        flat_keys = keys.reshape((d + 1) * n, d)
        uniq, inverse = np.unique(flat_keys, axis=0, return_inverse=True)
        self.m = uniq.shape[0]
        # offsets[r, i] = lattice index of vertex r of point i
        self.offsets = inverse.reshape(d + 1, n)

        # neighbor tables for the blur: along axis j, n1 = key + 1
        # everywhere with the j-th coord stepping -d instead (j == d is
        # the implicit sum-zero coordinate: the stored d coords all step
        # +1), n2 the mirror. uniq is numerically-lexicographically
        # sorted (np.unique), so neighbors resolve with a searchsorted
        # over a big-endian byte packing whose byte order matches the
        # numeric order; missing neighbors get index m (a zero slot).
        self._kmin = uniq.min(0) - (d + 2)
        self._uv = self._pack(uniq)
        self.blur_n1 = np.empty((d + 1, self.m), np.int64)
        self.blur_n2 = np.empty((d + 1, self.m), np.int64)
        for ax in range(d + 1):
            off1 = np.ones(d, np.int64)
            if ax < d:
                off1[ax] = -d
            self.blur_n1[ax] = self._lookup(uniq + off1)
            self.blur_n2[ax] = self._lookup(uniq - off1)

    def _pack(self, rows: np.ndarray) -> np.ndarray:
        """Pack int64 key rows into void scalars whose bytewise order
        equals the numeric lexicographic row order (shift non-negative,
        big-endian)."""
        b = np.ascontiguousarray((rows - self._kmin).astype(">u8"))
        return b.view(np.dtype((np.void, b.dtype.itemsize * b.shape[1]))).ravel()

    def _lookup(self, queries: np.ndarray) -> np.ndarray:
        """Indices of query key rows in the sorted unique key table
        (self.m where absent)."""
        qv = self._pack(queries)
        pos = np.searchsorted(self._uv, qv)
        pos_c = np.minimum(pos, self.m - 1)
        found = self._uv[pos_c] == qv
        return np.where(found, pos_c, self.m)

    def compute(self, values: np.ndarray) -> np.ndarray:
        """Filter (N, C) values. Returns (N, C)."""
        n, d = self.n, self.d
        assert values.shape[0] == n
        c = values.shape[1]
        # splat (extra zero slot at index m for missing blur neighbors)
        lattice = np.zeros((self.m + 1, c), np.float64)
        for r in range(d + 1):
            np.add.at(
                lattice,
                self.offsets[r],
                self.barycentric[:, r : r + 1] * values,
            )
        # blur: double-buffered [1, 2, 1]/4 along each lattice direction
        for ax in range(d + 1):
            neigh = lattice[self.blur_n1[ax]] + lattice[self.blur_n2[ax]]
            lattice = np.concatenate(
                [0.5 * lattice[: self.m] + 0.25 * neigh, np.zeros((1, c))], 0
            )
        # slice (alpha compensates the center gain of the d+1 blurs)
        alpha = 1.0 / (1.0 + 2.0 ** (-d))
        out = np.zeros((n, c), np.float64)
        for r in range(d + 1):
            out += self.barycentric[:, r : r + 1] * lattice[self.offsets[r]]
        return out * alpha


def gaussian_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """One-shot normalized Gaussian filtering: weighted average of
    `values` under K_ij = exp(-|f_i-f_j|²/2) (self included)."""
    lat = PermutohedralLattice(features)
    num = lat.compute(values)
    den = lat.compute(np.ones((features.shape[0], 1)))
    return num / np.maximum(den, 1e-20)


def dense_crf_exact(
    image: np.ndarray,  # (H, W, 3) float in [0, 1]
    logits: np.ndarray,  # (H, W, C)
    n_iter: int = MAX_ITER,
) -> np.ndarray:
    """pydensecrf-equivalent mean-field CRF with exact permutohedral
    filtering. Returns refined probabilities (H, W, C). Host-side
    (numpy), like the reference's CPU pydensecrf call."""
    H, W, C = logits.shape
    n = H * W
    img255 = np.asarray(image, np.float64).reshape(n, 3) * 255.0
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float64)

    lat_pos = PermutohedralLattice(pos / POS_XY_STD)
    lat_bi = PermutohedralLattice(
        np.concatenate([pos / BI_XY_STD, img255 / BI_RGB_STD], 1)
    )
    ones = np.ones((n, 1))
    s_pos = 1.0 / np.sqrt(np.maximum(lat_pos.compute(ones), 1e-20))
    s_bi = 1.0 / np.sqrt(np.maximum(lat_bi.compute(ones), 1e-20))

    lg = np.asarray(logits, np.float64).reshape(n, C)
    lg = lg - lg.max(-1, keepdims=True)
    p = np.exp(lg)
    p /= p.sum(-1, keepdims=True)
    # unary_from_softmax: U = -log(clip(p, 1e-5, 1)); the engine works
    # with -U throughout
    unary = np.log(np.clip(p, 1e-5, 1.0))

    e = unary - unary.max(-1, keepdims=True)
    q = np.exp(e)
    q /= q.sum(-1, keepdims=True)
    for _ in range(n_iter):
        msg = POS_W * s_pos * lat_pos.compute(s_pos * q)
        msg += BI_W * s_bi * lat_bi.compute(s_bi * q)
        e = unary + msg
        e -= e.max(-1, keepdims=True)
        q = np.exp(e)
        q /= q.sum(-1, keepdims=True)
    return q.reshape(H, W, C)


def refine_segmentation_exact(image, logits, **kw):
    """argmax of exact-CRF-refined probabilities; accepts the
    framework-native (3, H, W) in [-1, 1] like eval/crf.py's
    refine_segmentation. Returns (H, W) int64 labels."""
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[0] == 3 and image.shape[-1] != 3:
        image = np.transpose(image, (1, 2, 0)) * 0.5 + 0.5
    probs = dense_crf_exact(image, np.asarray(logits), **kw)
    return np.argmax(probs, -1).astype(np.int64)
