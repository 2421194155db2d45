"""Page-bitmap preprocessing chain (SURVEY.md §2.3).

Numpy-only reimplementation of the reference's ``preprocess_image``
pipeline (/root/reference/pdf2ocr/ocr.py:77-186): grayscale, autocontrast,
median filter, edge-preserving denoise, adaptive-equalization (CLAHE slot),
sharpen, contrast boost, unsharp mask, and the two safety guards (std<10
revert, whole-chain exception revert).

The container has no PIL/scipy/skimage, so this module IS the engine's
kernel implementation (not a shim): each step is a vectorized numpy op
with pinned dtypes (uint8 in/out, float64 intermediate) for bit-stable
determinism across partitionings. Where the reference falls back on
ImportError (ocr.py:116-119, :136-139, :162-168) we implement the fallback
semantics directly: global histogram equalization stands in for CLAHE, as
in the reference's autocontrast-cutoff fallback.
"""

from __future__ import annotations

import numpy as np


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """RGB->luma (ITU-R 601, the PIL 'L' weights) or passthrough if 2-D."""
    if img.ndim == 2:
        return img.astype(np.uint8, copy=False)
    w = np.array([0.299, 0.587, 0.114])
    return np.clip(img.astype(np.float64) @ w, 0, 255).astype(np.uint8)


def autocontrast(img: np.ndarray, cutoff: int = 0) -> np.ndarray:
    """Histogram stretch to full range, optionally ignoring ``cutoff``% of
    the lightest/darkest pixels (PIL.ImageOps.autocontrast semantics)."""
    h = np.bincount(img.ravel(), minlength=256)
    n = img.size
    if cutoff:
        cut = n * cutoff // 100
        csum = np.cumsum(h)
        lo = int(np.searchsorted(csum, cut, side="right"))
        hi = int(np.searchsorted(csum, n - cut, side="left"))
    else:
        nz = np.nonzero(h)[0]
        if len(nz) == 0:
            return img
        lo, hi = int(nz[0]), int(nz[-1])
    if hi <= lo:
        return img
    scale = 255.0 / (hi - lo)
    lut = np.clip((np.arange(256) - lo) * scale, 0, 255).astype(np.uint8)
    return lut[img]


def median3(img: np.ndarray) -> np.ndarray:
    """3x3 median filter, edge-replicated (PIL MedianFilter semantics)."""
    p = np.pad(img, 1, mode="edge")
    stack = np.stack(
        [p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
         for dy in range(3) for dx in range(3)]
    )
    return np.median(stack, axis=0).astype(np.uint8)


def _gauss_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(3 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian, float64, edge-replicated."""
    k = _gauss_kernel(sigma)
    r = len(k) // 2
    f = img.astype(np.float64)
    p = np.pad(f, ((0, 0), (r, r)), mode="edge")
    f = np.apply_along_axis(lambda row: np.convolve(row, k, mode="valid"), 1, p)
    p = np.pad(f, ((r, r), (0, 0)), mode="edge")
    f = np.apply_along_axis(lambda col: np.convolve(col, k, mode="valid"), 0, p)
    return f


def sobel_x(img: np.ndarray) -> np.ndarray:
    """Single-axis Sobel derivative along the last axis — what the
    reference's ``ndimage.sobel(img)`` computes (ocr.py:109, default
    axis=-1); the edge mask is |sobel_x|, not the 2-axis magnitude.
    Boundary handling is edge-replicate (scipy defaults to reflect; the
    difference touches only the 1-pixel border, which is paper margin by
    construction)."""
    f = img.astype(np.float64)
    p = np.pad(f, 1, mode="edge")
    return (
        p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
        - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2]
    )


def edge_preserving_denoise(img: np.ndarray) -> np.ndarray:
    """Reference ocr.py:104-115: gaussian sigma=0.5 everywhere, but keep
    the original pixel where |sobel| exceeds its 80th percentile; elsewhere
    blend 0.7*blur + 0.3*original."""
    blur = gaussian_blur(img, 0.5)
    edges = np.abs(sobel_x(img))
    thresh = np.percentile(edges, 80)
    orig = img.astype(np.float64)
    blended = 0.7 * blur + 0.3 * orig
    out = np.where(edges > thresh, orig, blended)
    return np.clip(out, 0, 255).astype(np.uint8)


def equalize(img: np.ndarray) -> np.ndarray:
    """Global histogram equalization — the engine's stand-in for the CLAHE
    slot (reference fallback semantics, ocr.py:136-139)."""
    h = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    cdf = np.cumsum(h)
    nz = cdf[cdf > 0]
    if len(nz) == 0:
        return img
    cdf_min = nz[0]
    denom = cdf[-1] - cdf_min
    if denom <= 0:
        return img
    lut = np.clip(np.round((cdf - cdf_min) / denom * 255), 0, 255).astype(np.uint8)
    return lut[img]


def clahe(
    img: np.ndarray,
    kernel_size: int = None,
    clip_limit: float = 0.01,
    nbins: int = 256,
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization — the PROPER
    implementation of the §2.3 adaptive-contrast slot (reference
    ocr.py:122-135 calls skimage.exposure.equalize_adapthist with
    kernel_size=max(32, h//16), clip_limit=0.01, nbins=256; this is the
    standard tiled CLAHE with uniform excess redistribution and bilinear
    interpolation between tile mappings, written in numpy).

    The default preprocess chain intentionally keeps the reference's own
    no-skimage fallback (autocontrast(cutoff=1)) because this container
    HAS no skimage — matching what the reference itself computes here —
    and because global equalization families destroy the ink/paper
    separation the deterministic decoder depends on; pass
    ``adaptive=True`` to :func:`preprocess_page` to run this instead.
    """
    h, w = img.shape
    ks = kernel_size or max(32, h // 16)
    nty = max(1, (h + ks - 1) // ks)
    ntx = max(1, (w + ks - 1) // ks)

    # per-tile clipped-histogram mappings -> (nty, ntx, nbins) LUT
    luts = np.empty((nty, ntx, nbins), dtype=np.float64)
    scale = (nbins - 1) / 255.0
    binned = (img.astype(np.float64) * scale + 0.5).astype(np.int64)
    for ty in range(nty):
        y0, y1 = ty * ks, min((ty + 1) * ks, h)
        for tx in range(ntx):
            x0, x1 = tx * ks, min((tx + 1) * ks, w)
            tile = binned[y0:y1, x0:x1]
            hist = np.bincount(tile.ravel(), minlength=nbins).astype(np.float64)
            n = tile.size
            clip = max(1.0, clip_limit * n)
            excess = np.maximum(hist - clip, 0.0).sum()
            hist = np.minimum(hist, clip) + excess / nbins
            cdf = np.cumsum(hist)
            luts[ty, tx] = cdf / cdf[-1] * 255.0

    # bilinear interpolation between the 4 surrounding tile centers
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    fy = np.clip((ys - ks / 2.0) / ks, 0.0, nty - 1.0)
    fx = np.clip((xs - ks / 2.0) / ks, 0.0, ntx - 1.0)
    ty0 = np.floor(fy).astype(np.int64)
    tx0 = np.floor(fx).astype(np.int64)
    ty1 = np.minimum(ty0 + 1, nty - 1)
    tx1 = np.minimum(tx0 + 1, ntx - 1)
    wy = (fy - ty0)[:, None]
    wx = (fx - tx0)[None, :]

    ty0c = ty0[:, None]
    ty1c = ty1[:, None]
    tx0r = tx0[None, :]
    tx1r = tx1[None, :]
    v00 = luts[ty0c, tx0r, binned]
    v01 = luts[ty0c, tx1r, binned]
    v10 = luts[ty1c, tx0r, binned]
    v11 = luts[ty1c, tx1r, binned]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def sharpen(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Sharpness-style: blend toward a 3x3 smoothed copy
    (factor>1 sharpens). Reference uses 1.2 (ocr.py:143-145)."""
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    smooth = sum(
        p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
        for dy in range(3) for dx in range(3)
    ) / 9.0
    out = smooth + (img.astype(np.float64) - smooth) * factor
    return np.clip(out, 0, 255).astype(np.uint8)


def contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Contrast-style: blend from the mean-gray image.
    Reference uses 1.1 (ocr.py:147-149)."""
    mean = round(img.astype(np.float64).mean())
    out = mean + (img.astype(np.float64) - mean) * factor
    return np.clip(out, 0, 255).astype(np.uint8)


def unsharp_mask(img: np.ndarray, sigma: float = 1.0, amount: float = 0.2) -> np.ndarray:
    """Reference ocr.py:153-161: img + amount*(img - gaussian(sigma))."""
    blur = gaussian_blur(img, sigma)
    out = img.astype(np.float64) + amount * (img.astype(np.float64) - blur)
    return np.clip(out, 0, 255).astype(np.uint8)


def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's between-class-variance-maximizing threshold (the standard
    OCR binarization step; deterministic argmax with lowest-index ties)."""
    h = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = h.sum()
    if total == 0:
        return 128
    omega = np.cumsum(h) / total
    mu = np.cumsum(h * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    return int(np.nanargmax(sigma_b))


def preprocess_page(img: np.ndarray, adaptive: bool = False) -> np.ndarray:
    """The full chain with both reference guards (ocr.py:170-184): if the
    result collapses (std < 10) revert to the Step-1 array (grayscale +
    autocontrast + median — ocr.py:93-98 keeps exactly that as
    ``original_array``); if any step raises, revert to Step-1 and apply the
    reference's exception fallback on top (autocontrast(cutoff=2) +
    median, ocr.py:176-184).

    ``adaptive=True`` runs the real CLAHE in the Step-3 slot (what the
    reference computes when skimage is importable, ocr.py:122-135);
    the default keeps the reference's own ImportError fallback — see
    :func:`clahe`."""
    gray = to_grayscale(img)
    step1 = median3(autocontrast(gray))
    try:
        out = edge_preserving_denoise(step1)
        # CLAHE slot: the container has no skimage, so the chain uses the
        # reference's own ImportError fallback — autocontrast(cutoff=1)
        # (ocr.py:136-139). Full-histogram equalize() stays available as a
        # standalone op but is NOT in the chain: global equalization of a
        # mostly-paper page amplifies paper noise to full range and
        # destroys the ink/paper separation every binarizer depends on.
        out = clahe(out) if adaptive else autocontrast(out, cutoff=1)
        out = sharpen(out, 1.2)
        out = contrast(out, 1.1)
        out = unsharp_mask(out, 1.0, 0.2)
        if float(np.std(out.astype(np.float64))) < 10.0:
            return step1
        return out
    except Exception:
        return median3(autocontrast(step1, cutoff=2))
