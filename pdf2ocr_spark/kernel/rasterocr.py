"""Deterministic rasterize -> preprocess -> decode OCR model.

The reference OCRs scanned pages with the Tesseract binary
(/root/reference/pdf2ocr/ocr.py:244-265) — a non-deterministic native
dependency that is out of scope for a reproducible engine (SURVEY.md §7).
This module implements the engine's deterministic equivalent of the
render+recognize round trip:

1. ``render_page``: rasterize text onto a synthetic "scan" with natural
   statistics — ink pixels ~U[0,50], paper ~U[200,255], seeded from the
   page text — using a glyph font derived from md5(char): each glyph is a
   5x7 bit pattern drawn as 3x3-pixel blocks (so glyph structure survives
   the 3x3 median filter in the preprocess chain).
2. the full :mod:`imageproc` preprocess chain runs on the bitmap (this is
   the real vectorized kernel work, same as the reference's pipeline);
3. ``decode_page``: per-cell adaptive threshold (what Tesseract's
   binarizer does; a global threshold cannot survive histogram
   equalization, which is rank-preserving but value-collapsing) +
   nearest-template match over the glyph codebook.

The trip is deterministic end-to-end: identical text -> identical noise
-> identical preprocessing -> identical decode, independent of
partitioning. Residual decode errors (sharpen/unsharp overshoot flipping
a bit near an edge) are DETERMINISTIC OCR noise — precisely the artifact
class the reference's downstream cleanup stages exist to repair.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import List

import numpy as np

from pdf2ocr_spark.kernel.imageproc import preprocess_page

GLYPH_COLS = 5
GLYPH_ROWS = 7
BLOCK = 3  # pixels per glyph bit (median-filter safe)
CELL_W = (GLYPH_COLS + 1) * BLOCK  # 1 blank column between glyphs
CELL_H = (GLYPH_ROWS + 1) * BLOCK  # 1 blank row between lines
MARGIN = 3 * BLOCK  # paper border wide enough to escape unsharp overshoot (3px)
PAGE_COLS = 64  # chars per rendered line

#: printable chars the font covers; everything else renders as space
CHARSET = (
    " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    ".,;:?!()[]{}-\"'•–—▪\n"
)


@lru_cache(maxsize=None)
def _glyph(ch: str) -> np.ndarray:
    """5x7 bit pattern for a char, derived from md5 so every glyph is
    unique, deterministic, and has balanced ink."""
    if ch == " ":
        return np.zeros((GLYPH_ROWS, GLYPH_COLS), dtype=bool)
    digest = hashlib.md5(f"glyph:{ch}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_ROWS * GLYPH_COLS]
    g = bits.reshape(GLYPH_ROWS, GLYPH_COLS).astype(bool)
    g[0, 0] = True  # anchor bit: no non-space glyph is ever blank
    return g


@lru_cache(maxsize=None)
def _decode_table() -> dict:
    return {
        _glyph(ch).tobytes(): ch for ch in CHARSET if ch not in (" ", "\n")
    }


def _layout(text: str) -> List[str]:
    """Hard-wrap text into PAGE_COLS-char render lines, preserving
    explicit newlines (each source line may span several render lines)."""
    out: List[str] = []
    for src_line in text.split("\n"):
        if not src_line:
            out.append("")
            continue
        for i in range(0, len(src_line), PAGE_COLS):
            out.append(src_line[i : i + PAGE_COLS])
    return out


def render_page(text: str) -> np.ndarray:
    """Rasterize to uint8 grayscale with scan-like statistics: ink pixels
    ~U[0,50] on paper ~U[200,255], noise seeded from the page text (same
    text -> bit-identical bitmap)."""
    lines = _layout(text)
    # width tracks the longest line: a fixed wide page would leave short
    # pages <1% ink, and the chain's autocontrast(cutoff=1) clips the
    # darkest 1% — sparse ink must stay above the cutoff's mass
    n_cols = max(1, max((len(l) for l in lines), default=1))
    h = max(1, len(lines)) * CELL_H + 2 * MARGIN
    w = n_cols * CELL_W + 2 * MARGIN
    seed = int.from_bytes(hashlib.md5(f"scan:{text}".encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    img = rng.integers(200, 256, size=(h, w), dtype=np.int64).astype(np.uint8)
    ink = rng.integers(0, 51, size=(h, w), dtype=np.int64).astype(np.uint8)
    for row, line in enumerate(lines):
        y0 = row * CELL_H + MARGIN
        for col, ch in enumerate(line):
            g = _glyph(ch if ch in CHARSET else " ")
            if not g.any():
                continue
            x0 = col * CELL_W + MARGIN
            block = np.kron(g, np.ones((BLOCK, BLOCK), dtype=bool))
            ys_, xs_ = np.nonzero(block)
            img[y0 + ys_, x0 + xs_] = ink[y0 + ys_, x0 + xs_]
    return img


@lru_cache(maxsize=None)
def _codebook() -> tuple:
    """(chars, bit-matrix) for nearest-template matching."""
    chars = [ch for ch in CHARSET if ch not in (" ", "\n")]
    mat = np.stack([_glyph(ch).ravel() for ch in chars])
    return chars, mat


MAX_TEMPLATE_HAMMING = 8  # beyond this, the cell decodes as unreadable
MIN_GLYPH_BITS = 4  # fewer sampled ink bits than this -> stray noise, not a glyph


def decode_page(img: np.ndarray) -> str:
    """Invert of render_page over a (possibly preprocessed) bitmap.

    Binarization threshold: the minimum value of the page's top border
    rows, which are paper by construction. The preprocess chain is
    rank-monotone on the ink/paper populations (every grayscale map is
    monotone; the local filters only perturb near glyph edges), so
    "strictly below the darkest border paper" identifies ink after ANY of
    the chain's global remaps — including histogram equalization, which
    defeats value- and variance-based thresholds (flat histogram). Then
    sample the 35 block centers per cell and nearest-template match with
    a Hamming cap; cells with fewer than MIN_GLYPH_BITS ink samples are
    paper (absorbs sharpen/unsharp overshoot near edges).
    """
    chars_cb, mat = _codebook()
    thresh = int(img[:3, :].min())  # outermost border rows: pure paper
    dark = img < thresh
    lines: List[str] = []
    n_rows = (img.shape[0] - 2 * MARGIN) // CELL_H
    n_cols = (img.shape[1] - 2 * MARGIN) // CELL_W
    ys = np.arange(GLYPH_ROWS) * BLOCK + BLOCK // 2
    xs = np.arange(GLYPH_COLS) * BLOCK + BLOCK // 2
    for row in range(n_rows):
        y0 = row * CELL_H + MARGIN
        chars: List[str] = []
        for col in range(n_cols):
            x0 = col * CELL_W + MARGIN
            bits = dark[np.ix_(y0 + ys, x0 + xs)].ravel()
            if np.count_nonzero(bits) < MIN_GLYPH_BITS:
                chars.append(" ")
                continue
            dists = np.count_nonzero(mat != bits, axis=1)
            best = int(np.argmin(dists))
            chars.append(
                chars_cb[best] if dists[best] <= MAX_TEMPLATE_HAMMING else "�"
            )
        lines.append("".join(chars).rstrip())
    return "\n".join(lines)


def ocr_roundtrip(text: str) -> str:
    """render -> full preprocess chain -> decode. Deterministic; accuracy
    is high but not exact (see module doc — residual errors model OCR
    noise). Unsupported chars decode as spaces (they render as spaces)."""
    img = render_page(text)
    processed = preprocess_page(img)
    decoded = decode_page(processed)
    # undo the hard wrap: render lines belonging to one source line rejoin
    src_lines = _layout(text)
    out_lines = decoded.split("\n")
    rebuilt: List[str] = []
    idx = 0
    for src_line in text.split("\n"):
        n_chunks = max(1, (len(src_line) + PAGE_COLS - 1) // PAGE_COLS)
        rebuilt.append("".join(out_lines[idx : idx + n_chunks]))
        idx += n_chunks
    assert idx == len(src_lines) or not src_lines
    return "\n".join(rebuilt)
