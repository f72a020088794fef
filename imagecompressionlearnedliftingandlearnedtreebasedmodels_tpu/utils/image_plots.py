"""Image/subband visualization (reference ``utils/image_plots.py`` +
``show_wavelet_coeff`` at ``lifting_dwt_nets.py:393-410``).

All functions accept NHWC arrays and return/show matplotlib figures;
``wavelet_pyramid`` draws the classic nested LL/LH/HL/HH montage used when
``imshow_validation`` is on.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def display_image_in_actual_size(img: np.ndarray, out_path: Optional[str]
                                 = None):
    """Show/save an image at 1:1 pixel scale (reference
    ``display_image_in_actual_size``)."""
    plt = _plt()
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    h, w = img.shape[:2]
    dpi = 100
    fig = plt.figure(figsize=(w / dpi, h / dpi), dpi=dpi)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.axis("off")
    ax.imshow(np.clip(img.squeeze(), 0, 1), cmap="gray"
              if img.shape[-1] == 1 else None)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def plot_rgb_histogram(img: np.ndarray, out_path: Optional[str] = None):
    plt = _plt()
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    fig, ax = plt.subplots()
    for c, name in enumerate("rgb"):
        ax.hist(img[..., c].ravel(), bins=64, alpha=0.5, label=name,
                color=name)
    ax.legend()
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig


def wavelet_pyramid(xe: np.ndarray, xo_list: List[np.ndarray],
                    out_path: Optional[str] = None) -> np.ndarray:
    """Assemble the nested wavelet-pyramid montage image from NHWC subbands
    (LL top-left; per level LH top-right, HL bottom-left, HH bottom-right).
    Returns the montage array; optionally saves a figure."""
    from ..ops.dwt97 import unpack_details

    def norm(a):
        a = np.asarray(a)[0, ..., 0]
        rng = np.abs(a).max() + 1e-9
        return 0.5 + 0.5 * a / rng

    canvas = norm(xe)
    for xo in reversed(xo_list):
        lh, hl, hh = unpack_details(np.asarray(xo))
        top = np.concatenate([canvas, norm(lh)], axis=1)
        bot = np.concatenate([norm(hl), norm(hh)], axis=1)
        canvas = np.concatenate([top, bot], axis=0)
    if out_path:
        plt = _plt()
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(canvas, cmap="gray")
        ax.axis("off")
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
    return canvas
