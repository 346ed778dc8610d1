"""Matplotlib helpers and style presets.

Rebuild of ``/root/reference/g3py/libs/plots.py`` with the same API names.
Backend selection is headless-safe (Agg when no display).
"""

import os

import matplotlib

if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from ..config import settings

__all__ = [
    "subplot",
    "tight_layout",
    "style_text",
    "figure",
    "plot",
    "show",
    "plot_text",
    "plot_save",
    "plot_img",
    "show_img",
    "plot_matrix",
    "grid2d",
    "plot_2d",
    "style_seaborn",
    "style_normal",
    "style_big",
    "style_big_seaborn",
    "style_widget",
]

figure = plt.figure
plot = plt.plot
show = plt.show


def style_seaborn():
    import seaborn as sb

    sb.set_theme(style="darkgrid")
    settings.plot_big = False


def style_normal():
    matplotlib.rcParams.update(
        {"figure.figsize": (10, 6), "axes.titlesize": 20, "font.size": 14}
    )
    settings.plot_big = False


def style_big():
    matplotlib.rcParams.update(
        {
            "figure.figsize": (20, 12),
            "axes.titlesize": 36,
            "font.size": 28,
            "lines.linewidth": 4,
        }
    )
    settings.plot_big = True


def style_big_seaborn():
    style_seaborn()
    style_big()
    settings.plot_big = True


def style_widget():
    matplotlib.rcParams.update({"figure.figsize": (9, 5), "font.size": 12})
    settings.plot_big = False


def plot_text(title="title", x="xlabel", y="ylabel", legend=True, ncol=3, loc="best", axis=None):
    """Title/labels/legend in one call (reference plots.py:91-103)."""
    plt.axis("tight")
    plt.title(title)
    plt.xlabel(x)
    plt.ylabel(y)
    if legend:
        plt.legend(ncol=ncol, loc=loc)
    if axis is not None:
        plt.axis(axis)


def plot_save(file="plot.pdf"):
    d = os.path.dirname(file)
    if d:
        os.makedirs(d, exist_ok=True)
    plt.savefig(file, bbox_inches="tight")


def plot_img(file="plot.png"):
    plot_save(file)
    return file


show_img = plot_img


def plot_matrix(m, cmap="seismic", title="Matrix", colorbar=True):
    m = np.asarray(m)
    v = np.max(np.abs(m)) if m.size else 1.0
    plt.imshow(m, cmap=cmap, vmax=v, vmin=-v)
    if colorbar:
        plt.colorbar()
    plt.title(title)


def grid2d(x, y):
    """Mesh over two 1-D axes returned as (pairs, X, Y)
    (reference plots.py:143-151)."""
    xx, yy = np.meshgrid(x, y)
    pairs = np.stack([xx.ravel(), yy.ravel()], axis=1)
    return pairs, xx, yy


def plot_2d(values, x2d, y2d, contour=True, surface=False):
    """Contour/surface rendering of a gridded field (reference plots.py:154-169)."""
    z = np.asarray(values).reshape(x2d.shape)
    if surface:
        ax = plt.gcf().add_subplot(111, projection="3d")
        ax.plot_surface(x2d, y2d, z, cmap="viridis")
    elif contour:
        plt.contourf(x2d, y2d, z, levels=30, cmap="viridis")
        plt.colorbar()
    else:
        plt.pcolormesh(x2d, y2d, z, cmap="viridis")


def subplot(*args, **kwargs):
    """reference plots.py:19-20"""
    return plt.subplot(*args, **kwargs)


def tight_layout(*args, **kwargs):
    """reference plots.py:23-24"""
    plt.tight_layout(*args, **kwargs)


def style_text(size=36):
    """reference plots.py:79-80"""
    plt.rcParams["legend.fontsize"] = size
