"""Shared helpers for the tutorial examples (headless-safe)."""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "output")


def save_fig(name):
    os.makedirs(OUT, exist_ok=True)
    plt.savefig(os.path.join(OUT, name), bbox_inches="tight", dpi=80)
    plt.close("all")


def sine_data(n=60, noise=0.15, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 10, n).astype(np.float32)
    y = (np.sin(x) + noise * rng.standard_normal(n)).astype(np.float32)
    return x.reshape(-1, 1), y
