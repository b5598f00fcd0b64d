"""Visualization extras: BEV feature maps, sequence rendering, t-SNE,
AP-vs-FPS scatter.

Parity targets (all matplotlib here; the reference's open3d sequence
viewers have no headless TPU-host equivalent, so sequences render to
image stacks / GIFs instead):
  - visualization/vis_bevfeat.py (channel-reduced BEV feature heatmaps);
  - visualization/vis_utils(_mc).py (open3d point/box sequence viewer);
  - visualization/tsne/* (feature-embedding scatter, modality-colored);
  - visualization/ap_vs_fps_scatter_plot.py (benchmark scatter).
"""

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def bev_feature_to_map(bev_feature, normalize: bool = False,
                       reduce: str = "mean"):
    """(…, H, W, C) or (H, W) feature -> (H, W) display map
    (vis_bevfeat.bev_feature_to_map, channel-last convention here)."""
    f = np.asarray(bev_feature, np.float32)
    if f.ndim == 4:
        f = f[0]
    if f.ndim == 3:
        f = f.mean(axis=-1) if reduce == "mean" else f.sum(axis=-1)
    elif f.ndim != 2:
        raise ValueError("bev_feature must have 2, 3 or 4 dims")
    if normalize:
        d = f.max() - f.min()
        if d > 0:
            f = (f - f.min()) / d
    return f


def save_bev_feature(path: str, bev_feature, cmap: str = "viridis"):
    m = bev_feature_to_map(bev_feature, normalize=True)
    fig, ax = plt.subplots(figsize=(8, 8 * m.shape[0] / max(m.shape[1], 1)))
    ax.imshow(m, cmap=cmap, origin="lower")
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def render_sequence(frames: Sequence[dict], out_dir: str,
                    lidar_range=(-140.8, -40.0, -3.0, 140.8, 40.0, 1.0),
                    make_gif: bool = True, every: int = 1):
    """BEV render per frame -> numbered PNGs (+ optional GIF) — the
    headless replacement for the open3d sequence viewer
    (vis_utils_mc.visualize_sequence).

    Each frame dict: points (N,4), optional pred_corners (M,8,3),
    gt_corners (K,8,3).
    """
    from quantv2x_tpu.tools.visualize import render_bev

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, f in enumerate(frames):
        if i % every:
            continue
        p = os.path.join(out_dir, f"{i:05d}.png")
        render_bev(np.asarray(f["points"]),
                   pred_corners=f.get("pred_corners"),
                   gt_corners=f.get("gt_corners"),
                   lidar_range=lidar_range, out_path=p)
        paths.append(p)
    if make_gif and paths:
        try:
            from PIL import Image
            imgs = [Image.open(p) for p in paths]
            imgs[0].save(os.path.join(out_dir, "sequence.gif"),
                         save_all=True, append_images=imgs[1:],
                         duration=200, loop=0)
        except ImportError:
            pass
    return paths


def tsne_feature_plot(features, labels, out_path: str,
                      label_names: Optional[Sequence[str]] = None,
                      perplexity: float = 30.0, seed: int = 0,
                      max_samples: int = 2000):
    """2D t-SNE embedding of per-pixel/per-agent feature vectors colored
    by label (visualization/tsne parity; e.g. modality id or class id).

    features (N, C), labels (N,). Falls back to PCA when the sample count
    is too small for the requested perplexity.
    """
    from sklearn.decomposition import PCA

    X = np.asarray(features, np.float32).reshape(len(features), -1)
    y = np.asarray(labels)
    if len(X) > max_samples:
        sel = np.random.default_rng(seed).choice(len(X), max_samples,
                                                 replace=False)
        X, y = X[sel], y[sel]
    if len(X) > 3 * perplexity:
        from sklearn.manifold import TSNE
        emb = TSNE(n_components=2, perplexity=perplexity,
                   random_state=seed, init="pca").fit_transform(X)
        method = "t-SNE"
    else:
        emb = PCA(n_components=2).fit_transform(X)
        method = "PCA"

    fig, ax = plt.subplots(figsize=(7, 6))
    classes = np.unique(y)
    for c in classes:
        m = y == c
        name = (label_names[int(c)] if label_names is not None
                and int(c) < len(label_names) else str(c))
        ax.scatter(emb[m, 0], emb[m, 1], s=6, alpha=0.6, label=name)
    ax.legend(markerscale=2, fontsize=8)
    ax.set_title(f"{method} feature embedding")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return emb


def ap_fps_scatter(entries: Sequence[dict], out_path: str,
                   title: str = "AP@0.7 vs FPS"):
    """Benchmark scatter (ap_vs_fps_scatter_plot.py parity).

    entries: [{'name', 'ap', 'fps'}, ...]."""
    fig, ax = plt.subplots(figsize=(7, 5))
    for e in entries:
        ax.scatter(e["fps"], e["ap"], s=60)
        ax.annotate(e["name"], (e["fps"], e["ap"]),
                    textcoords="offset points", xytext=(6, 4), fontsize=8)
    ax.set_xlabel("frames / s")
    ax.set_ylabel("AP")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
