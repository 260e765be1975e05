"""Prediction visualization: 3-panel matplotlib figure.

Reference equivalent: ``tools/visualization.py:9-110``
(``visualize_prediction``): input RGB | ground truth | prediction, with a
``ListedColormap`` built from per-class hex colors; >3-band inputs are
truncated to their first three bands for display.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from geo_deep_learning_tpu.utils.tensors import denormalization


def visualize_prediction(
    image: np.ndarray,
    mask: np.ndarray,
    prediction: np.ndarray,
    mean: np.ndarray | None = None,
    std: np.ndarray | None = None,
    class_colors: Sequence[str] | None = None,
    num_classes: int = 2,
    sample_name: str = "",
    save_path: str | None = None,
):
    """Render one sample. ``image`` is HWC (standardized), ``mask`` and
    ``prediction`` are HW integer maps. Returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    if np.asarray(image).dtype == np.uint8:
        img = np.asarray(image)  # raw pixels (device-preprocess pipelines)
    else:
        img = np.asarray(denormalization(image, mean, std))
    if img.shape[-1] > 3:
        img = img[..., :3]
    elif img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)

    if class_colors:
        cmap = ListedColormap(list(class_colors))
    else:
        cmap = plt.get_cmap("tab10", num_classes)

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(img)
    axes[0].set_title(f"Image {sample_name}")
    axes[1].imshow(np.asarray(mask), cmap=cmap, vmin=0, vmax=num_classes - 1)
    axes[1].set_title("Ground truth")
    axes[2].imshow(np.asarray(prediction), cmap=cmap, vmin=0, vmax=num_classes - 1)
    axes[2].set_title("Prediction")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
    return fig
