"""BEV visualization (matplotlib).

Replaces pcdet/utils/data_viz.py (cv2-based BEV plotting, :26-342) with a
headless matplotlib implementation: point cloud rasterized in bird's-eye
view, gt boxes in green, detections in red with score annotations.
"""

from pathlib import Path

import numpy as np

from ..core.np_geometry import corners_bev


def _draw_boxes(ax, boxes, color, labels=None, scores=None):
    import matplotlib

    for i, box in enumerate(np.asarray(boxes)):
        corners = corners_bev(box[None, :7])[0]  # (4, 2)
        poly = matplotlib.patches.Polygon(
            corners, closed=True, fill=False, edgecolor=color, linewidth=0.8)
        ax.add_patch(poly)
        # heading tick from center to front-face midpoint
        front_mid = (corners[0] + corners[1]) / 2
        ax.plot([box[0], front_mid[0]], [box[1], front_mid[1]],
                color=color, linewidth=0.6)
        if scores is not None:
            ax.annotate(f'{scores[i]:.2f}', (box[0], box[1]), color=color,
                        fontsize=4)
        if labels is not None:
            ax.annotate(str(labels[i]), (box[0], box[1] + 0.8), color=color,
                        fontsize=4)


def plot_gt_boxes(points, gt_boxes, bev_range, name='bev', save_dir='.'):
    """Points + one box set -> <save_dir>/<name>.png (data_viz.py:26-100)."""
    return plot_gt_det_cmp(points, gt_boxes, None, bev_range, name=name,
                           save_dir=save_dir)


def plot_gt_det_cmp(points, gt_boxes, det_boxes, bev_range, name='bev_cmp',
                    save_dir='.', det_scores=None, det_labels=None):
    """GT (green) vs detections (red) BEV comparison (data_viz.py:150-342)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12), dpi=150)
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.05, c='0.6', linewidths=0)
    if gt_boxes is not None and len(gt_boxes):
        _draw_boxes(ax, gt_boxes, 'lime')
    if det_boxes is not None and len(det_boxes):
        _draw_boxes(ax, det_boxes, 'red', labels=det_labels, scores=det_scores)
    ax.set_xlim(bev_range[0], bev_range[3])
    ax.set_ylim(bev_range[1], bev_range[4])
    ax.set_aspect('equal')
    ax.set_facecolor('black')
    out = Path(save_dir) / f'{name}.png'
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches='tight', facecolor='black')
    plt.close(fig)
    return str(out)
