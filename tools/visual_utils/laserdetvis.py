"""Interactive point-cloud/detection viewer (mirrors
tools/visual_utils/laserdetvis.py:11-214).

The reference's LaserDetVis is a vispy SceneCanvas with keyboard stepping
(n/b = next/back, i = intensity coloring, q = quit) and wireframe boxes.
vispy is an optional GUI dependency; without it this class raises a clear
ImportError at construction, and `render_offscreen` offers a headless
matplotlib fallback with the same inputs.
"""

import numpy as np


class LaserDetVis:
    """vispy live viewer; requires `pip`-level vispy which is not part of the
    TPU pod image — constructor fails fast with guidance if missing."""

    def __init__(self, show_img=False):
        try:
            import vispy  # noqa: F401
            from vispy import color  # noqa: F401
            from vispy.scene import SceneCanvas, visuals
        except ImportError as e:
            raise ImportError(
                'vispy is required for the interactive LaserDetVis viewer; '
                'use tools.visual_utils.visualize_utils.draw_scenes or '
                'LaserDetVis.render_offscreen for headless rendering'
            ) from e
        self.show_img = show_img
        self.canvas_size = (1920, 1920)
        self.running = True
        self.intensity_mode = False
        self.canvas = SceneCanvas(keys='interactive', show=True,
                                  size=self.canvas_size)
        self.canvas.events.key_press.connect(self._on_key)
        self.grid = self.canvas.central_widget.add_grid()
        self.view = self.grid.add_view()
        self.view.camera = 'turntable'
        self.scan_vis = visuals.Markers()
        self.line_vis = visuals.Line(connect='segments', method='gl')
        self.view.add(self.scan_vis)
        self.view.add(self.line_vis)
        self.on_next = None
        self.on_back = None

    def is_running(self):
        return self.running

    def _on_key(self, event):
        key = str(event.key).lower()
        if key == 'q' or key == 'escape':
            self.running = False
            self.canvas.close()
        elif key == 'i':
            self.intensity_mode = not self.intensity_mode
        elif key == 'n' and self.on_next:
            self.on_next()
        elif key == 'b' and self.on_back:
            self.on_back()

    def update(self, points, boxes=None, labels=None):
        """Push a cloud + boxes into the live canvas
        (laserdetvis.py:120-180)."""
        colors = _intensity_colors(points) if (
            self.intensity_mode and points.shape[1] >= 4) else 'white'
        self.scan_vis.set_data(points[:, :3], face_color=colors,
                               edge_width=0, size=1.5)
        if boxes is not None and len(boxes):
            segs, cols = box_wire_segments(boxes, labels)
            self.line_vis.set_data(pos=segs, color=cols, width=1.5)

    def run(self):
        import vispy
        vispy.app.run()

    @staticmethod
    def render_offscreen(points, boxes=None, scores=None, labels=None,
                         save_path=None):
        """Headless fallback with the same data contract."""
        from .visualize_utils import draw_scenes
        return draw_scenes(points, ref_boxes=boxes, ref_scores=scores,
                           ref_labels=labels, save_path=save_path)


def _intensity_colors(points):
    intensity = points[:, 3]
    lo, hi = intensity.min(), intensity.max()
    t = (intensity - lo) / max(hi - lo, 1e-6)
    import matplotlib.cm as cm
    return cm.get_cmap('viridis')(t)


def box_wire_segments(boxes, labels=None):
    """(N, 7) boxes -> (N*24, 3) wireframe segment endpoints + colors
    (laserdetvis.py:50-118's compute_box_3d + line assembly)."""
    from lidardetection_tpu.core.np_geometry import boxes_to_corners_3d
    palette = np.array([(0, 1, 0, 1), (1, 1, 0, 1), (0, 1, 1, 1),
                        (1, 0, 1, 1), (1, 0, 0, 1)], np.float32)
    corners = boxes_to_corners_3d(np.asarray(boxes)[:, :7])  # (N, 8, 3)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    segs, cols = [], []
    for n, c in enumerate(corners):
        color = palette[int(labels[n]) % len(palette)] if labels is not None \
            else palette[0]
        for i, j in edges:
            segs.append(c[i])
            segs.append(c[j])
            cols.append(color)
            cols.append(color)
    return np.asarray(segs, np.float32), np.asarray(cols, np.float32)
