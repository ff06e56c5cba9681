"""Synthetic LiDAR scene dataset.

Plays the role of the reference's fake-lidar scene generators
(pcdet/datasets/plusai/fake_lidar_dataset/gen_fake_lidar.py,
gen_test_scene.py): deterministic procedurally-generated scenes with known
boxes, used for unit tests, e2e train/eval smoke runs and benchmarking when
no real KITTI/NuScenes data is mounted.
"""

import numpy as np

from .dataset import DatasetTemplate

CLASS_SIZE = {
    'Car': (3.9, 1.6, 1.56),
    'Pedestrian': (0.8, 0.6, 1.73),
    'Cyclist': (1.76, 0.6, 1.73),
    # fork/Livox/Mix classes (livox_models/*.yaml anchor sizes)
    'Truck': (6.4, 2.5, 3.5),
    'Tram': (11.2, 2.9, 4.0),
}
CLASS_Z = {'Car': -1.0, 'Pedestrian': -0.73, 'Cyclist': -0.73,
           'Truck': 0.0, 'Tram': 0.0}
_DEFAULT_SIZE, _DEFAULT_Z = (4.0, 1.8, 1.6), -1.0  # unknown class fallback


def _beam_ground(rng, point_cloud_range, num_ground):
    """Ground returns of a spinning lidar: concentric per-beam rings.

    Real scans (HDL-64-class sensors, the KITTI recording rig) cluster
    ground points along per-beam rings with radial density falloff —
    neighboring returns share voxels and stride-2 sparse stages SHRINK.
    The previous uniform scatter was the adversarial worst case for the
    sparse backbones (every point an isolated voxel that dilates up to 8x
    per downsample), saturating every stage capacity; no physical sensor
    produces it.
    """
    x1, y1, z1, x2, y2, z2 = (float(v) for v in point_cloud_range[:6])
    h = 1.73  # sensor height above ground
    elev = np.deg2rad(np.linspace(-24.9, -1.8, 64))  # beam elevations
    radii = h / np.tan(-elev)
    r_max = float(np.hypot(max(abs(x1), abs(x2)), max(abs(y1), abs(y2))))
    radii = radii[radii < r_max]
    dphi = np.deg2rad(0.2)  # sensor azimuth resolution
    phis = np.arange(-np.pi, np.pi, dphi)
    r = np.repeat(radii, len(phis))
    phi = np.tile(phis, len(radii))
    # surface roughness: range + height jitter
    r = r * (1.0 + rng.randn(r.size) * 0.004)
    phi = phi + rng.randn(r.size) * (dphi * 0.1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    inside = (x > x1) & (x < x2) & (y > y1) & (y < y2)
    x, y = x[inside], y[inside]
    if x.size > num_ground:
        # thin by striding the flattened az order: keeps ring structure
        # (uniform arc spacing) instead of random gaps
        step = x.size / num_ground
        keep = (np.arange(num_ground) * step).astype(np.int64)
        x, y = x[keep], y[keep]
    z = np.full_like(x, -h) + rng.randn(x.size) * 0.03
    inten = rng.rand(x.size)
    return np.stack([x, y, z, inten], axis=1)


def make_scene(rng, point_cloud_range, num_objects=8, points_per_obj=120,
               num_ground=18000, class_names=('Car', 'Pedestrian', 'Cyclist')):
    """One scene: beam-ring ground returns + points on object box surfaces."""
    x1, y1, z1, x2, y2, z2 = point_cloud_range
    gt_boxes, gt_names, obj_points = [], [], []
    for _ in range(num_objects):
        name = class_names[rng.randint(len(class_names))]
        dx, dy, dz = CLASS_SIZE.get(name, _DEFAULT_SIZE)
        diag = float(np.hypot(dx, dy))
        # rejection-sample a non-overlapping placement: overlapping gt makes
        # even perfect detections lose AP (ambiguous greedy matching in the
        # official eval), which would mask real regressions in train-to-AP
        # gates
        for _attempt in range(50):
            cx = rng.uniform(x1 + 5, x2 - 5)
            cy = rng.uniform(y1 + 5, y2 - 5)
            ok = all(
                np.hypot(cx - b[0], cy - b[1])
                > (diag + np.hypot(b[3], b[4])) / 2 + 0.5
                for b in gt_boxes)
            if ok:
                break
        else:
            continue  # crowded range: drop the object rather than overlap
        cz = CLASS_Z.get(name, _DEFAULT_Z)
        heading = rng.uniform(-np.pi, np.pi)
        sx = rng.uniform(0.9, 1.15)
        box = [cx, cy, cz, dx * sx, dy * sx, dz * sx, heading]
        gt_boxes.append(box)
        gt_names.append(name)
        # points on the two visible faces + top, in local frame
        n = points_per_obj
        u = rng.rand(n)
        v = rng.rand(n)
        face = rng.randint(0, 3, n)
        lx = np.where(face == 0, (u - 0.5) * dx, np.where(face == 1, -dx / 2, (u - 0.5) * dx))
        ly = np.where(face == 0, -dy / 2, np.where(face == 1, (u - 0.5) * dy, (rng.rand(n) - 0.5) * dy))
        lz = np.where(face == 2, dz / 2, (v - 0.5) * dz)
        ca, sa = np.cos(heading), np.sin(heading)
        px = lx * ca - ly * sa + cx
        py = lx * sa + ly * ca + cy
        pz = lz * sx + cz
        inten = rng.rand(n).astype(np.float32)
        obj_points.append(np.stack([px, py, pz, inten], axis=1))

    ground = _beam_ground(rng, point_cloud_range, num_ground)
    points = np.concatenate([ground] + obj_points, axis=0).astype(np.float32)
    return points, np.array(gt_boxes, np.float32), np.array(gt_names)


class SyntheticDataset(DatasetTemplate):
    """Deterministic synthetic scenes following the DatasetTemplate protocol."""

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None, num_scenes=64, seed=0):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path or '.',
                         logger=logger)
        self.num_scenes = num_scenes
        self.seed = seed
        # multiframe mode: emit per-box frame poses (locations/rotations_y)
        # like the fork's multiframe datasets
        self.stack_frame_size = int(dataset_cfg.get('STACK_FRAME_SIZE', 0))

    def __len__(self):
        return self.num_scenes

    def __getitem__(self, index):
        rng = np.random.RandomState(self.seed * 100003 + index)
        points, gt_boxes, gt_names = make_scene(
            rng, self.point_cloud_range, class_names=self.class_names)
        if self.dataset_cfg.get('PRED_VELOCITY', False):
            # velocity-coded gt (NuScenes layout [..., ry, vx, vy]); the
            # 9-dim ResidualCoder needs these columns present
            vel = (rng.randn(len(gt_boxes), 2) * 2.0).astype(np.float32)
            gt_boxes = np.concatenate([gt_boxes, vel], axis=1)
        data_dict = {
            'points': points,
            'gt_boxes': gt_boxes,
            'gt_names': gt_names,
            'frame_id': index,
        }
        if self.stack_frame_size > 0:
            t = self.stack_frame_size
            n = len(gt_boxes)
            vel = rng.randn(n, 2) * 1.0  # m/frame
            locations = np.repeat(gt_boxes[:, None, 0:3], t, axis=1)
            for i in range(t):
                locations[:, i, 0:2] -= vel * (t - 1 - i)
            rotations_y = np.repeat(gt_boxes[:, None, 6], t, axis=1)
            data_dict['locations'] = locations.astype(np.float32)
            data_dict['rotations_y'] = rotations_y.astype(np.float32)
        return self.prepare_data(data_dict)

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i in range(batch_dict['batch_size']):
            n = int(pred_dicts['num_preds'][i])
            boxes = np.asarray(pred_dicts['pred_boxes'][i][:n])
            labels = np.asarray(pred_dicts['pred_labels'][i][:n]).astype(int)
            names = np.array([class_names[l - 1] for l in labels])
            scores = np.asarray(pred_dicts['pred_scores'][i][:n])
            anno = kitti_anno_from_lidar(boxes, names, scores)
            anno['frame_id'] = batch_dict['frame_id'][i]
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official KITTI-protocol AP against the generating gt boxes.

        Synthetic scenes have exact gt, so the same eval the reference runs
        on KITTI (kitti_dataset.py:322 -> eval.py:639) applies directly —
        the accuracy gate for train-to-AP harnesses (tools/train_to_ap run).
        """
        from .kitti.kitti_object_eval import eval as kitti_eval

        gt_annos = []
        for det in det_annos:
            index = int(det['frame_id'])
            rng = np.random.RandomState(self.seed * 100003 + index)
            _, gt_boxes, gt_names = make_scene(
                rng, self.point_cloud_range, class_names=self.class_names)
            gt_annos.append(kitti_anno_from_lidar(gt_boxes, gt_names))
        return kitti_eval.get_official_eval_result(
            gt_annos, det_annos, class_names)


class SyntheticCalib:
    """Canonical lidar->rect mapping (x_c=-y_l, y_c=-z_l, z_c=x_l) plus a
    wide synthetic pinhole (f=1000, 2000x6000 image) so boxes anywhere in
    the point-cloud range project to image bboxes large enough for the
    KITTI difficulty gates (MIN_HEIGHT 40/25/25 px, eval.py protocol)."""

    IMAGE_SHAPE = (2000, 6000)  # (H, W)

    def __init__(self):
        self.V2C = np.array([[0., -1., 0., 0.],
                             [0., 0., -1., 0.],
                             [1., 0., 0., 0.]])
        self.R0 = np.eye(3)
        self.P2 = np.array([[1000., 0., 3000., 0.],
                            [0., 1000., 1000., 0.],
                            [0., 0., 1., 0.]])

    def lidar_to_rect(self, pts_lidar):
        hom = np.concatenate(
            [pts_lidar, np.ones((pts_lidar.shape[0], 1))], axis=1)
        return hom @ (self.V2C.T @ self.R0.T)

    def rect_to_img(self, pts_rect):
        hom = np.concatenate(
            [pts_rect, np.ones((pts_rect.shape[0], 1))], axis=1)
        p = hom @ self.P2.T
        z = np.maximum(p[:, 2], 0.1)  # clamp behind-camera points
        img = p[:, 0:2] / z[:, None]
        return img, p[:, 2] - self.P2.T[3, 2]


def kitti_anno_from_lidar(boxes_lidar, names, scores=None):
    """Lidar boxes (N, 7) -> full KITTI camera-protocol anno dict."""
    from ..core import np_geometry as npg

    calib = SyntheticCalib()
    n = len(boxes_lidar)
    boxes_lidar = np.asarray(boxes_lidar, np.float64).reshape(n, 7)
    if n:
        cam = npg.boxes3d_lidar_to_kitti_camera(boxes_lidar, calib)
        bbox = npg.boxes3d_kitti_camera_to_imageboxes(
            cam, calib, image_shape=SyntheticCalib.IMAGE_SHAPE)
        alpha = (-np.arctan2(-boxes_lidar[:, 1], boxes_lidar[:, 0])
                 + cam[:, 6])
    else:
        cam = np.zeros((0, 7))
        bbox = np.zeros((0, 4))
        alpha = np.zeros(0)
    return {
        'name': np.asarray(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n, np.int64),
        'alpha': alpha,
        'bbox': bbox,
        'dimensions': cam[:, 3:6],
        'location': cam[:, 0:3],
        'rotation_y': cam[:, 6],
        'score': (np.asarray(scores) if scores is not None
                  else np.ones(n)),
        'boxes_lidar': boxes_lidar,
    }
