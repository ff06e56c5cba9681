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


def make_scene(rng, point_cloud_range, num_objects=8, points_per_obj=120,
               num_ground=8000, class_names=('Car', 'Pedestrian', 'Cyclist')):
    """One scene: ground-plane clutter + points on object box surfaces."""
    x1, y1, z1, x2, y2, z2 = point_cloud_range
    gt_boxes, gt_names, obj_points = [], [], []
    for _ in range(num_objects):
        name = class_names[rng.randint(len(class_names))]
        dx, dy, dz = CLASS_SIZE.get(name, _DEFAULT_SIZE)
        cx = rng.uniform(x1 + 5, x2 - 5)
        cy = rng.uniform(y1 + 5, y2 - 5)
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

    gx = rng.uniform(x1, x2, num_ground)
    gy = rng.uniform(y1, y2, num_ground)
    gz = rng.normal(-1.8, 0.05, num_ground)
    gi = rng.rand(num_ground)
    ground = np.stack([gx, gy, gz, gi], axis=1)
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
            annos.append({
                'name': np.array([class_names[l - 1] for l in labels]),
                'score': np.asarray(pred_dicts['pred_scores'][i][:n]),
                'boxes_lidar': boxes,
                'frame_id': batch_dict['frame_id'][i],
            })
        return annos
