"""Network construction (mirrors pcdet/models/__init__.py:9-41).

`build_network(model_cfg, num_class, class_names, dataset_info)` returns a
flax `Detector3D`; the reference's `model_fn_decorator` train-step closure
becomes `make_train_step` / `make_eval_step` factories in
lidardetection_tpu.parallel.train_step.
"""

from .detectors.detector3d import Detector3D

__all__ = ['Detector3D', 'build_network']


def build_network(model_cfg, num_class, class_names, dataset_info, axis_name=None):
    name = model_cfg['NAME']
    # every detector family shares the slot-assembly module; the family name
    # determines which slots the cfg populates (PointPillar, SECONDNet,
    # PointRCNN, PartA2Net, PVRCNN — pcdet/models/detectors/__init__.py:19)
    known = {'PointPillar', 'SECONDNet', 'PointRCNN', 'PartA2Net', 'PVRCNN'}
    if name not in known:
        raise KeyError(f'unknown detector {name}')
    if 'BALL_QUERY_APPROX_RECALL' in model_cfg:
        from ..ops.pointnet2 import set_ball_query_recall
        set_ball_query_recall(model_cfg['BALL_QUERY_APPROX_RECALL'])
    if 'FPS_SECTORS' in model_cfg:
        from ..ops.pointnet2 import set_fps_sectors
        set_fps_sectors(model_cfg['FPS_SECTORS'])
    if 'BALL_QUERY_GRID_CELL_CAP' in model_cfg:
        from ..ops.pointnet2 import set_ball_query_grid
        cap = model_cfg['BALL_QUERY_GRID_CELL_CAP']
        set_ball_query_grid(
            None if not cap else dataset_info['point_cloud_range'], cap or 64)
    return Detector3D(
        model_cfg=model_cfg, num_class=num_class, class_names=tuple(class_names),
        dataset_info=dataset_info, axis_name=axis_name)
