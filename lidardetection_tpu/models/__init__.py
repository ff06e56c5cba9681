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
    # TPU approximation knobs ride the module tree (never module globals,
    # so two models with different settings coexist in one process)
    from ..ops.pointnet2 import PointOpKnobs
    knobs = PointOpKnobs.from_config(
        model_cfg, dataset_info.get('point_cloud_range'))
    return Detector3D(
        model_cfg=model_cfg, num_class=num_class, class_names=tuple(class_names),
        dataset_info=dataset_info, axis_name=axis_name, op_knobs=knobs)
