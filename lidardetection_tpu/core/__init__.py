from . import box_coders, geometry, iou3d, losses  # noqa: F401
