"""Detector topology assembly.

The reference builds detectors from an 8-slot module topology
(detector3d_template.py:22-34: vfe -> backbone_3d -> map_to_bev -> pfe ->
backbone_2d -> dense_head -> point_head -> roi_head). Here the same
registry-driven assembly produces one flax module whose __call__ threads an
immutable batch pytree through the slots, and whose `loss` computes the
summed training loss — both designed to live inside a single jitted step.
"""

import flax.linen as nn

from ..backbones_2d.bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev import HeightCompression, PointPillarScatter
from ..backbones_3d.spconv_backbone import VoxelBackBone8x
from ..backbones_3d.vfe import MeanVFE, PillarVFE
from ..dense_heads.anchor_head import AnchorHeadSingle, anchor_head_loss


class Detector3D(nn.Module):
    """Generic single/two-stage detector assembled from model_cfg.

    Attributes:
        model_cfg: MODEL section of the yaml config.
        num_class: number of foreground classes.
        class_names: tuple of class names.
        dataset_info: static dict with grid_size (nx, ny, nz), voxel_size,
            point_cloud_range, num_point_features.
        axis_name: mesh axis for cross-replica BN sync (None = off).
    """

    model_cfg: dict
    num_class: int
    class_names: tuple
    dataset_info: dict
    axis_name: str | None = None

    def setup(self):
        cfg = self.model_cfg
        import jax.numpy as jnp
        dtype_name = cfg.get('COMPUTE_DTYPE', 'float32')
        self.compute_dtype = None if dtype_name in (None, 'float32') \
            else jnp.dtype(dtype_name)
        info = self.dataset_info
        grid_size = tuple(info['grid_size'])
        pc_range = tuple(info['point_cloud_range'])
        voxel_size = tuple(info['voxel_size'])

        modules = []
        num_point_features = info['num_point_features']
        bev_channels = None

        if cfg.get('VFE'):
            name = cfg['VFE']['NAME']
            if name == 'MeanVFE':
                self.vfe = MeanVFE()
                vfe_out = num_point_features
            elif name == 'PillarVFE':
                self.vfe = PillarVFE(
                    model_cfg=cfg['VFE'], num_point_features=num_point_features,
                    voxel_size=voxel_size, point_cloud_range=pc_range,
                    axis_name=self.axis_name, dtype=self.compute_dtype)
                vfe_out = cfg['VFE']['NUM_FILTERS'][-1]
            else:
                raise NotImplementedError(name)
            modules.append('vfe')

        if cfg.get('BACKBONE_3D'):
            name = cfg['BACKBONE_3D']['NAME']
            if name in ('VoxelBackBone8x', 'VoxelResBackBone8x'):
                self.backbone_3d = VoxelBackBone8x(
                    model_cfg=cfg['BACKBONE_3D'], input_channels=vfe_out,
                    grid_size=grid_size, axis_name=self.axis_name,
                    dtype=self.compute_dtype,
                    residual=(name == 'VoxelResBackBone8x'))
            else:
                raise NotImplementedError(name)
            modules.append('backbone_3d')

        if cfg.get('MAP_TO_BEV'):
            name = cfg['MAP_TO_BEV']['NAME']
            if name == 'PointPillarScatter':
                self.map_to_bev = PointPillarScatter(
                    grid_size=grid_size,
                    num_bev_features=cfg['MAP_TO_BEV']['NUM_BEV_FEATURES'])
            elif name == 'HeightCompression':
                self.map_to_bev = HeightCompression(
                    num_bev_features=cfg['MAP_TO_BEV']['NUM_BEV_FEATURES'])
            else:
                raise NotImplementedError(name)
            bev_channels = cfg['MAP_TO_BEV']['NUM_BEV_FEATURES']
            modules.append('map_to_bev')

        if cfg.get('BACKBONE_2D'):
            self.backbone_2d = BaseBEVBackbone(
                model_cfg=cfg['BACKBONE_2D'], input_channels=bev_channels,
                axis_name=self.axis_name, dtype=self.compute_dtype)
            bev_channels = self.backbone_2d.num_bev_features
            modules.append('backbone_2d')

        if cfg.get('DENSE_HEAD'):
            name = cfg['DENSE_HEAD']['NAME']
            if name == 'AnchorHeadSingle':
                self.dense_head = AnchorHeadSingle(
                    model_cfg=cfg['DENSE_HEAD'],
                    input_channels=bev_channels,
                    num_class=self.num_class if not cfg['DENSE_HEAD'].get(
                        'CLASS_AGNOSTIC', False) else 1,
                    class_names=tuple(self.class_names),
                    grid_size=self._head_grid_size(grid_size),
                    point_cloud_range=pc_range,
                    predict_boxes_when_training=bool(cfg.get('ROI_HEAD')),
                    dtype=self.compute_dtype,
                )
            else:
                raise NotImplementedError(name)
            modules.append('dense_head')

        self.module_order = tuple(modules)

    def _head_grid_size(self, grid_size):
        # dense heads see the full voxel grid; feature_map_stride in the
        # anchor config brings it to the BEV map resolution
        return grid_size

    def __call__(self, batch, training=False):
        for name in self.module_order:
            module = getattr(self, name)
            batch = module(batch, training=training)
        return batch

    def loss(self, batch_out):
        """Total training loss + tb scalars from a forward output."""
        import jax.numpy as jnp

        tb = {}
        total = jnp.float32(0.0)
        if 'anchor_head_fwd' in batch_out:
            info = self.dense_head.get_anchor_constants()
            rpn_loss, tb_rpn = anchor_head_loss(
                batch_out['anchor_head_fwd'],
                jnp.asarray(info['flat_anchors']),
                self.dense_head.num_class,
                self.model_cfg['DENSE_HEAD'])
            total = total + rpn_loss
            tb.update(tb_rpn)
        tb['loss'] = total
        return total, tb
