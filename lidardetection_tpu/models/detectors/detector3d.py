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
from ..backbones_3d.pfe import VoxelSetAbstraction
from ..backbones_3d.pointnet2_backbone import PointNet2MSG
from ..backbones_3d.spconv_backbone import VoxelBackBone8x
from ..backbones_3d.spconv_unet import UNetV2
from ..backbones_3d.vfe import MeanVFE, PillarVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..dense_heads.anchor_head_multi import AnchorHeadMulti
from ..dense_heads.point_head import (
    PointHeadBox, PointHeadSimple, PointHeadSimpleMultiFrame,
    PointIntraPartOffsetHead,
)
from ..roi_heads.pointrcnn_head import PointRCNNHead
from ..roi_heads.parta2_head import PartA2FCHead
from ..roi_heads.pvrcnn_head import PVRCNNHead


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
    # TPU approximation knobs for the point ops (PointOpKnobs; None = exact)
    op_knobs: object = None

    def setup(self):
        cfg = self.model_cfg
        import jax.numpy as jnp
        dtype_name = cfg.get('COMPUTE_DTYPE', 'float32')
        self.compute_dtype = None if dtype_name in (None, 'float32') \
            else jnp.dtype(dtype_name)
        info = self.dataset_info
        # point-based pipelines (PointRCNN) carry no voxel grid
        grid_size = tuple(info['grid_size']) if info.get('grid_size') else None
        pc_range = tuple(info['point_cloud_range'])
        voxel_size = tuple(info['voxel_size']) if info.get('voxel_size') else None

        modules = []
        num_point_features = info['num_point_features']
        bev_channels = None
        point_channels = None
        vfe_out = num_point_features

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
            elif name == 'UNetV2':
                self.backbone_3d = UNetV2(
                    model_cfg=cfg['BACKBONE_3D'], input_channels=vfe_out,
                    grid_size=grid_size, voxel_size=voxel_size,
                    point_cloud_range=pc_range, axis_name=self.axis_name,
                    dtype=self.compute_dtype)
                point_channels = self.backbone_3d.num_point_features
            elif name == 'PointNet2MSG':
                self.backbone_3d = PointNet2MSG(
                    model_cfg=cfg['BACKBONE_3D'],
                    input_channels=num_point_features,
                    axis_name=self.axis_name, dtype=self.compute_dtype,
                    knobs=self.op_knobs)
                point_channels = self.backbone_3d.num_point_features
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

        if cfg.get('PFE'):
            name = cfg['PFE']['NAME']
            if name == 'VoxelSetAbstraction':
                # runs AFTER backbone_2d (needs spatial_features); insertion
                # order below mirrors detector3d_template module order with
                # pfe consuming multi-scale + BEV outputs
                self.pfe = VoxelSetAbstraction(
                    model_cfg=cfg['PFE'], voxel_size=voxel_size,
                    point_cloud_range=pc_range,
                    num_bev_features=cfg['MAP_TO_BEV']['NUM_BEV_FEATURES'],
                    num_rawpoint_features=num_point_features,
                    dtype=self.compute_dtype, axis_name=self.axis_name,
                    knobs=self.op_knobs)
                point_channels = self.pfe.num_point_features
            else:
                raise NotImplementedError(name)

        if cfg.get('BACKBONE_2D'):
            self.backbone_2d = BaseBEVBackbone(
                model_cfg=cfg['BACKBONE_2D'], input_channels=bev_channels,
                axis_name=self.axis_name, dtype=self.compute_dtype)
            bev_channels = self.backbone_2d.num_bev_features
            modules.append('backbone_2d')

        if cfg.get('DENSE_HEAD'):
            name = cfg['DENSE_HEAD']['NAME']
            head_cls = {'AnchorHeadSingle': AnchorHeadSingle,
                        'AnchorHeadMulti': AnchorHeadMulti}.get(name)
            if head_cls is None:
                raise NotImplementedError(name)
            self.dense_head = head_cls(
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
            modules.append('dense_head')

        if cfg.get('PFE'):
            # reference order runs pfe before backbone_2d but VSA's 'bev'
            # source reads spatial_features produced by map_to_bev, which is
            # already available; placing it after dense_head matches data
            # dependencies identically
            modules.append('pfe')

        if cfg.get('POINT_HEAD'):
            name = cfg['POINT_HEAD']['NAME']
            nc = self.num_class if not cfg['POINT_HEAD'].get(
                'CLASS_AGNOSTIC', False) else 1
            if name == 'PointHeadBox':
                self.point_head = PointHeadBox(
                    model_cfg=cfg['POINT_HEAD'], num_class=nc,
                    input_channels=point_channels,
                    predict_boxes_when_training=bool(cfg.get('ROI_HEAD')),
                    dtype=self.compute_dtype, axis_name=self.axis_name)
            elif name == 'PointIntraPartOffsetHead':
                self.point_head = PointIntraPartOffsetHead(
                    model_cfg=cfg['POINT_HEAD'], num_class=nc,
                    input_channels=point_channels,
                    predict_boxes_when_training=bool(cfg.get('ROI_HEAD')),
                    dtype=self.compute_dtype, axis_name=self.axis_name)
            elif name == 'PointHeadSimple':
                self.point_head = PointHeadSimple(
                    model_cfg=cfg['POINT_HEAD'], num_class=nc,
                    input_channels=point_channels,
                    dtype=self.compute_dtype, axis_name=self.axis_name)
            elif name == 'PointHeadSimpleMultiFrame':
                self.point_head = PointHeadSimpleMultiFrame(
                    model_cfg=cfg['POINT_HEAD'], num_class=nc,
                    input_channels=point_channels,
                    stack_frame_size=int(cfg['STACK_FRAME_SIZE']),
                    dtype=self.compute_dtype, axis_name=self.axis_name)
            else:
                raise NotImplementedError(name)
            modules.append('point_head')

        if cfg.get('ROI_HEAD'):
            name = cfg['ROI_HEAD']['NAME']
            nc = self.num_class if not cfg['ROI_HEAD'].get(
                'CLASS_AGNOSTIC', True) else 1
            if name == 'PointRCNNHead':
                self.roi_head = PointRCNNHead(
                    model_cfg=cfg['ROI_HEAD'], input_channels=point_channels,
                    num_class=nc, dtype=self.compute_dtype,
                    axis_name=self.axis_name, knobs=self.op_knobs)
            elif name == 'PartA2FCHead':
                self.roi_head = PartA2FCHead(
                    model_cfg=cfg['ROI_HEAD'], input_channels=point_channels,
                    num_class=nc, dtype=self.compute_dtype,
                    axis_name=self.axis_name)
            elif name == 'PVRCNNHead':
                self.roi_head = PVRCNNHead(
                    model_cfg=cfg['ROI_HEAD'], input_channels=point_channels,
                    num_class=nc, dtype=self.compute_dtype,
                    axis_name=self.axis_name)
            else:
                raise NotImplementedError(name)
            modules.append('roi_head')

        self.module_order = tuple(modules)

    def _head_grid_size(self, grid_size):
        # dense heads see the full voxel grid; feature_map_stride in the
        # anchor config brings it to the BEV map resolution
        return grid_size

    def __call__(self, batch, training=False):
        import jax.numpy as jnp

        if 'points' in batch and 'point_valid' not in batch:
            n = batch['points'].shape[1]
            batch = {**batch, 'point_valid':
                     jnp.arange(n)[None, :] < batch['num_points'][:, None]}
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
            rpn_loss, tb_rpn = self.dense_head.loss(batch_out['anchor_head_fwd'])
            total = total + rpn_loss
            tb.update(tb_rpn)
        if 'point_head_fwd' in batch_out and (
                'point_cls_labels' in batch_out['point_head_fwd']
                or 'point_cls_labels_list' in batch_out['point_head_fwd']):
            p_loss, tb_p = self.point_head.loss(batch_out['point_head_fwd'])
            total = total + p_loss
            tb.update(tb_p)
        if 'roi_head_fwd' in batch_out and 'rcnn_cls' in batch_out['roi_head_fwd']:
            r_loss, tb_r = self.roi_head.loss(batch_out['roi_head_fwd'])
            total = total + r_loss
            tb.update(tb_r)
        tb['loss'] = total
        return total, tb
