"""Dataset registry + loader construction (mirrors pcdet/datasets/__init__.py:15-79).

torch DataLoader/DistributedSampler are replaced by a plain python batcher:
samples are fixed-shape numpy, collation is a stack, and per-host sharding is
a strided slice of the index space (the multi-host analog of
DistributedSampler). A background-thread prefetcher overlaps host voxelization
with device compute.
"""

import queue
import threading

import numpy as np

from .dataset import DatasetTemplate
from .synthetic import SyntheticDataset

__all__ = {
    'DatasetTemplate': DatasetTemplate,
    'SyntheticDataset': SyntheticDataset,
}


def _register_lazy():
    from .kitti.kitti_dataset import KittiDataset
    __all__['KittiDataset'] = KittiDataset
    from .nuscenes.nuscenes_dataset import NuScenesDataset
    __all__['NuScenesDataset'] = NuScenesDataset
    from .plusai.plusai_dataset import PlusAIDataset, PlusAIMultiframeDataset
    __all__['PlusAIDataset'] = PlusAIDataset
    __all__['PlusAIMultiframeDataset'] = PlusAIMultiframeDataset
    from .livox.livox_dataset import LivoxDataset, LivoxMultiFrameDataset
    __all__['LivoxDataset'] = LivoxDataset
    __all__['LivoxMultiFrameDataset'] = LivoxMultiFrameDataset
    from .mix_data.mix_dataset import MixDataset
    __all__['MixDataset'] = MixDataset


class DataLoader:
    """Deterministic epoch-based batcher with optional shuffling/prefetch."""

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=True, num_shards=1, shard_id=0, prefetch=2,
                 bucket_voxels=False, bucket_granularity=4096):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        # occupancy bucketing: real scans occupy ~25% of the voxel capacity
        # (KITTI ~6-12k pillars of the 40k eval cap, pointpillar.yaml), and
        # VFE/scatter cost is proportional to the padded table size. The
        # voxel tables are sorted with padding at the tail, so truncating to
        # the batch max (rounded up to `bucket_granularity` to bound the
        # number of jit specializations) is lossless — the TPU analog of
        # the reference's dynamically-sized CUDA voxel lists.
        self.bucket_voxels = bucket_voxels
        self.bucket_granularity = bucket_granularity
        self.epoch = 0

    def _bucket(self, batch):
        if not self.bucket_voxels or 'voxels' not in batch:
            return batch
        cap = batch['voxels'].shape[1]
        g = self.bucket_granularity
        m = min(-(-max(1, int(batch['num_voxels'].max())) // g) * g, cap)
        if m < cap:
            for k in ('voxels', 'voxel_coords', 'voxel_num_points'):
                batch[k] = np.ascontiguousarray(batch[k][:, :m])
        return batch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad so every shard sees the same number of samples (the reference's
        # padded eval sampler, pcdet/datasets/__init__.py:26-46)
        per_shard = -(-n // self.num_shards)
        total = per_shard * self.num_shards
        idx = np.concatenate([idx, idx[:total - n]])
        return idx[self.shard_id::self.num_shards]

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        batches = []
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    break
                chunk = np.concatenate([chunk, idx[:self.batch_size - len(chunk)]])
            batches.append(chunk)

        if self.prefetch <= 0:
            for chunk in batches:
                yield self._bucket(
                    self.dataset.collate_batch([self.dataset[j] for j in chunk]))
            return

        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for chunk in batches:
                    q.put(self._bucket(self.dataset.collate_batch(
                        [self.dataset[j] for j in chunk])))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, logger=None, training=True,
                     merge_all_iters_to_one_epoch=False, total_epochs=0,
                     num_shards=1, shard_id=0, **dataset_kwargs):
    name = dataset_cfg['DATASET']
    if name not in __all__:
        _register_lazy()
    dataset_cls = __all__[name]
    dataset = dataset_cls(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger, **dataset_kwargs)
    if merge_all_iters_to_one_epoch:
        dataset.merge_all_iters_to_one_epoch(merge=True, epochs=total_epochs)
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=training,
        drop_last=training, num_shards=num_shards, shard_id=shard_id,
        # eval only: the train step runs cross-replica collectives (BN
        # psums) whose programs must agree across hosts, so train keeps the
        # static capacity; eval is per-process independent
        bucket_voxels=not training and bool(
            dataset_cfg.get('VOXEL_BUCKETING', True)))
    return dataset, loader
