"""Dataset registry + loader construction (mirrors pcdet/datasets/__init__.py:15-79).

torch DataLoader/DistributedSampler are replaced by a plain python batcher:
samples are fixed-shape numpy, collation is a stack, and per-host sharding is
a strided slice of the index space (the multi-host analog of
DistributedSampler). Prefetch overlaps host work (augment + voxelize) with
device compute: `num_workers=0` uses one background thread; `num_workers>0`
forks that many worker processes, each building whole collated batches, with
an ordered reorder buffer — the TPU-host analog of the reference's
DataLoader(num_workers) (pcdet/datasets/__init__.py:60-70).
"""

import multiprocessing as mp
import os
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
                 num_workers=0, bucket_voxels=False, bucket_granularity=4096):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.num_workers = num_workers
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
        plan = getattr(self.dataset, 'sparse_plan', None)
        if plan is not None and f'rb_{plan.ops[0].name}' in batch:
            # bucket every downstream voxel table the same way: slice
            # row-axes, clamp rulebook values so miss == new capacity
            stages, rows, values = plan.bucket_spec()
            mstage = [m]
            for num_key, scap in stages[1:]:
                mstage.append(min(
                    -(-max(1, int(batch[num_key].max())) // g) * g, scap))
            for key, s in rows:
                if mstage[s] < batch[key].shape[1]:
                    batch[key] = np.ascontiguousarray(batch[key][:, :mstage[s]])
            for key, s in values:
                np.minimum(batch[key], np.int32(mstage[s]), out=batch[key])
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

        if self.num_workers > 0:
            yield from self._iter_procs(batches)
            return

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

    def _iter_procs(self, batches):
        """Process-pool prefetch: each worker builds whole collated batches.

        fork-based so the dataset needs no pickling; workers touch only
        numpy (never jax — forking a live TPU client into a child that then
        uses it deadlocks). Batches are re-emitted in submission order via a
        reorder buffer, so the SAMPLE composition of each batch matches the
        serial path exactly; augmentation randomness differs per worker
        (each worker reseeds the global np.random from seed/epoch/worker_id,
        the analog of torch DataLoader's per-worker base_seed + worker_id).
        """
        ctx = mp.get_context('fork')
        task_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=max(2, self.prefetch) * self.num_workers)

        def worker_loop(tq, rq, wid):
            # forked children inherit one global np.random state; without
            # reseeding every worker would replay the SAME augmentation
            # stream (correlated crops/flips across batches)
            np.random.seed((self.seed + 1) * 1000003
                           + self.epoch * 97 + wid)
            while True:
                item = tq.get()
                if item is None:
                    return
                bi, chunk = item
                batch = self._bucket(self.dataset.collate_batch(
                    [self.dataset[j] for j in chunk]))
                rq.put((bi, batch))

        procs = [ctx.Process(target=worker_loop, args=(task_q, result_q, w),
                             daemon=True) for w in range(self.num_workers)]
        for p in procs:
            p.start()
        try:
            for bi, chunk in enumerate(batches):
                task_q.put((bi, chunk))
            for _ in range(self.num_workers):
                task_q.put(None)
            buffered, want = {}, 0
            for _ in range(len(batches)):
                while want not in buffered:
                    try:
                        bi, batch = result_q.get(timeout=60)
                    except queue.Empty:
                        # a worker died mid-batch (OOM-kill etc.) would
                        # otherwise block forever; fail loudly instead
                        if not any(p.is_alive() for p in procs):
                            raise RuntimeError(
                                'all dataloader workers exited with '
                                f'{len(batches) - want} batches pending')
                        continue
                    buffered[bi] = batch
                yield buffered.pop(want)
                want += 1
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, logger=None, training=True,
                     merge_all_iters_to_one_epoch=False, total_epochs=0,
                     num_shards=1, shard_id=0, model_cfg=None,
                     **dataset_kwargs):
    name = dataset_cfg['DATASET']
    if name not in __all__:
        _register_lazy()
    dataset_cls = __all__[name]
    dataset = dataset_cls(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger, **dataset_kwargs)
    if model_cfg is not None:
        # sparse 3D backbones: precompute rulebooks on the data workers
        # (ops/sparse_plan.py) so the device path is pure gather-GEMM
        dataset.set_sparse_plan(model_cfg)
    if merge_all_iters_to_one_epoch:
        dataset.merge_all_iters_to_one_epoch(merge=True, epochs=total_epochs)
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=training,
        drop_last=training, num_shards=num_shards, shard_id=shard_id,
        # workers=0/1 keeps the thread prefetcher (a fork pool with one
        # worker only adds IPC); >1 forks a process pool, clamped to the
        # host's core count (a pool wider than the cores just thrashes)
        num_workers=min(workers, os.cpu_count() or 1)
        if workers > 1 and training and (os.cpu_count() or 1) > 1 else 0,
        # eval only: the train step runs cross-replica collectives (BN
        # psums) whose programs must agree across hosts, so train keeps the
        # static capacity; eval is per-process independent
        bucket_voxels=not training and bool(
            dataset_cfg.get('VOXEL_BUCKETING', True)))
    return dataset, loader
