"""Evaluation loop (re-expresses tools/eval_utils/eval_utils.py:22-121).

Batches run through the jitted eval step; per-sample prediction dicts are
gathered on host and handed to dataset.evaluation (the dataset-specific
official metric). Eval needs no cross-sample collectives, so under a
multi-process run each process evaluates its loader shard on its LOCAL
devices and results merge through the filesystem all-gather
(parallel.dist.merge_results_dist, mirroring common_utils.py:206-227).
"""

import pickle
import time
from pathlib import Path

import jax
import numpy as np

from ..parallel.dist import is_main_process, merge_results_dist
from ..parallel.mesh import make_mesh, shard_batch
from ..parallel.train_step import device_batch, make_eval_step


def eval_one_epoch(model, variables, loader, post_cfg, class_names, logger,
                   mesh=None, result_dir=None, save_to_file=False):
    dataset = loader.dataset
    num_class = len(class_names)
    world = jax.process_count()
    if world > 1 and mesh is not None:
        # per-process local mesh: eval is embarrassingly parallel and the
        # batch's host-side metadata (frame ids, calib) is process-local
        local = jax.local_devices()
        mesh = make_mesh(local) if len(local) > 1 else None
    step_fn = make_eval_step(model, post_cfg, num_class, mesh=mesh)

    det_annos = []
    recall_totals = {}
    n_samples = 0
    t0 = time.time()
    for batch in loader:
        db = device_batch(batch)
        if mesh is not None:
            db = shard_batch(db, mesh)
        preds = step_fn(variables['params'], variables['batch_stats'], db)
        preds = jax.device_get(preds)
        if 'recall' in preds:
            for k, v in preds['recall'].items():
                recall_totals[k] = recall_totals.get(k, 0) + int(v)
        annos = dataset.generate_prediction_dicts(
            batch, preds, class_names,
            output_path=result_dir if save_to_file else None)
        det_annos += annos
        n_samples += batch['batch_size']

    sec_per_example = (time.time() - t0) / max(n_samples, 1)
    logger.info('eval: %d samples, %.4f sec/example', n_samples, sec_per_example)

    if world > 1:
        tmpdir = Path(result_dir or '/tmp/lidardetection_eval') / 'tmpdir'
        det_annos = merge_results_dist(det_annos, len(dataset), str(tmpdir))
        recall_items = sorted(recall_totals.items())
        merged = merge_results_dist([recall_items], world, str(tmpdir / 'recall'))
        if not is_main_process():
            return {}, []
        recall_totals = {}
        for items in merged:
            for k, v in items:
                recall_totals[k] = recall_totals.get(k, 0) + v

    ret_dict = {}
    gt = max(recall_totals.get('gt', 0), 1)
    for k, v in recall_totals.items():
        if k == 'gt':
            continue
        logger.info('recall_%s: %.4f', k, v / gt)
        ret_dict[f'recall/{k}'] = v / gt

    if result_dir is not None:
        Path(result_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(result_dir) / 'result.pkl', 'wb') as f:
            pickle.dump(det_annos, f)

    if hasattr(dataset, 'evaluation'):
        result_str, result_dict = dataset.evaluation(
            det_annos, class_names,
            eval_metric=post_cfg.get('EVAL_METRIC', 'kitti'))
        logger.info(result_str)
        ret_dict.update(result_dict)
    ret_dict['sec_per_example'] = sec_per_example
    return ret_dict, det_annos
