"""Op-level TPU profile of a detector eval step via jax.profiler.

Captures a device trace of the jitted eval step (forward + post-processing)
and prints the top HLO ops by self time (tensorboard_plugin_profile parses
the xplane). Complements tools/profile_stages.py when a stage's marginal
cost needs attributing to specific ops.
"""

import argparse
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='tools/cfgs/kitti_models/pv_rcnn.yaml')
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--out', default='/tmp/ldtpu_trace')
    ap.add_argument('--train', action='store_true',
                    help='trace the TRAIN step (fwd+bwd+update) instead of '
                         'the eval step — attributes the MFU gap by op')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.models import build_network
    from lidardetection_tpu.models.detectors.post_processing import post_processing
    from lidardetection_tpu.parallel.train_step import device_batch, jit_init
    from lidardetection_tpu.utils.common import set_random_seed

    set_random_seed(42)
    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 32768
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=args.train, num_scenes=args.batch_size, model_cfg=cfg.MODEL)
    batch = next(iter(loader))
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.CLASS_NAMES,
                          dataset.dataset_info)
    db = device_batch(batch)
    variables = jit_init(model, db)
    params, stats = variables['params'], variables['batch_stats']
    db = jax.device_put(db)
    post_cfg = cfg.MODEL.POST_PROCESSING
    num_class = len(cfg.CLASS_NAMES)

    if args.train:
        from lidardetection_tpu.parallel.train_step import (
            TrainState, make_train_step,
        )
        from lidardetection_tpu.utils.optimization import build_optimizer
        tx, _sched = build_optimizer(cfg.OPTIMIZATION, 100, 2)
        state = TrainState.create(params=params, batch_stats=stats, tx=tx)
        tstep = make_train_step(model, donate=False)

        @jax.jit
        def step(db):
            st, tb = tstep(state, db)
            return jax.tree_util.tree_leaves(st.params)[0]
    else:
        @jax.jit
        def step(db):
            out = model.apply({'params': params, 'batch_stats': stats},
                              db, training=False)
            return post_processing(out, post_cfg, num_class)

    r = step(db)
    jax.block_until_ready(r)

    # op_name metadata (module path) for per-module attribution
    hlo = jax.jit(step).lower(db).compile().as_text()
    import re
    op_path = {}
    for mm in re.finditer(
            r'%(\S+?) = .*?op_name="([^"]*)"', hlo):
        op_path[mm.group(1)] = mm.group(2)

    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            r = step(db)
        jax.block_until_ready(r)

    xplanes = sorted(glob.glob(
        f'{args.out}/plugins/profile/*/*.xplane.pb'), reverse=True)
    if not xplanes:
        print('no xplane captured', file=sys.stderr)
        return
    # parse the xplane proto directly (the tensorboard_plugin_profile
    # converter is incompatible with this TF build)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplanes[0], 'rb').read())
    agg = {}
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if 'XLA Ops' not in line.name and 'Ops' not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                # async spans (copy/slice-start) measure wait, not occupancy
                if ('copy-start' in name or 'copy-done' in name
                        or 'slice-start' in name or 'slice-done' in name
                        or 'async' in name):
                    continue
                dur = ev.duration_ps / 1e9  # -> ms
                t, n = agg.get(name, (0.0, 0))
                agg[name] = (t + dur, n + 1)
    ops = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(t for t, _ in agg.values())
    print(f'total device op time: {total/args.iters:.2f} ms/iter '
          f'over {args.iters} iters')

    def path_of(name):
        short = name.split(' =')[0].lstrip('%')
        p = op_path.get(short, '')
        # compress jit(step)/Detector3D/<module>/... to 2 path segments
        parts = [s for s in p.split('/') if s and not s.startswith('jit(')]
        return '/'.join(parts[:3]) if parts else '<no-metadata>'

    by_mod = {}
    for name, (t, n) in agg.items():
        k = path_of(name)
        tt, nn = by_mod.get(k, (0.0, 0))
        by_mod[k] = (tt + t, nn + n)
    print('\n--- by module path ---')
    for k, (t, n) in sorted(by_mod.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f'{t/args.iters:>8.2f} ms  {n:>6}  {k}')

    print('\nrank  self-ms   cum%  count  op')
    cum = 0.0
    for i, (name, (t, n)) in enumerate(ops[:args.top]):
        cum += t
        print(f'{i:>4}  {t/args.iters:>7.2f}  {100*cum/total:>5.1f}'
              f'  {n:>5}  [{path_of(name)[:45]}] {name[:80]}')


if __name__ == '__main__':
    main()
