"""Per-layer TPU timing of the sparse 3D backbone (SECOND shapes).

Builds a realistic synthetic eval batch WITH host rulebooks (bucketed
tables, ops/sparse_plan.py), then times each rulebook conv, the window
prep, and sparse_to_dense in isolation — the complement of
tools/profile_stages.py's module-level prefixes. Used to steer kernel work
on the sparse path.

Usage: python tools/profile_sparse.py [--cfg second] [--batch_size 8]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=20, warm=2):
    _ = float(fn(*args, warm))
    t0 = time.perf_counter()
    _ = float(fn(*args, iters))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='second')
    ap.add_argument('--batch_size', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/tmp/ldtpu_bench_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from lidardetection_tpu.config import cfg_from_yaml_file
    from lidardetection_tpu.datasets import build_dataloader
    from lidardetection_tpu.ops import sparse
    from lidardetection_tpu.utils.common import set_random_seed

    set_random_seed(42)
    cfg = cfg_from_yaml_file(f'tools/cfgs/kitti_models/{args.cfg}.yaml')
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.MAX_POINTS = 32768
    if 'DATA_AUGMENTOR' in cfg.DATA_CONFIG:
        del cfg.DATA_CONFIG.DATA_AUGMENTOR
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=args.batch_size,
        training=False, num_scenes=args.batch_size, model_cfg=cfg.MODEL)
    batch = next(iter(loader))
    plan = dataset.sparse_plan
    assert plan is not None

    # channel plan of VoxelBackBone8x per op (subm1..out)
    chan = {'subm1': (4, 16), 'down2': (16, 32), 'subm2': (32, 32),
            'down3': (32, 64), 'subm3': (64, 64), 'down4': (64, 64),
            'subm4': (64, 64), 'out': (64, 128)}
    layers_per = {'subm1': 2, 'subm2': 2, 'subm3': 2, 'subm4': 2}

    def conv_chain(feats, vm, rule, w):
        @jax.jit
        def run(feats, vm, rule, w, n):
            def body(_, carry):
                f = feats.at[0, 0, 0].add(carry * 1e-12)
                out = sparse.sparse_conv_apply(f, vm, rule, w)
                return out.reshape(-1)[0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    print(f'{"op":<10}{"rows":>8}{"vin":>8}{"cin":>5}{"cout":>5}'
          f'{"ms/layer":>10}{"layers":>7}')
    total = 0.0
    rng = np.random.default_rng(0)
    # walk the plan tracking each op's input stage and stage row counts /
    # valid masks (mirrors sparse_plan.bucket_spec's table chaining)
    vm_of_stage = [batch['voxel_coords'][..., 0] >= 0]
    rows_of_stage = [batch['voxels'].shape[1]]
    op_in, op_out = [], []
    cur = 0
    for op in plan.ops:
        op_in.append(cur)
        if op.type == 'down':
            vm_of_stage.append(batch[f'rb_{op.name}_coords'][..., 0] >= 0)
            rows_of_stage.append(batch[f'rb_{op.name}_coords'].shape[1])
            cur = len(rows_of_stage) - 1
        elif op.type == 'inv':
            cur = op_in[op.match]
        elif op.type == 'rewind':
            cur = op_out[op.match]
        op_out.append(cur)

    for i, op in enumerate(plan.ops):
        if op.type == 'rewind':
            continue
        rule = jnp.asarray(batch[f'rb_{op.name}'])
        rows = rule.shape[1]
        vin = rows_of_stage[op_in[i]]
        # the rulebook's OUTPUT stage: down -> its new stage; subm -> input
        out_stage = op_out[i] if op.type == 'down' else (
            op_in[op.match] if op.type == 'inv' else op_in[i])
        vm = jnp.asarray(vm_of_stage[out_stage])
        cin, cout = chan.get(op.name, (64, 64))
        feats = jnp.asarray(rng.standard_normal(
            (args.batch_size, vin, cin), np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(
            (rule.shape[-1], cin, cout), np.float32)).astype(jnp.bfloat16)
        ms = timed(conv_chain(feats, vm, rule, w), feats, vm, rule, w)
        n_layers = layers_per.get(op.name, 1)
        total += ms * n_layers
        print(f'{op.name:<10}{rows:>8}{vin:>8}{cin:>5}{cout:>5}'
              f'{ms:>10.2f}{n_layers:>7}', flush=True)
    print(f'{"conv total":<10}{total:>46.2f} ms/batch')

    # sparse_to_dense at the encoded tensor shape
    out_rows = batch['rb_out_coords'].shape[1]
    nx, ny, nz = dataset.dataset_info['grid_size']
    d = (nz + 1)
    # chain of downsample shapes: z: d->.. mirror model; just report canvas
    f = jnp.asarray(rng.standard_normal(
        (args.batch_size, out_rows, 128), np.float32))
    st = sparse.SparseTensor(
        f, jnp.asarray(batch['rb_out_coords']),
        jnp.asarray(batch['rb_out_num']),
        (2, ny // 8, nx // 8))

    @jax.jit
    def s2d_chain(f, n):
        def body(_, carry):
            ff = f.at[0, 0, 0].add(carry * 1e-12)
            c = sparse.sparse_to_dense(st._replace(features=ff))
            return c.reshape(-1)[0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    print(f'{"s2d":<10}{timed(s2d_chain, f):>46.2f} ms/batch')


if __name__ == '__main__':
    main()
