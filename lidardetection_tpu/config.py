"""YAML configuration system.

Mirrors the behaviour of the reference config layer (pcdet/config.py:1-85):
a global attribute-access dict built from YAML with single-level
``_BASE_CONFIG_`` inheritance and dotted-path CLI overrides with type
coercion. The reference relies on the external ``easydict`` package; here we
provide a small self-contained ``CfgNode``.
"""

from pathlib import Path

import yaml


class CfgNode(dict):
    """Attribute-access dict; nested dicts are converted recursively."""

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, CfgNode):
            return value
        if isinstance(value, dict):
            return CfgNode(value)
        if isinstance(value, (list, tuple)):
            return type(value)(CfgNode._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, CfgNode._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        del self[key]

    def get(self, key, default=None):
        return super().get(key, default)

    def copy(self):
        return CfgNode({k: (v.copy() if isinstance(v, CfgNode) else v) for k, v in self.items()})


def merge_new_config(config, new_config):
    """Recursive merge with ``_BASE_CONFIG_`` expansion (pcdet/config.py:51-68)."""
    if '_BASE_CONFIG_' in new_config:
        with open(new_config['_BASE_CONFIG_'], 'r') as f:
            base = yaml.safe_load(f)
        config.update(CfgNode(base))

    for key, val in new_config.items():
        if key == '_BASE_CONFIG_':
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config[key], dict):
                config[key] = CfgNode()
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file, config=None):
    """Load a YAML file into ``config`` (pcdet/config.py:71-80)."""
    if config is None:
        config = CfgNode()
    with open(cfg_file, 'r') as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config=config, new_config=new_config)
    config.TAG = Path(cfg_file).stem
    # e.g. cfgs/kitti_models/pointpillar.yaml -> kitti_models
    parts = Path(cfg_file).resolve().parts
    config.EXP_GROUP_PATH = parts[-2] if len(parts) >= 2 else ''
    return config


def cfg_from_list(cfg_list, config):
    """Set config keys from a ['k.x', 'v', ...] list (pcdet/config.py:16-48)."""
    assert len(cfg_list) % 2 == 0, 'override list must be key/value pairs'
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = full_key.split('.')
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, f'NotFoundKey: {subkey}'
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, f'NotFoundKey: {subkey}'
        try:
            value = literal_eval_str(v)
        except Exception:
            value = v
        if isinstance(value, dict):
            d[subkey].update(CfgNode(value))
        else:
            if type(value) != type(d[subkey]) and d[subkey] is not None:
                if isinstance(d[subkey], (list, tuple)):
                    value = type(d[subkey])(yaml.safe_load(v))
                else:
                    value = type(d[subkey])(value)
            d[subkey] = value
    return config


def literal_eval_str(s):
    import ast
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return yaml.safe_load(s)


def log_config_to_file(cfg, pre='cfg', logger=None):
    """Dump cfg to logger (pcdet/config.py:7-13)."""
    for key, val in cfg.items():
        if isinstance(val, dict):
            logger.info('----------- %s -----------', key)
            log_config_to_file(val, pre=f'{pre}.{key}', logger=logger)
            continue
        logger.info('%s.%s: %s', pre, key, val)


# global cfg used by the CLI tools, mirroring pcdet/config.py:83-85
cfg = CfgNode()
cfg.ROOT_DIR = Path(__file__).resolve().parent.parent
cfg.LOCAL_RANK = 0
