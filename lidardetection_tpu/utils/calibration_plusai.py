"""PlusAI lidar calibration loading (mirrors pcdet/utils/calibration_plusai.py).

The reference parses OpenCV FileStorage YAMLs (cv2.FileStorage); cv2 is an
optional dependency here, so a pure-YAML fallback parses the same
``Tr_lidar_to_imu`` opencv-matrix node directly.
"""

import os

import numpy as np


def load_lidar_calib(car, calib_name, calib_date, calib_db_path):
    calib_file_name = os.path.join(
        calib_db_path, f'{car}_{calib_date}_{calib_name}.yml')
    if not os.path.isfile(calib_file_name):
        raise FileNotFoundError(calib_file_name)
    try:
        import cv2
        calib = cv2.FileStorage(calib_file_name, cv2.FILE_STORAGE_READ)
        return calib.getNode('Tr_lidar_to_imu').mat().astype(np.float32)
    except ImportError:
        return _parse_opencv_matrix_yaml(calib_file_name, 'Tr_lidar_to_imu')


def _parse_opencv_matrix_yaml(path, node):
    """Minimal parser for opencv-matrix YAML nodes (rows/cols/data)."""
    import re

    import yaml
    with open(path) as f:
        text = f.read()
    # strip the %YAML directive and opencv type tags
    text = re.sub(r'^%YAML.*\n', '', text)
    text = text.replace('!!opencv-matrix', '')
    data = yaml.safe_load(text)
    mat = data[node]
    return np.array(mat['data'], np.float32).reshape(mat['rows'], mat['cols'])
