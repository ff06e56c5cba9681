"""Mixed-source dataset (fork extension).

Mirrors pcdet/datasets/mix_data/mix_dataset.py: same pointcloud/<id>.bin +
label/<id>.pkl protocol as Livox over a dataset mixed from multiple sources
(see the reference's gen_mix_dataset.py for the offline mixing script);
KITTI-protocol evaluation.
"""

from ..livox.livox_dataset import LivoxDataset


class MixDataset(LivoxDataset):
    STACK_FRAME_SIZE = 1
    BASE_FRAME_IDX = 0
