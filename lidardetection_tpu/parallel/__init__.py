from .mesh import make_mesh, shard_batch  # noqa: F401
from .train_step import TrainState, make_eval_step, make_train_step  # noqa: F401
