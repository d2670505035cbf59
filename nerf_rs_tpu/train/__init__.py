from . import step  # noqa: F401
from .step import Batch, TrainState, eval_step, init_state, train_step  # noqa: F401
